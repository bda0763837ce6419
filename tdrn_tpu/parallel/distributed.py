"""Multi-host (multi-process) bootstrap.

The reference is single-node (SURVEY.md §2 parallelism table: DataParallel
only, no launcher). Here multi-host scaling needs no new training code —
the same jitted step spans hosts once ``jax.distributed`` is initialized and
the global mesh covers all devices (XLA routes the gradient psum over ICI
within a slice and DCN across slices). This module is the thin launcher glue:

    # on every host (e.g. via GCE metadata / SLURM / manual):
    python train.py ... --multihost [--coordinator host0:1234]

Datasets shard per process via grain's ShardByJaxProcess
(data/grain_pipeline.py); with the thread loader, shard by seeding each
process differently (train.py uses seed + process_index).
"""

from __future__ import annotations

from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed (no-op if single-process env detected).

    With no arguments, relies on TPU pod auto-detection (GCE metadata).
    Returns this host's process index.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # single-process / already-initialized environments
        if num_processes not in (None, 1):
            raise
        print(f"distributed init skipped ({e})")
    return jax.process_index()


def global_batch_to_local(global_batch: int) -> int:
    """Per-host batch share for a host-sharded input pipeline."""
    import jax

    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
