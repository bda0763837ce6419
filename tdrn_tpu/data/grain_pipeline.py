"""grain-based input pipeline (production loader).

Deterministic, checkpointable, multi-worker alternative to the thread-pool
``loader.py`` (the reference's DataLoader role, SURVEY.md §3.1): grain gives
per-record determinism from a seed, worker *processes* (real parallel JPEG
decode on multi-core hosts), sharding by JAX process for multi-host training,
and an iterator whose position can be checkpointed alongside the train state.

Our datasets (VOCDetection / VIDDetection) already return fixed-shape padded
samples from ``__getitem__``, so they plug in directly as random-access
sources.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


class _IndexSource:
    """Record i IS the index i; fetching/augmenting happens in the transform
    below so grain can hand it a per-record random generator."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, index: int) -> int:
        return index


def make_grain_loader(
    dataset,
    batch_size: int,
    num_workers: int = 8,
    clip_mode: bool = False,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    shard_by_process: bool = True,
):
    """Return a grain DataLoader iterating collated batches.

    Infinite by default (num_epochs=None); shards records across JAX processes
    for multi-host training.
    """
    import grain.python as gp

    sharding = gp.ShardByJaxProcess() if shard_by_process else gp.NoSharding()
    sampler = gp.IndexSampler(
        num_records=len(dataset),
        shuffle=True,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=sharding,
    )

    class _FetchSample(gp.RandomMapTransform):
        """Fetch + augment one record. grain seeds ``rng`` deterministically
        from (loader seed, epoch, record), so augmentation is reproducible,
        varies across epochs, and is safe under worker parallelism."""

        def random_map(self, index, rng: np.random.Generator):
            if hasattr(dataset, "sample_with_rng"):
                return dataset.sample_with_rng(index, rng)
            return dataset[index]

    loader = gp.DataLoader(
        data_source=_IndexSource(len(dataset)),
        sampler=sampler,
        operations=[
            _FetchSample(),
            gp.Batch(batch_size=batch_size, drop_remainder=True),
        ],
        worker_count=num_workers,
        read_options=gp.ReadOptions(num_threads=2, prefetch_buffer_size=64),
    )

    def batches():
        for batch in loader:
            # grain's Batch stacks leaves along axis 0; our collate contract
            # wants (T, B, ...) for clips — transpose when needed.
            imgs, boxes, labels, valid = batch
            if clip_mode:
                yield (
                    np.asarray(imgs).swapaxes(0, 1).astype(np.float32),
                    np.asarray(boxes).swapaxes(0, 1),
                    np.asarray(labels).swapaxes(0, 1),
                    np.asarray(valid).swapaxes(0, 1),
                )
            else:
                yield (
                    np.asarray(imgs, np.float32),
                    np.asarray(boxes),
                    np.asarray(labels),
                    np.asarray(valid),
                )

    return batches()
