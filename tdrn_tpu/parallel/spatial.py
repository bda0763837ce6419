"""Spatial partitioning: shard ONE image's height axis across the mesh.

Data parallelism (parallel/mesh.py) scales throughput; it cannot cut the
latency of a single frame. This module adds the TPU-native latency scale-out:
the frame's H axis is sharded over a 1-D ``spatial`` mesh and the SAME jitted
forward runs GSPMD-partitioned — XLA inserts the halo exchanges every spatial
conv needs (a 3x3 conv reads one row from each neighbor shard) as ``ppermute``
collectives over ICI, and re-gathers where a stage is too small to split.
Nothing in the model changes: this is pure sharding annotation, the core
recipe of the scaling playbook (mesh -> annotate -> let XLA insert
collectives).

The reference has no equivalent (its parallelism is ``nn.DataParallel``
batch scatter only — SURVEY.md §2 parallelism table); this is capability the
TPU rebuild adds. Scope note: at 320 px the per-frame work is small enough
that halo latency eats most of the gain on real hardware — the profitable
regimes are 512+ inputs and multi-frame chunks (chunked streaming composes:
the chunk*B batch stays unsharded while H splits). Exactness is asserted on
the CPU mesh (tests/test_spatial.py): sharded == single-device output.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXIS = "spatial"


def make_spatial_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (SPATIAL_AXIS,))


def spatial_forward(model, mesh: Mesh, detect_fn=None):
    """Jit the (preprocessed-frame) forward with H sharded over ``mesh``.

    Returns ``fn(params, frames, state) -> (preds_or_dets, new_state)`` where
    ``frames`` is (B, H, W, 3); H is split across the mesh's ``spatial`` axis,
    params are replicated, and the prediction tensors (prior-major, no
    spatial axis) come back replicated — ``detect_fn`` (e.g. a configured
    ``ops.detection.detect``) composes inside the same program so decode/NMS
    run once, after the re-gather.
    """
    frame_sh = NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None))
    rep = NamedSharding(mesh, P())

    def fwd(params, frames, state):
        preds, new_state = model.apply(params, frames, state)
        if detect_fn is not None:
            return detect_fn(preds), new_state
        return preds, new_state

    return jax.jit(
        fwd,
        in_shardings=(rep, frame_sh, rep),
        out_shardings=(rep, rep),
    )
