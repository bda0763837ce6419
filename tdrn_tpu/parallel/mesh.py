"""Device mesh + sharding helpers.

TPU-native replacement for the reference's ``nn.DataParallel`` (SURVEY.md §2
parallelism table, §5.8): instead of a single-process scatter/gather over GPUs,
we declare a 1-D ``jax.sharding.Mesh`` over the ``data`` axis, shard the batch
(and clip) axes with ``NamedSharding``, replicate parameters, and let XLA insert
the gradient ``psum`` over ICI (DCN automatically when the mesh spans slices).
The same jitted program runs single-host or multi-host with no user-visible
change — this is the whole "communication backend" of the framework.

The model is ~35M params, so tensor/pipeline parallelism is intentionally
absent (matching the reference's scope); the data axis is the only mesh axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))

def clip_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(T, B, ...) clip tensors: shard the per-frame batch axis, not time."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(tree, mesh: Mesh, leading_time_axis: bool = False):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process: ``x`` is the global batch. Multi-process (the mesh spans
    hosts): ``x`` is this host's LOCAL batch shard — each host's loader
    produces its own rows (grain ShardByJaxProcess / per-host seeds), and the
    global array is assembled by concatenation along the sharded axis.
    """
    sh = clip_batch_sharding(mesh) if leading_time_axis else batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree over the mesh (multi-process: every host must pass
    identical values — e.g. params from the same PRNG seed or checkpoint)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
