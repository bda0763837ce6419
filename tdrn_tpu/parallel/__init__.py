"""Data-parallel mesh + sharding (SURVEY.md §5.8)."""

from tdrn_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    clip_batch_sharding,
    replicated,
    shard_batch_tree,
    replicate_tree,
)
from tdrn_tpu.parallel.distributed import (  # noqa: F401
    init_distributed,
    global_batch_to_local,
)
