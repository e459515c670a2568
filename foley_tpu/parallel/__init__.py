from foley_tpu.parallel.mesh import make_mesh
from foley_tpu.parallel.sharding import (
    MMDIT_PARAM_RULES,
    batch_sharding,
    partition_spec_for,
    shard_params,
)

__all__ = [
    "make_mesh",
    "MMDIT_PARAM_RULES",
    "batch_sharding",
    "partition_spec_for",
    "shard_params",
]
