"""Device-mesh parallelism: DP/MP meshes, sharding rules, multi-host init."""

from .distributed import host_shard_info, initialize, per_host_batch
from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, replicated
from .sharding_rules import DEFAULT_RULES, shard_params, sharding_for_path

__all__ = [
    "DATA_AXIS",
    "DEFAULT_RULES",
    "MODEL_AXIS",
    "batch_sharding",
    "host_shard_info",
    "initialize",
    "make_mesh",
    "per_host_batch",
    "replicated",
    "shard_params",
    "sharding_for_path",
]
