from .mesh import auto_mesh, make_mesh, mesh_axes
from .sharding import (
    batch_sharding,
    replicate,
    shard_params,
    DEFAULT_PARAM_RULES,
)

__all__ = [
    "auto_mesh",
    "make_mesh",
    "mesh_axes",
    "batch_sharding",
    "replicate",
    "shard_params",
    "DEFAULT_PARAM_RULES",
]
