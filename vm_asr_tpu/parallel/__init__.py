from .context import get_activation_mesh, mp_mesh, set_activation_mesh
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "set_activation_mesh",
    "get_activation_mesh",
    "mp_mesh",
]
