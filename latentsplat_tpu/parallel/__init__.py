from .mesh import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    replicate_sharding,
    shard_batch,
)
from .render import make_view_parallel_render

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_parallel_train_step",
    "make_view_parallel_render",
    "replicate_sharding",
    "shard_batch",
]
