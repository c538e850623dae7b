"""Device mesh + sharding rules."""

from diffmst_tpu.parallel.mesh import (
    P,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    stacked_batch_sharding,
)

__all__ = [
    "P",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "stacked_batch_sharding",
]
