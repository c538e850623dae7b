"""Device mesh + sharding rules."""

from diffmst_tpu.parallel.mesh import (
    P,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["P", "batch_sharding", "make_mesh", "replicated", "shard_batch"]
