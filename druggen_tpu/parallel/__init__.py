"""Device-mesh parallelism (SPMD via jax.sharding / GSPMD)."""

from druggen_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharding,
    shard_batch,
    shard_state,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "shard_state",
]
