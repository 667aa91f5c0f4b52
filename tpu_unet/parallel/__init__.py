from tpu_unet.parallel.mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    make_mesh,
    maybe_initialize,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "batch_sharding",
    "make_mesh",
    "maybe_initialize",
    "replicate",
    "replicated",
    "shard_batch",
]
