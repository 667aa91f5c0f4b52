from tpu_unet.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
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
    "MODEL_AXIS",
    "SPACE_AXIS",
    "batch_sharding",
    "make_mesh",
    "maybe_initialize",
    "replicate",
    "replicated",
    "shard_batch",
]

from tpu_unet.parallel.collectives import (  # noqa: E402
    all_gather_host_values,
    broadcast_from_host0,
    psum_scalar,
)

__all__ += ["all_gather_host_values", "broadcast_from_host0", "psum_scalar"]

from tpu_unet.parallel.fsdp import (  # noqa: E402
    fsdp_sharding,
    per_device_state_bytes,
    shard_state,
    sharded_fraction,
)

__all__ += ["fsdp_sharding", "per_device_state_bytes", "shard_state",
            "sharded_fraction"]

from tpu_unet.parallel.tensor import (  # noqa: E402
    tp_leaf_spec,
    tp_state_sharding,
)

__all__ += ["tp_leaf_spec", "tp_state_sharding"]
