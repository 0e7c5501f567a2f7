from synfmc_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    create_serving_mesh,
    is_main_process,
    replicate,
    shard_batch,
    shard_over_fsdp,
    state_shardings,
)

__all__ = [
    "create_mesh",
    "create_serving_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "is_main_process",
    "shard_over_fsdp",
    "state_shardings",
]
