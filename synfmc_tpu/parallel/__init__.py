from synfmc_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    create_serving_mesh,
    fetch_to_host,
    is_main_process,
    locally_coverable,
    replicate,
    shard_batch,
    shard_over_fsdp,
    state_shardings,
    sync_stop_flag,
    tree_locally_coverable,
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
    "fetch_to_host",
    "locally_coverable",
    "tree_locally_coverable",
    "sync_stop_flag",
]
