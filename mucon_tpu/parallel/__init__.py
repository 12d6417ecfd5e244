from mucon_tpu.parallel.multihost import (
    init_distributed,
    is_coordinator,
    make_multihost_mesh,
    process_batch_slice,
    shard_batch_arrays_multihost,
)
from mucon_tpu.parallel.mesh import (
    batch_specs,
    make_mesh,
    make_sharded_forward,
    make_sharded_train_step,
    mesh_from_config,
    mesh_is_data_only,
    pad_batch_to_multiple,
    param_specs,
    shard_batch_arrays,
    shard_params,
)

__all__ = [
    "make_mesh",
    "mesh_from_config",
    "mesh_is_data_only",
    "batch_specs",
    "shard_batch_arrays",
    "pad_batch_to_multiple",
    "param_specs",
    "shard_params",
    "make_sharded_train_step",
    "make_sharded_forward",
    "init_distributed",
    "is_coordinator",
    "make_multihost_mesh",
    "process_batch_slice",
    "shard_batch_arrays_multihost",
]
