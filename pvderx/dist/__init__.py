from pvderx.dist.mesh import ENV_AXIS, make_mesh
from pvderx.dist.sharding import (
    env_sharding, replicate, shard_batch, shard_runner,
)
from pvderx.dist.tp import (
    MODEL_AXIS, make_mesh_2d, param_partition_specs, shard_params_tp,
    shard_runner_tp,
)
from pvderx.dist.multihost import (
    global_mesh, init_multihost, make_global_array, process_env_slice,
    sync_hosts,
)

__all__ = [
    "ENV_AXIS", "make_mesh",
    "env_sharding", "replicate", "shard_batch", "shard_runner",
    "MODEL_AXIS", "make_mesh_2d", "param_partition_specs", "shard_params_tp",
    "shard_runner_tp",
    "global_mesh", "init_multihost", "make_global_array",
    "process_env_slice", "sync_hosts",
]
