from pvderx.dist.mesh import ENV_AXIS, make_mesh
from pvderx.dist.sharding import (
    env_sharding, replicate, shard_batch, shard_runner,
)
from pvderx.dist.multihost import (
    global_mesh, init_multihost, make_global_array, process_env_slice,
    sync_hosts,
)

__all__ = [
    "ENV_AXIS", "make_mesh",
    "env_sharding", "replicate", "shard_batch", "shard_runner",
    "global_mesh", "init_multihost", "make_global_array",
    "process_env_slice", "sync_hosts",
]
