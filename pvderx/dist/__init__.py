from pvderx.dist.mesh import (
    make_mesh, shard_batch, replicate, env_sharding, ENV_AXIS,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "env_sharding", "ENV_AXIS"]
