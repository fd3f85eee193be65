"""Multi-host bring-up and host-coordination helpers.

Reference analog: **none** (single process, zero IPC — SURVEY.md §2.5). The
TPU-native equivalent: `jax.distributed` gives the process group (coordination
service), a global Mesh spans all hosts' devices, and per-host work is the
local shard of globally-sharded arrays. JAX/TPU jobs are gang-scheduled;
recovery is checkpoint-restart, not elastic resize (SURVEY.md §5).
"""
from __future__ import annotations

import jax
import numpy as np

from pvderx.dist.mesh import ENV_AXIS, make_mesh


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Multi-host bring-up: call before any other JAX usage on every process.

    Under single-process launches this is a no-op-safe wrapper around
    `jax.distributed.initialize` (which reads cluster env vars when args are
    None on TPU pods)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """A 1-D 'env' mesh over every device of every process."""
    return make_mesh()


def process_env_slice(n_envs_global: int) -> slice:
    """This process's contiguous slice of the global env batch (for host-side
    IO like scenario loading or metrics: device placement is handled by
    NamedSharding; this is only for host-local data preparation)."""
    pid, np_ = jax.process_index(), jax.process_count()
    if n_envs_global % np_:
        raise ValueError(f"n_envs={n_envs_global} not divisible by "
                         f"{np_} processes")
    per = n_envs_global // np_
    return slice(pid * per, (pid + 1) * per)


def make_global_array(local_np: np.ndarray, mesh, n_envs_global: int):
    """Assemble a globally-sharded [N_global, ...] jax.Array from each host's
    local shard (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(ENV_AXIS))
    return jax.make_array_from_process_local_data(
        sh, local_np, (n_envs_global,) + local_np.shape[1:])


def sync_hosts(name: str = "pvderx"):
    """Barrier across processes (multihost_utils)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
