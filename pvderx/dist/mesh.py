"""Device mesh + sharding helpers — the TPU-native communication layer.

Reference analog: **none** — the reference is single-process with zero IPC
(SURVEY.md §2.5). The TPU-native equivalent of an NCCL/MPI layer is JAX's
compiler-emitted collectives over ICI/DCN: we define a `Mesh` with an `'env'`
axis, shard all env-batch pytrees with `NamedSharding(P('env'))`, keep learner
params replicated, and let GSPMD insert the psum/all-gather where needed
(learner gradient all-reduce rides ICI automatically when the loss averages
over the sharded env axis).

Multi-host: call `init_multihost()` (wraps `jax.distributed.initialize`) before
any JAX usage; the same mesh code then spans all processes' devices.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the env axis (data parallelism over environments)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh, ndim_leading_env: int = 1) -> NamedSharding:
    """Sharding for a [N_env, ...] array: split axis 0 over the env axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def shard_batch(tree, mesh: Mesh):
    """Place every leaf of a [N_env, ...] pytree with axis 0 sharded on 'env'."""
    sh = NamedSharding(mesh, P(ENV_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (learner params / optimizer state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Multi-host bring-up (gang-scheduled; SURVEY.md §5 failure model)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
