"""Device mesh construction — the TPU-native communication layer's backbone.

Reference analog: **none** — the reference is single-process with zero IPC
(SURVEY.md §2.5). The TPU-native equivalent of an NCCL/MPI layer is JAX's
compiler-emitted collectives over ICI/DCN: we define a `Mesh` with an `'env'`
axis, shard all env-batch pytrees with `NamedSharding(P('env'))`
(pvderx/dist/sharding.py), keep learner params replicated, and let GSPMD
insert the psum/all-gather where needed (learner gradient all-reduce rides
ICI automatically when the loss averages over the sharded env axis).

Multi-host: `pvderx.dist.multihost.init_multihost()` before any JAX usage;
the same mesh code then spans all processes' devices.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

ENV_AXIS = "env"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the env axis (data parallelism over environments)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))
