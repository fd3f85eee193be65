"""Sharding placement helpers (split out of mesh.py per SURVEY.md §7 layout).

The TPU-native communication layer: NamedSharding placements over the 'env'
mesh axis; GSPMD inserts psum/all-gather collectives over ICI/DCN — no
hand-written transport (SURVEY.md §2.5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pvderx.dist.mesh import ENV_AXIS


def env_sharding(mesh: Mesh, ndim_leading_env: int = 1) -> NamedSharding:
    """Sharding for a [N_env, ...] array: split axis 0 over the env axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def shard_batch(tree, mesh: Mesh):
    """Place every leaf of a [N_env, ...] pytree with axis 0 sharded on 'env'.
    Rank-0 leaves (counters like a replay buffer's ptr/size) are replicated —
    there is no batch axis to split."""
    sh = NamedSharding(mesh, P(ENV_AXIS))
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, rep if jnp.ndim(x) == 0 else sh), tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (learner params / optimizer state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_runner(runner, mesh: Mesh, env_fields=("env_state", "obs", "replay")):
    """Place a learner runner pytree: env batch sharded, everything else
    replicated (the BASELINE config-5 layout: DP over envs, learner
    all-reduce by GSPMD)."""
    import dataclasses

    out = {}
    for f in dataclasses.fields(runner):
        v = getattr(runner, f.name)
        out[f.name] = (shard_batch(v, mesh) if f.name in env_fields
                       else replicate(v, mesh))
    return type(runner)(**out)
