"""Uniform learner-facing interface over the environment backends.

The learners (PPO/DQN/SAC) only need four things from an environment:
batched reset, batched autoreset step, the action-space width, and a
donation-safe state. This shim provides them for both backends so one
learner implementation drives either:

- the single-DER env (`pvderx.env.core` + `pvderx.env.vector`) — BASELINE
  configs 1-4, including the anomaly-detection action (config 3) and the
  continuous Box extension, and
- the multi-DER shared-feeder fleet (`pvderx.env.fleet`) — BASELINE config 5,
  whose contract pairs the fleet env with the sharded PPO learner.

Reference analog: the reference trains stable-baselines agents against the
one registered gym env (SURVEY.md §2.1 #13); it has no fleet or vectorized
variant, so this dispatch layer is part of the TPU-native extension surface.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from pvderx.env import core as env_core


class EnvAPI(NamedTuple):
    """What a learner needs from an env backend (see module docstring)."""

    reset_batch: Callable[[Any, int], Any]   # (key, n_envs) -> (state, obs)
    step: Callable[[Any, Any], Any]          # (state, acts) -> (state, obs, r, done, info)
    unalias: Callable[[Any], Any]            # break cached-buffer aliases for donation
    n_actions: int                           # discrete action count (0 if continuous)
    act_dim: int                             # continuous action dim (0 if discrete)
    obs_dim: int
    n_units: int = 1                         # action channels per env: 1, or M
                                             # for the per-unit fleet mode
                                             # (actions are [N, n_units] ints;
                                             # the policy factorizes per unit)


def make_env_api(env_cfg, *, window: str = "auto", block: int | None = None,
                 autoreset: bool = True, mesh=None) -> EnvAPI:
    """Build the learner-facing API for an `EnvConfig` or `FleetConfig`.

    mesh: optional `jax.sharding.Mesh` with an 'env' axis — the window kernel
    is then invoked through `jax.shard_map` over that axis so each chip runs
    the Mosaic kernel on its local batch shard (pvderx/env/vector.py)."""
    from pvderx.env import fleet as fleet_mod

    # env_core.unalias only touches the y0/obs0/ppv0 cache fields, which
    # EnvState and FleetState share — one implementation serves both.
    _unalias = env_core.unalias

    if isinstance(env_cfg, fleet_mod.FleetConfig):
        if env_cfg.base.anomaly_detect or env_cfg.base.continuous:
            raise ValueError(
                "the fleet env's action space is the fleet-level Discrete(5) "
                "only; anomaly_detect/continuous are single-DER env features "
                "(pvderx/env/fleet.py ignores them — don't set them on the "
                "FleetConfig base)")
        blk = 1024 if block is None else block  # fleet VMEM cap (ops/window.py)

        def reset_batch(key, n_envs):
            return jax.vmap(lambda k: fleet_mod.reset(env_cfg, k))(
                jax.random.split(key, n_envs))

        def step(state, actions):
            return fleet_mod._step_batch_impl(
                env_cfg, state, actions, window=window, block=blk,
                autoreset=autoreset, mesh=mesh)

        return EnvAPI(reset_batch=reset_batch, step=step, unalias=_unalias,
                      n_actions=env_core.N_ACTIONS, act_dim=0,
                      obs_dim=fleet_mod.fleet_obs_dim(env_cfg),
                      n_units=env_cfg.m if env_cfg.per_unit else 1)

    from pvderx.env import vector as vector_mod

    blk = 4096 if block is None else block
    if env_cfg.continuous:
        n_actions, act_dim = 0, env_core.ACT_DIM_CONT
    elif env_cfg.anomaly_detect:
        n_actions, act_dim = env_core.N_ACTIONS_ANOM, 0
    else:
        n_actions, act_dim = env_core.N_ACTIONS, 0

    def reset_batch(key, n_envs):
        return jax.vmap(lambda k: env_core.reset(env_cfg, k))(
            jax.random.split(key, n_envs))

    def step(state, actions):
        return vector_mod._step_batch_impl(
            env_cfg, state, actions, window=window, block=blk,
            autoreset=autoreset, mesh=mesh)

    return EnvAPI(reset_batch=reset_batch, step=step, unalias=_unalias,
                  n_actions=n_actions, act_dim=act_dim,
                  obs_dim=env_core.OBS_DIM)
