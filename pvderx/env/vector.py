"""Batched environment: jit(vmap(step)) factories.

This is the core TPU design (SURVEY.md §2.5): all env state is a pytree of
[N, ...] leaves; stepping N envs is one fused XLA program. The config is
closed over (its scalars become compile-time constants).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pvderx.env import core


def make_batch_fns(cfg: core.EnvConfig, autoreset: bool = True, donate: bool = True):
    """Returns (reset_batch(keys) -> (state, obs),
                step_batch(state, actions) -> (state, obs, reward, done, info)).

    keys: [N, 2] PRNG keys; actions: [N] int32. All outputs batched on axis 0.
    """
    step_fn = core.step_autoreset if autoreset else core.step

    @jax.jit
    def reset_batch(keys):
        return jax.vmap(lambda k: core.reset(cfg, k))(keys)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_batch(state, actions):
        return jax.vmap(lambda s, a: step_fn(cfg, s, a))(state, actions)

    return reset_batch, step_batch


def rollout(cfg: core.EnvConfig, state, obs, policy_fn, n_steps: int, key):
    """Scan a policy over n_steps of a batched env with auto-reset.

    policy_fn(obs, key) -> actions [N]. Returns (state, obs, rewards [T,N],
    dones [T,N]). The time axis is a lax.scan (SURVEY.md §5: the TPU analog of
    sequence parallelism is the rollout time axis; use jax.checkpoint upstream
    for very long horizons).
    """
    step_fn = jax.vmap(lambda s, a: core.step_autoreset(cfg, s, a))

    def body(carry, k):
        st, ob = carry
        acts = policy_fn(ob, k)
        st, ob, rew, done, _ = step_fn(st, acts)
        return (st, ob), (rew, done)

    keys = jax.random.split(key, n_steps)
    (state, obs), (rews, dones) = jax.lax.scan(body, (state, obs), keys)
    return state, obs, rews, dones
