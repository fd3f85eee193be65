"""DQN learner for the discrete-action environment — fully jitted.

Reference analog: the stable-baselines **DQN** training notebooks driven
against `gym.make('PVDER-v0')` (SURVEY.md §2.1 #13, L7 — the upstream demos
train DQN and PPO). Same TPU design as `pvderx.learn.ppo` / `.sac`: one jitted
`train_step` holding epsilon-greedy rollout collection, replay-buffer writes,
and double-DQN TD updates in a single XLA program; with the env batch (and
buffer) sharded on the mesh 'env' axis and params replicated, the batch-mean
Huber loss makes GSPMD insert the gradient all-reduce (SURVEY.md §2.5).

The replay buffer is a fixed-capacity pytree of device arrays (static shapes,
pure-functional circular writes) — checkpointable with the rest of the runner.
Epsilon decays linearly in *environment* steps, derived from `update_i` so it
is part of the checkpointed state. The target network hard-syncs every
`target_every` train_steps via a branchless `where` (no host control flow).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pvderx._pytree import pytree_dataclass, replace
from pvderx.env import core as env_core
from pvderx.learn.nets import QNetwork
# packed circular buffer shared with SAC; this learner's row layout:
# [obs(D) | act(f32, exact for small ints) | rew | done | nobs(D)]
from pvderx.learn.replay import Replay, insert_rows, make_replay, sample_rows


@pytree_dataclass(meta=("rollout_len", "n_updates", "batch_size", "capacity",
                        "target_every", "double"))
class DQNConfig:
    lr: float = 3e-4
    gamma: float = 0.99
    eps_start: float = 1.0
    eps_end: float = 0.05
    eps_decay_updates: int = 500   # train_steps over which epsilon anneals
    rollout_len: int = 8           # env steps collected per train_step
    n_updates: int = 8             # gradient steps per train_step
    batch_size: int = 256
    capacity: int = 65536          # replay slots (per host)
    target_every: int = 16         # hard target sync period (train_steps)
    double: bool = True            # double-DQN action selection


class Batch(NamedTuple):
    obs: jnp.ndarray
    act: jnp.ndarray
    rew: jnp.ndarray
    nobs: jnp.ndarray
    done: jnp.ndarray


@pytree_dataclass
class DQNRunner:
    params: Any
    params_tgt: Any
    opt_state: Any
    replay: Replay
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    update_i: jnp.ndarray


def make_dqn(env_cfg, dqn: DQNConfig,
             hidden=(128, 128), dtype=jnp.float32, mesh=None):
    """Build (init_runner(key, n_envs), train_step(runner), net).

    env_cfg must be discrete (the reference's action space) — a single-DER
    `EnvConfig` (the anomaly variant of BASELINE config 3 widens the head to
    N_ACTIONS_ANOM) or a `FleetConfig` (dispatched via pvderx.learn.env_api).
    """
    from pvderx.learn.env_api import make_env_api

    api = make_env_api(env_cfg, mesh=mesh)
    if api.n_units > 1:
        raise ValueError(
            "per-unit fleet control (FleetConfig(per_unit=True)) is "
            "PPO-only: DQN has no factored-action head — use "
            "pvderx.learn.make_ppo, or the aggregate fleet mode")
    if api.n_actions == 0:
        raise ValueError("DQN requires a discrete env (continuous=False)")
    n_actions = api.n_actions
    net = QNetwork(n_actions=n_actions, hidden=hidden, dtype=dtype)
    tx = optax.adam(dqn.lr)

    def init_runner(key, n_envs: int) -> DQNRunner:
        k_net, k_env, k_run = jax.random.split(key, 3)
        params = net.init(k_net, jnp.zeros((1, api.obs_dim), dtype))
        env_state, obs = api.reset_batch(k_env, n_envs)
        # break the cached-initial-buffer aliases from reset (donation-safe)
        env_state = api.unalias(env_state)
        replay = make_replay(dqn.capacity, 2 * api.obs_dim + 3, dtype)
        params_tgt = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        return DQNRunner(params=params, params_tgt=params_tgt,
                         opt_state=tx.init(params), replay=replay,
                         env_state=env_state, obs=obs, key=k_run,
                         update_i=jnp.zeros((), jnp.int32))

    # batched env step: fused Pallas window kernel on TPU when the batch
    # tiles legally, vmapped scan elsewhere — same physics, same results
    # (pvderx/env/vector.py; tested equal in tests/test_ops.py)
    step_env = api.step

    def _epsilon(update_i):
        frac = jnp.clip(update_i.astype(dtype) / dqn.eps_decay_updates, 0.0, 1.0)
        return dqn.eps_start + frac * (dqn.eps_end - dqn.eps_start)

    def _collect(params, env_state, obs, key, eps):
        def body(carry, k):
            st, ob = carry
            k_eps, k_rand = jax.random.split(k)
            q = net.apply(params, ob)
            greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
            rand = jax.random.randint(k_rand, greedy.shape, 0, n_actions,
                                      dtype=jnp.int32)
            explore = jax.random.uniform(k_eps, greedy.shape, dtype) < eps
            a = jnp.where(explore, rand, greedy)
            st, ob2, r, d, _ = step_env(st, a)
            return (st, ob2), Batch(ob, a, r.astype(dtype), ob2,
                                    d.astype(dtype))
        keys = jax.random.split(key, dqn.rollout_len)
        (env_state, obs), traj = jax.lax.scan(body, (env_state, obs), keys)
        return env_state, obs, traj

    def _pack_rows(flat: Batch):
        return jnp.concatenate([
            flat.obs,
            flat.act[:, None].astype(dtype),   # exact for small ints
            flat.rew[:, None],
            flat.done[:, None],
            flat.nobs,
        ], axis=1)

    def _unpack_rows(mat) -> Batch:
        d = api.obs_dim
        return Batch(obs=mat[:, :d],
                     act=mat[:, d].astype(jnp.int32),
                     rew=mat[:, d + 1],
                     nobs=mat[:, d + 3:],
                     done=mat[:, d + 2])

    def _insert(rp: Replay, traj: Batch) -> Replay:
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        return insert_rows(rp, _pack_rows(flat))

    def _sample(rp: Replay, key) -> Batch:
        return _unpack_rows(sample_rows(rp, key, dqn.batch_size))

    def _update_once(carry, key):
        params, params_tgt, opt_state, rp = carry
        b = _sample(rp, key)
        q_next_tgt = net.apply(params_tgt, b.nobs)
        if dqn.double:
            a_next = jnp.argmax(net.apply(params, b.nobs), axis=-1)
        else:
            a_next = jnp.argmax(q_next_tgt, axis=-1)
        q_next = jnp.take_along_axis(q_next_tgt, a_next[:, None], axis=-1)[:, 0]
        target = b.rew + dqn.gamma * (1.0 - b.done) * q_next
        target = jax.lax.stop_gradient(target)

        def loss_fn(p):
            q = net.apply(p, b.obs)
            q_a = jnp.take_along_axis(q, b.act[:, None], axis=-1)[:, 0]
            return optax.huber_loss(q_a, target).mean(), q_a.mean()

        (loss, q_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, params_tgt, opt_state, rp), (loss, q_mean)

    def train_step(runner: DQNRunner):
        k_roll, k_upd, k_next = jax.random.split(runner.key, 3)
        eps = _epsilon(runner.update_i)
        env_state, obs, traj = _collect(
            runner.params, runner.env_state, runner.obs, k_roll, eps)
        rp = _insert(runner.replay, traj)
        carry = (runner.params, runner.params_tgt, runner.opt_state, rp)
        carry, (loss, q_mean) = jax.lax.scan(
            _update_once, carry, jax.random.split(k_upd, dqn.n_updates))
        params, params_tgt, opt_state, rp = carry
        update_i = runner.update_i + 1
        # branchless hard target sync every target_every train_steps
        sync = (update_i % dqn.target_every == 0)
        params_tgt = jax.tree.map(
            lambda t, o: jnp.where(sync, o, t), params_tgt, params)
        metrics = {
            "loss": loss.mean(), "q_mean": q_mean.mean(), "epsilon": eps,
            "reward_mean": traj.rew.mean(), "buffer_size": rp.size,
        }
        return replace(runner, params=params, params_tgt=params_tgt,
                       opt_state=opt_state, replay=rp, env_state=env_state,
                       obs=obs, key=k_next, update_i=update_i), metrics

    return init_runner, train_step, net
