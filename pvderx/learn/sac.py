"""SAC learner for the continuous-action environment — fully jitted.

Reference analog: the stable-baselines training notebooks (SURVEY.md §2.1
#13); SAC covers the continuous Box action extension the way PPO covers the
reference's discrete space. Same TPU design as `pvderx.learn.ppo`: one jitted
`train_step` holding rollout collection, replay-buffer writes, and gradient
updates in a single XLA program; with the env batch (and buffer) sharded on
the mesh 'env' axis and params replicated, batch-mean losses make GSPMD
insert the gradient all-reduce (SURVEY.md §2.5).

The replay buffer is a fixed-capacity pytree of device arrays (static shapes,
pure-functional circular writes) — checkpointable with the rest of the runner.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pvderx._pytree import pytree_dataclass, replace
from pvderx.env import core as env_core
# packed circular buffer shared with DQN; this learner's row layout:
# [obs(D) | act(A) | rew | done | nobs(D)]
from pvderx.learn.replay import Replay, insert_rows, make_replay, sample_rows
from pvderx.learn.nets import DoubleCritic, TanhGaussianActor


@pytree_dataclass(meta=("rollout_len", "n_updates", "batch_size", "capacity"))
class SACConfig:
    lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005          # polyak rate for target critics
    init_alpha: float = 0.1
    target_entropy: float = -float(env_core.ACT_DIM_CONT)
    rollout_len: int = 8        # env steps collected per train_step
    n_updates: int = 8          # gradient steps per train_step
    batch_size: int = 256
    capacity: int = 65536       # replay slots (per host)


class Batch(NamedTuple):
    obs: jnp.ndarray
    act: jnp.ndarray
    rew: jnp.ndarray
    nobs: jnp.ndarray
    done: jnp.ndarray


@pytree_dataclass
class SACRunner:
    actor: Any
    critic: Any
    critic_tgt: Any
    log_alpha: jnp.ndarray
    opt_actor: Any
    opt_critic: Any
    opt_alpha: Any
    replay: Replay
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    update_i: jnp.ndarray


def _squash(mu, log_std, key):
    """Sample a tanh-squashed Gaussian action and its log-prob."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    pre = mu + std * eps
    act = jnp.tanh(pre)
    logp = (-0.5 * (eps ** 2) - log_std - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)
    logp -= (2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))).sum(-1)
    return act, logp


def make_sac(env_cfg: env_core.EnvConfig, sac: SACConfig,
             hidden=(128, 128), dtype=jnp.float32, mesh=None):
    """Build (init_runner(key, n_envs), train_step(runner)). env_cfg must have
    continuous=True (single-DER env; the fleet action space is discrete)."""
    from pvderx.learn.env_api import make_env_api

    api = make_env_api(env_cfg, mesh=mesh)
    if api.n_units > 1:
        raise ValueError(
            "per-unit fleet control (FleetConfig(per_unit=True)) is "
            "PPO-only: SAC has no factored-action head — use "
            "pvderx.learn.make_ppo, or the aggregate fleet mode")
    if api.act_dim == 0:
        raise ValueError("SAC requires make_env_config(..., continuous=True)")
    obs_dim, act_dim = api.obs_dim, api.act_dim
    actor_net = TanhGaussianActor(act_dim=act_dim, hidden=hidden, dtype=dtype)
    critic_net = DoubleCritic(hidden=hidden, dtype=dtype)
    tx = optax.adam(sac.lr)

    def init_runner(key, n_envs: int) -> SACRunner:
        k_a, k_c, k_env, k_run = jax.random.split(key, 4)
        zo = jnp.zeros((1, obs_dim), dtype)
        za = jnp.zeros((1, act_dim), dtype)
        actor = actor_net.init(k_a, zo)
        critic = critic_net.init(k_c, zo, za)
        env_state, obs = api.reset_batch(k_env, n_envs)
        # break the cached-initial-buffer aliases from reset (donation-safe)
        env_state = api.unalias(env_state)
        cap = sac.capacity
        replay = make_replay(cap, 2 * obs_dim + act_dim + 2, dtype)
        log_alpha = jnp.asarray(jnp.log(sac.init_alpha), dtype)
        # copy the target params so they don't alias critic (donation-safe)
        critic_tgt = jax.tree.map(lambda x: jnp.array(x, copy=True), critic)
        return SACRunner(
            actor=actor, critic=critic, critic_tgt=critic_tgt,
            log_alpha=log_alpha,
            opt_actor=tx.init(actor), opt_critic=tx.init(critic),
            opt_alpha=tx.init(log_alpha),
            replay=replay, env_state=env_state, obs=obs, key=k_run,
            update_i=jnp.zeros((), jnp.int32))

    # batched env step: fused Pallas window kernel on TPU when the batch
    # tiles legally, vmapped scan elsewhere — same physics, same results
    # (pvderx/env/vector.py; tested equal in tests/test_ops.py)
    step_env = api.step

    def _collect(actor, env_state, obs, key):
        def body(carry, k):
            st, ob = carry
            mu, log_std = actor_net.apply(actor, ob)
            a, _ = _squash(mu, log_std, k)
            st, ob2, r, d, _ = step_env(st, a)
            return (st, ob2), Batch(ob, a, r.astype(dtype), ob2,
                                    d.astype(dtype))
        keys = jax.random.split(key, sac.rollout_len)
        (env_state, obs), traj = jax.lax.scan(body, (env_state, obs), keys)
        return env_state, obs, traj

    def _pack_rows(flat: Batch):
        return jnp.concatenate([
            flat.obs, flat.act,
            flat.rew[:, None], flat.done[:, None],
            flat.nobs,
        ], axis=1)

    def _unpack_rows(mat) -> Batch:
        d, a = obs_dim, act_dim
        return Batch(obs=mat[:, :d], act=mat[:, d:d + a],
                     rew=mat[:, d + a], done=mat[:, d + a + 1],
                     nobs=mat[:, d + a + 2:])

    def _insert(rp: Replay, traj: Batch) -> Replay:
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        return insert_rows(rp, _pack_rows(flat))

    def _sample(rp: Replay, key) -> Batch:
        return _unpack_rows(sample_rows(rp, key, sac.batch_size))

    def _update_once(carry, key):
        actor, critic, critic_tgt, log_alpha, oa, oc, oal, rp = carry
        k_s, k_n, k_pi = jax.random.split(key, 3)
        b = _sample(rp, k_s)
        alpha = jnp.exp(log_alpha)

        mu_n, ls_n = actor_net.apply(actor, b.nobs)
        a_n, logp_n = _squash(mu_n, ls_n, k_n)
        q1_t, q2_t = critic_net.apply(critic_tgt, b.nobs, a_n)
        target = b.rew + sac.gamma * (1.0 - b.done) * (
            jnp.minimum(q1_t, q2_t) - alpha * logp_n)
        target = jax.lax.stop_gradient(target)

        def critic_loss(cp):
            q1, q2 = critic_net.apply(cp, b.obs, b.act)
            return ((q1 - target) ** 2 + (q2 - target) ** 2).mean()

        cl, gc = jax.value_and_grad(critic_loss)(critic)
        up, oc = tx.update(gc, oc, critic)
        critic = optax.apply_updates(critic, up)

        def actor_loss(ap):
            mu, ls = actor_net.apply(ap, b.obs)
            a, logp = _squash(mu, ls, k_pi)
            q1, q2 = critic_net.apply(critic, b.obs, a)
            return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

        (al, logp), ga = jax.value_and_grad(actor_loss, has_aux=True)(actor)
        up, oa = tx.update(ga, oa, actor)
        actor = optax.apply_updates(actor, up)

        def alpha_loss(la):
            return -(jnp.exp(la) * jax.lax.stop_gradient(
                logp + sac.target_entropy)).mean()

        all_, gal = jax.value_and_grad(alpha_loss)(log_alpha)
        up, oal = tx.update(gal, oal, log_alpha)
        log_alpha = optax.apply_updates(log_alpha, up)

        critic_tgt = jax.tree.map(
            lambda t, o: (1.0 - sac.tau) * t + sac.tau * o, critic_tgt, critic)
        return ((actor, critic, critic_tgt, log_alpha, oa, oc, oal, rp),
                (cl, al, -logp.mean()))

    def train_step(runner: SACRunner):
        k_roll, k_upd, k_next = jax.random.split(runner.key, 3)
        env_state, obs, traj = _collect(
            runner.actor, runner.env_state, runner.obs, k_roll)
        rp = _insert(runner.replay, traj)
        carry = (runner.actor, runner.critic, runner.critic_tgt,
                 runner.log_alpha, runner.opt_actor, runner.opt_critic,
                 runner.opt_alpha, rp)
        carry, (cl, al, ent) = jax.lax.scan(
            _update_once, carry, jax.random.split(k_upd, sac.n_updates))
        actor, critic, critic_tgt, log_alpha, oa, oc, oal, rp = carry
        metrics = {
            "critic_loss": cl.mean(), "actor_loss": al.mean(),
            "entropy": ent.mean(), "alpha": jnp.exp(log_alpha),
            "reward_mean": traj.rew.mean(), "buffer_size": rp.size,
        }
        return replace(runner, actor=actor, critic=critic,
                       critic_tgt=critic_tgt, log_alpha=log_alpha,
                       opt_actor=oa, opt_critic=oc, opt_alpha=oal,
                       replay=rp, env_state=env_state, obs=obs, key=k_next,
                       update_i=runner.update_i + 1), metrics

    return init_runner, train_step, (actor_net, critic_net)
