"""PPO learner — fully jitted, env-batch sharded, collectives by GSPMD.

Reference analog: the stable-baselines PPO training driven from notebooks
(SURVEY.md §2.1 #13). pvderx's learner is a single jitted `train_step`:
rollout collection (lax.scan over the vectorized env), GAE, and minibatched
clipped-PPO epochs all inside one XLA program. With env state sharded over the
mesh 'env' axis and params replicated, the batch-mean losses make XLA insert
the gradient all-reduce over ICI — no hand-written communication
(SURVEY.md §2.5).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pvderx._pytree import pytree_dataclass, replace
from pvderx.env import core as env_core
from pvderx.learn.nets import ActorCritic


@pytree_dataclass(meta=("rollout_len", "n_epochs", "n_minibatch"))
class PPOConfig:
    lr: float = 3e-4
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    rollout_len: int = 16
    n_epochs: int = 4
    n_minibatch: int = 4


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


@pytree_dataclass
class PPORunner:
    """Everything the training loop carries (checkpointable as one pytree)."""

    params: Any
    opt_state: Any
    env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray
    update_i: jnp.ndarray


def make_ppo(env_cfg, ppo: PPOConfig,
             hidden=(128, 128), dtype=jnp.float32, mesh=None):
    """Build (init_runner(key, n_envs), train_step(runner)) for one mesh/host.

    train_step is pure and jittable; under a Mesh with the env batch sharded
    on 'env' and params replicated, it is the full multi-chip training step.

    env_cfg may be a single-DER `EnvConfig` (BASELINE configs 1-4, including
    the 6-action anomaly-detection variant of config 3) or a `FleetConfig`
    (BASELINE config 5: fleet env + sharded PPO learner) — dispatched through
    `pvderx.learn.env_api`. Discrete action spaces only; use SAC for the
    continuous extension.
    """
    from pvderx.learn.env_api import make_env_api

    api = make_env_api(env_cfg, mesh=mesh)
    if api.n_actions == 0:
        raise ValueError("PPO here is discrete-action; got a continuous env "
                         "config (use pvderx.learn.sac for Box actions)")
    # per-unit fleet mode (api.n_units = M > 1): the policy FACTORIZES over
    # units — one (n_actions)-way categorical head per inverter, sampled
    # independently; the joint log-prob is the per-unit sum. The head is one
    # Dense of width M*n_actions reshaped [.., M, A] (module docstring of
    # pvderx/env/fleet.py). M == 1 keeps the exact single-head code path.
    M = api.n_units
    net = ActorCritic(n_actions=api.n_actions * M, hidden=hidden, dtype=dtype)

    def _sample(k, logits):
        """actions + joint logp from the (possibly factored) head."""
        if M == 1:
            a = jax.random.categorical(k, logits)
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits), a[:, None], axis=-1)[:, 0]
            return a, logp
        lg = logits.reshape(logits.shape[0], M, api.n_actions)
        a = jax.random.categorical(k, lg)                      # [N, M]
        lp = jax.nn.log_softmax(lg)
        logp = jnp.take_along_axis(lp, a[..., None], axis=-1)[..., 0].sum(-1)
        return a, logp

    def _logp_entropy(logits, action):
        """joint logp of `action` + policy entropy (summed over units)."""
        if M == 1:
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(
                logp_all, action[:, None], axis=-1)[:, 0]
            entropy = -(jnp.exp(logp_all) * logp_all).sum(-1)
            return logp, entropy
        lg = logits.reshape(logits.shape[0], M, api.n_actions)
        lp = jax.nn.log_softmax(lg)
        logp = jnp.take_along_axis(lp, action[..., None], axis=-1)[..., 0]
        entropy = -(jnp.exp(lp) * lp).sum(-1)
        return logp.sum(-1), entropy.sum(-1)
    tx = optax.chain(
        optax.clip_by_global_norm(ppo.max_grad_norm),
        optax.adam(ppo.lr),
    )

    def init_runner(key, n_envs: int) -> PPORunner:
        k_net, k_env, k_run = jax.random.split(key, 3)
        params = net.init(k_net, jnp.zeros((1, api.obs_dim), dtype))
        opt_state = tx.init(params)
        env_state, obs = api.reset_batch(k_env, n_envs)
        # break the cached-initial-buffer aliases from reset (donation-safe)
        env_state = api.unalias(env_state)
        return PPORunner(params=params, opt_state=opt_state,
                         env_state=env_state, obs=obs, key=k_run,
                         update_i=jnp.zeros((), jnp.int32))

    # batched env step: fused Pallas window kernel on TPU when the batch
    # tiles legally, vmapped scan elsewhere — same physics, same results
    # (pvderx/env/vector.py; tested equal in tests/test_ops.py)
    step_env = api.step

    def _collect(params, env_state, obs, key):
        def body(carry, k):
            st, ob = carry
            logits, v = net.apply(params, ob)
            a, logp = _sample(k, logits)
            st, ob2, r, d, _ = step_env(st, a)
            return (st, ob2), Transition(ob, a, logp, v, r.astype(dtype),
                                         d.astype(dtype))
        keys = jax.random.split(key, ppo.rollout_len)
        (env_state, obs), traj = jax.lax.scan(body, (env_state, obs), keys)
        _, last_v = net.apply(params, obs)
        return env_state, obs, traj, last_v

    def _gae(traj: Transition, last_v):
        def body(carry, tr):
            gae, next_v = carry
            nonterm = 1.0 - tr.done
            delta = tr.reward + ppo.gamma * next_v * nonterm - tr.value
            gae = delta + ppo.gamma * ppo.lam * nonterm * gae
            return (gae, tr.value), gae
        (_, _), adv = jax.lax.scan(
            body, (jnp.zeros_like(last_v), last_v), traj, reverse=True)
        return adv, adv + traj.value

    def _loss(params, batch):
        obs, action, old_logp, old_v, adv, ret = batch
        logits, v = net.apply(params, obs)
        logp, ent = _logp_entropy(logits, action)
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv_n
        pg2 = jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps) * adv_n
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_clip = old_v + jnp.clip(v - old_v, -ppo.clip_eps, ppo.clip_eps)
        v_loss = 0.5 * jnp.maximum((v - ret) ** 2, (v_clip - ret) ** 2).mean()
        entropy = ent.mean()
        loss = pg_loss + ppo.vf_coef * v_loss - ppo.ent_coef * entropy
        return loss, (pg_loss, v_loss, entropy)

    def _update(params, opt_state, traj, adv, ret, key):
        t, n = traj.reward.shape
        obs_dim = traj.obs.shape[-1]
        # Pack the six per-row fields into ONE [T*N, obs_dim+5] matrix so the
        # per-epoch shuffle is a single wide-row gather. Six separate gathers
        # of narrow arrays are index-latency-bound on TPU: measured 55.6 ms
        # vs 0.46 ms packed at T*N=262144 (the shuffle was 83% of the whole
        # train_step; end-to-end PPO 3.48M -> 6.60M env-steps/s). The action
        # column rides as f32 — exact for small ints — and is cast back on
        # unpack, so the math is bit-identical to the unpacked form.
        mat = jnp.concatenate([
            traj.obs.reshape(t * n, obs_dim),
            traj.action.reshape(t * n, M).astype(dtype),
            traj.logp.reshape(t * n, 1),
            traj.value.reshape(t * n, 1),
            adv.reshape(t * n, 1),
            ret.reshape(t * n, 1),
        ], axis=1)

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, t * n)
            mbs = mat[perm].reshape(ppo.n_minibatch, -1, mat.shape[1])

            def mb_step(carry, mb):
                params, opt_state = carry
                act = (mb[:, obs_dim].astype(jnp.int32) if M == 1 else
                       mb[:, obs_dim:obs_dim + M].astype(jnp.int32))
                batch = (mb[:, :obs_dim], act,
                         mb[:, obs_dim + M], mb[:, obs_dim + M + 1],
                         mb[:, obs_dim + M + 2], mb[:, obs_dim + M + 3])
                (loss, aux), grads = jax.value_and_grad(_loss, has_aux=True)(
                    params, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

            (params, opt_state), metrics = jax.lax.scan(
                mb_step, (params, opt_state), mbs)
            return (params, opt_state), metrics

        keys = jax.random.split(key, ppo.n_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            epoch, (params, opt_state), keys)
        return params, opt_state, jax.tree.map(jnp.mean, metrics)

    def train_step(runner: PPORunner):
        k_roll, k_upd, k_next = jax.random.split(runner.key, 3)
        env_state, obs, traj, last_v = _collect(
            runner.params, runner.env_state, runner.obs, k_roll)
        adv, ret = _gae(traj, last_v)
        params, opt_state, (loss, pg, vl, ent) = _update(
            runner.params, runner.opt_state, traj, adv, ret, k_upd)
        metrics = {
            "loss": loss, "pg_loss": pg, "v_loss": vl, "entropy": ent,
            "reward_mean": traj.reward.mean(),
            "done_frac": traj.done.mean(),
        }
        return replace(runner, params=params, opt_state=opt_state,
                       env_state=env_state, obs=obs, key=k_next,
                       update_i=runner.update_i + 1), metrics

    return init_runner, train_step, net
