"""Learners must LEARN — better-than-random gates (SURVEY.md §2.1 #13).

Round-3 verdict: the learner tests checked mechanics, determinism, and head
widths, but never that return improves. These gates train each learner for a
small seeded budget on CPU and require the trained policy's on-policy mean
reward to beat a random policy's by a pinned margin (≥2x the worst observed
seed-to-seed slack):

- PPO on the BASELINE config-3 family (anomaly detection, frequent sags):
  random ≈ 0.0637, trained last-10 ≈ 0.099 over 3 probe seeds → margin 0.02.
- DQN on the same env (ε decayed over 80 updates): trained ≈ 0.092-0.094
  → margin 0.012.
- SAC on a high-authority continuous variant (dq=0.15/dv=0.06 per step, so a
  random policy damages its own tracking hard): random ≈ 0.0537, trained
  ≈ 0.0847 over 300 updates → margin 0.015, pinned at ~half the observed
  0.031 gain (round 5 — the old dq=0.05 gate's 0.002 margin was 2.4%
  relative, weak evidence; this one is 58% relative).
- Per-unit fleet PPO (round 5): see
  test_fleet_per_unit_ppo_learns_better_than_uniform (margin 0.008 of an
  observed 0.0144).

Everything is seeded; on the CPU test backend the runs are deterministic, so
these are regression gates, not flaky statistical tests. The RL notebook
(examples/notebooks) records the full learning curve.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx.env import make_env_config
from pvderx.env.core import ScenarioConfig
from pvderx.learn import (
    DQNConfig, PPOConfig, SACConfig, make_dqn, make_ppo, make_sac)
from pvderx.learn.env_api import make_env_api

SCEN3 = ScenarioConfig(p_sag=0.9, p_freq=0.1, sag_depth_lo=0.2,
                       sag_depth_hi=0.85)
N_ENVS = 64


def _anomaly_cfg():
    return make_env_config("10", n_sub=40, horizon=50, anomaly_detect=True,
                           scen=SCEN3)


def _random_return(cfg, seed, steps=320, continuous=False):
    """Mean per-step reward of a uniform-random policy (the baseline)."""
    api = make_env_api(cfg)
    st, ob = api.reset_batch(jax.random.PRNGKey(seed), N_ENVS)
    step = jax.jit(api.step)
    key = jax.random.PRNGKey(seed + 999)
    tot = []
    for _ in range(steps):
        key, k = jax.random.split(key)
        if continuous:
            a = jax.random.uniform(k, (N_ENVS, api.act_dim),
                                   minval=-1.0, maxval=1.0)
        else:
            a = jax.random.randint(k, (N_ENVS,), 0, api.n_actions)
        st, ob, r, d, _ = step(st, a)
        tot.append(float(r.mean()))
    return float(np.mean(tot))


def _train(make, cfg, learner_cfg, n_updates, seed=0):
    init_runner, train_step, _ = make(cfg, learner_cfg, hidden=(32, 32))
    runner = init_runner(jax.random.PRNGKey(seed), N_ENVS)
    ts = jax.jit(train_step, donate_argnums=(0,))
    rews = []
    for _ in range(n_updates):
        runner, m = ts(runner)
        rews.append(float(m["reward_mean"]))
    return rews


def test_ppo_learns_better_than_random():
    cfg = _anomaly_cfg()
    rews = _train(make_ppo, cfg,
                  PPOConfig(rollout_len=16, n_epochs=2, n_minibatch=4,
                            lr=3e-3, ent_coef=0.005), 60)
    random_ret = _random_return(cfg, 0)
    trained = float(np.mean(rews[-10:]))
    assert trained > random_ret + 0.02, (
        f"PPO did not learn: trained={trained:.4f} random={random_ret:.4f}")


def test_dqn_learns_better_than_random():
    cfg = _anomaly_cfg()
    rews = _train(make_dqn, cfg,
                  DQNConfig(lr=1e-3, eps_decay_updates=80, eps_end=0.05), 200)
    random_ret = _random_return(cfg, 0)
    trained = float(np.mean(rews[-20:]))
    assert trained > random_ret + 0.012, (
        f"DQN did not learn: trained={trained:.4f} random={random_ret:.4f}")


def test_sac_learns_better_than_random():
    cfg = make_env_config("10", n_sub=40, horizon=50, continuous=True,
                          dq_action=0.15, dv_action=0.06)
    rews = _train(make_sac, cfg, SACConfig(lr=3e-3, init_alpha=0.05), 300)
    random_ret = _random_return(cfg, 7, continuous=True)
    trained = float(np.mean(rews[-20:]))
    assert trained > random_ret + 0.015, (
        f"SAC did not learn: trained={trained:.4f} random={random_ret:.4f}")


def test_fleet_per_unit_ppo_learns_better_than_uniform():
    """Per-unit fleet control (round 5, FleetConfig(per_unit=True)): the
    factored PPO head — one Discrete(5) per inverter, joint logp — must
    learn. Task: sag-heavy scenario with high-authority setpoint deltas
    (dq=0.1/dv=0.04): a uniform-random per-unit policy walks every unit's
    setpoints and pays tracking/band penalties (measured 0.0828), holding
    scores ~0.100, and 100 seeded PPO updates reach 0.0972 — pinned margin
    0.008 ≈ half the observed gain (deterministic on the CPU backend)."""
    from pvderx.env.fleet import make_fleet_config

    scen = ScenarioConfig(p_sag=0.9, p_freq=0.1, sag_depth_lo=0.2,
                          sag_depth_hi=0.85)
    fc = make_fleet_config("10", m=4, n_sub=40, horizon=50, per_unit=True,
                           dq_action=0.1, dv_action=0.04, scen=scen)
    init_runner, train_step, _ = make_ppo(
        fc, PPOConfig(rollout_len=16, n_epochs=2, n_minibatch=4, lr=3e-3,
                      ent_coef=0.005), hidden=(32, 32))
    runner = init_runner(jax.random.PRNGKey(0), 32)
    ts = jax.jit(train_step, donate_argnums=(0,))
    rews = []
    for _ in range(100):
        runner, m = ts(runner)
        rews.append(float(m["reward_mean"]))

    api = make_env_api(fc)
    st, ob = api.reset_batch(jax.random.PRNGKey(0), 32)
    step = jax.jit(api.step)
    key = jax.random.PRNGKey(999)
    tot = []
    for _ in range(200):
        key, k = jax.random.split(key)
        a = jax.random.randint(k, (32, fc.m), 0, 5)
        st, ob, r, d, _ = step(st, a)
        tot.append(float(r.mean()))
    random_ret = float(np.mean(tot))
    trained = float(np.mean(rews[-10:]))
    assert trained > random_ret + 0.008, (
        f"per-unit fleet PPO did not learn: trained={trained:.4f} "
        f"random={random_ret:.4f}")
