"""Anomaly-detection reward tests (BASELINE config 3: LVRT sag scenario with
anomaly-detection reward; north-star "anomaly injection" events)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx._pytree import replace
from pvderx.config import load_env_config
from pvderx.env import core, make_env_config
from pvderx.scenario import EventBuilder


@pytest.fixture(scope="module")
def cfg():
    return make_env_config("10", n_sub=40, horizon=200, anomaly_detect=True)


def _fixed_sag_state(cfg, t_sag=0.5, dur=0.5, depth=0.5):
    """Reset, then overwrite the schedule with a deterministic sag."""
    st, obs = core.reset(cfg, jax.random.PRNGKey(0))
    ev = EventBuilder(s_irr=float(st.s0), t_cell=float(st.tc0))
    ev.add_grid_event(t_sag, v=depth)
    ev.add_grid_event(t_sag + dur, v=1.0)
    sched = ev.build(k_solar=cfg.k_solar, k_grid=cfg.k_grid,
                     k_load=cfg.k_load, dtype=np.float32)
    return replace(st, sched=sched), obs


def test_flag_during_anomaly_rewarded(cfg):
    st, _ = _fixed_sag_state(cfg)
    f = jax.jit(lambda s, a: core.step(cfg, s, a))
    hold, flag = jnp.int32(0), jnp.int32(5)
    # step to inside the sag window (t_sag=0.5s -> step 30 at 1/60s)
    for _ in range(35):
        st, _, _, _, _ = f(st, hold)
    # same state, two actions: isolate the anomaly term exactly
    _, _, r_hold_in_sag, _, _ = f(st, hold)
    _, _, r_flag_in_sag, _, _ = f(st, flag)
    # true positive beats miss by exactly r_tp + r_fn
    assert float(r_flag_in_sag - r_hold_in_sag) == pytest.approx(
        float(cfg.r_anom_tp + cfg.r_anom_fn), abs=1e-5)


def test_false_alarm_penalized(cfg):
    st, _ = _fixed_sag_state(cfg)
    f = jax.jit(lambda s, a: core.step(cfg, s, a))
    st1, _, r_hold, _, _ = f(st, jnp.int32(0))      # nominal, no flag
    st2, _, r_flag, _, _ = f(st, jnp.int32(5))      # nominal, false alarm
    assert float(r_hold - r_flag) == pytest.approx(float(cfg.r_anom_fp),
                                                   abs=1e-5)


def test_miss_penalized_vs_baseline_env(cfg):
    """With detection off, rewards have no anomaly terms at all."""
    cfg_off = make_env_config("10", n_sub=40, horizon=200)
    st_on, _ = _fixed_sag_state(cfg)
    st_off, _ = _fixed_sag_state(cfg_off)
    st_off = replace(st_off, sched=st_on.sched)
    f_on = jax.jit(lambda s, a: core.step(cfg, s, a))
    f_off = jax.jit(lambda s, a: core.step(cfg_off, s, a))
    for _ in range(35):
        st_on, _, r_on, _, _ = f_on(st_on, jnp.int32(0))
        st_off, _, r_off, _, _ = f_off(st_off, jnp.int32(0))
    # both held (no flag) through the sag: detection-on pays the miss penalty
    assert float(r_off - r_on) == pytest.approx(float(cfg.r_anom_fn), abs=1e-5)


def test_config3_json_enables_detection():
    c3 = load_env_config("env_config3_lvrt", dtype=jnp.float32)
    assert c3.anomaly_detect is True


def test_gym_space_is_discrete_6():
    from pvderx.env.gym_adapter import PVDEREnv
    env = PVDEREnv(cfg=make_env_config("10", n_sub=40, anomaly_detect=True))
    assert env.action_space.n == core.N_ACTIONS_ANOM


def test_ppo_anomaly_head_width():
    """PPO over the anomaly env must expose all 6 actions (config 3) — the
    policy head width comes from env_api, not a hardcoded N_ACTIONS."""
    import numpy as np
    from pvderx.learn import PPOConfig, make_ppo

    cfg = make_env_config("10", n_sub=40, horizon=16, anomaly_detect=True)
    init_runner, train_step, net = make_ppo(
        cfg, PPOConfig(rollout_len=2, n_epochs=1, n_minibatch=2))
    runner = init_runner(jax.random.PRNGKey(0), 8)
    logits, _v = net.apply(runner.params, runner.obs)
    assert logits.shape == (8, 6)
    _runner2, metrics = jax.jit(train_step)(runner)
    assert np.isfinite(float(metrics["loss"]))
