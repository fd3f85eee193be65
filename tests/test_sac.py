"""SAC learner + continuous-action env tests (SURVEY.md §7 learn/sac.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx.env import core, make_env_config
from pvderx.learn import SACConfig, make_sac


@pytest.fixture(scope="module")
def cfg():
    return make_env_config("10", horizon=20, n_sub=40, continuous=True)


def test_continuous_step_moves_setpoints(cfg):
    st, obs = core.reset(cfg, jax.random.PRNGKey(0))
    f = jax.jit(lambda s, a: core.step(cfg, s, a))
    s1, *_ = f(st, jnp.asarray([1.0, -1.0], jnp.float32))
    assert float(s1.q_ref) == pytest.approx(float(st.q_ref) + cfg.dq_action, abs=1e-6)
    assert float(s1.vdc_ref) == pytest.approx(float(st.vdc_ref) - cfg.dv_action, abs=1e-6)
    # out-of-range actions are clipped to [-1, 1]
    s2, *_ = f(st, jnp.asarray([100.0, 0.0], jnp.float32))
    assert float(s2.q_ref) == pytest.approx(float(s1.q_ref), abs=1e-6)


def test_discrete_config_rejects_sac(cfg):
    with pytest.raises(ValueError):
        make_sac(make_env_config("10", n_sub=40), SACConfig())


def test_sac_train_step_runs_and_is_deterministic(cfg):
    sac = SACConfig(rollout_len=4, n_updates=2, batch_size=32, capacity=1024)
    init_runner, train_step, _ = make_sac(cfg, sac)
    ts = jax.jit(train_step)

    outs = []
    for _ in range(2):
        runner = init_runner(jax.random.PRNGKey(0), 8)
        for _ in range(3):
            runner, metrics = ts(runner)
        outs.append((np.asarray(runner.obs),
                     float(metrics["critic_loss"]), float(metrics["alpha"]),
                     int(metrics["buffer_size"])))
    assert np.array_equal(outs[0][0], outs[1][0])      # bitwise reproducible
    assert outs[0][1] == outs[1][1]
    assert outs[0][3] == 3 * 4 * 8                      # buffer filled as expected
    assert np.isfinite(outs[0][1]) and np.isfinite(outs[0][2])


def test_replay_wraps_circularly(cfg):
    sac = SACConfig(rollout_len=4, n_updates=1, batch_size=16, capacity=64)
    init_runner, train_step, _ = make_sac(cfg, sac)
    runner = init_runner(jax.random.PRNGKey(1), 8)
    ts = jax.jit(train_step)
    for _ in range(4):                                  # 4*4*8 = 128 > 64
        runner, metrics = ts(runner)
    assert int(metrics["buffer_size"]) == 64
    assert int(runner.replay.ptr) == 128 % 64
