"""DQN learner tests (reference-demo parity: upstream notebooks train DQN,
SURVEY.md §2.1 #13)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx.env import core, make_env_config
from pvderx.learn import DQNConfig, make_dqn


@pytest.fixture(scope="module")
def cfg():
    return make_env_config("10", horizon=20, n_sub=40)


def test_continuous_config_rejects_dqn(cfg):
    with pytest.raises(ValueError):
        make_dqn(make_env_config("10", n_sub=40, continuous=True), DQNConfig())


def test_dqn_train_step_runs_and_is_deterministic(cfg):
    dqn = DQNConfig(rollout_len=4, n_updates=2, batch_size=32, capacity=1024)
    init_runner, train_step, _ = make_dqn(cfg, dqn)
    ts = jax.jit(train_step)

    outs = []
    for _ in range(2):
        runner = init_runner(jax.random.PRNGKey(0), 8)
        for _ in range(3):
            runner, metrics = ts(runner)
        outs.append((np.asarray(runner.obs), float(metrics["loss"]),
                     float(metrics["epsilon"]), int(metrics["buffer_size"])))
    assert np.array_equal(outs[0][0], outs[1][0])      # bitwise reproducible
    assert outs[0][1] == outs[1][1]
    assert outs[0][3] == 3 * 4 * 8                     # buffer filled as expected
    assert np.isfinite(outs[0][1])
    # epsilon annealed from eps_start after 2 completed updates
    expect_eps = dqn.eps_start + (2 / dqn.eps_decay_updates) * (
        dqn.eps_end - dqn.eps_start)
    assert outs[0][2] == pytest.approx(expect_eps, abs=1e-6)


def test_dqn_target_sync_is_periodic(cfg):
    dqn = DQNConfig(rollout_len=2, n_updates=1, batch_size=16, capacity=256,
                    target_every=2)
    init_runner, train_step, _ = make_dqn(cfg, dqn)
    runner = init_runner(jax.random.PRNGKey(0), 4)
    ts = jax.jit(train_step)
    runner, _ = ts(runner)   # update_i -> 1: no sync (1 % 2 != 0)
    leaves_p = jax.tree.leaves(runner.params)
    leaves_t = jax.tree.leaves(runner.params_tgt)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_p, leaves_t))
    runner, _ = ts(runner)   # update_i -> 2: hard sync
    for a, b in zip(jax.tree.leaves(runner.params),
                    jax.tree.leaves(runner.params_tgt)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_dqn_anomaly_head_width():
    cfg = make_env_config("10", horizon=20, n_sub=40, anomaly_detect=True)
    init_runner, _, net = make_dqn(cfg, DQNConfig(capacity=128))
    runner = init_runner(jax.random.PRNGKey(0), 4)
    q = net.apply(runner.params, runner.obs)
    assert q.shape == (4, core.N_ACTIONS_ANOM)


def test_dqn_updates_params_and_stays_finite(cfg):
    dqn = DQNConfig(rollout_len=4, n_updates=8, batch_size=64, capacity=2048,
                    lr=1e-3)
    init_runner, train_step, _ = make_dqn(cfg, dqn)
    runner = init_runner(jax.random.PRNGKey(2), 16)
    p0 = jax.tree.map(np.asarray, runner.params)
    ts = jax.jit(train_step)
    for _ in range(6):
        runner, metrics = ts(runner)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["q_mean"]))
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(a, np.asarray(b)), p0, runner.params)
    assert all(jax.tree.leaves(changed))


def test_packed_replay_roundtrip_and_wrap():
    """Direct unit test of the shared packed buffer (pvderx/learn/replay.py):
    packed rows come back bitwise on sample; circular writes wrap."""
    import numpy as np

    from pvderx.learn.replay import insert_rows, make_replay, sample_rows

    rp = make_replay(8, 5, jnp.float32)
    rows1 = jnp.arange(30, dtype=jnp.float32).reshape(6, 5)
    rp = insert_rows(rp, rows1)
    assert int(rp.ptr) == 6 and int(rp.size) == 6
    # sample with size=6: indices in [0, 6); gathered rows must be the
    # inserted rows bitwise
    got = np.asarray(sample_rows(rp, jax.random.PRNGKey(0), 16))
    assert all(any(np.array_equal(g, r) for r in np.asarray(rows1))
               for g in got)
    # wrap: 4 more rows overwrite slots 6,7,0,1
    rows2 = 100.0 + jnp.arange(20, dtype=jnp.float32).reshape(4, 5)
    rp = insert_rows(rp, rows2)
    assert int(rp.ptr) == 2 and int(rp.size) == 8
    data = np.asarray(rp.data)
    assert np.array_equal(data[6], np.asarray(rows2)[0])
    assert np.array_equal(data[0], np.asarray(rows2)[2])
    assert np.array_equal(data[2], np.asarray(rows1)[2])  # untouched slot
