"""Fleet (multi-DER shared feeder) tests — BASELINE config 5, SPEC.md §11."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from pvderx.env import fleet
from pvderx.env.fleet import make_fleet_config, reset, step, step_autoreset
from pvderx.ode import rk4_window
from pvderx.params import make_params, nominal_exog
from pvderx.physics import fleet as fl

M = 4  # small fleet for test speed; env code is M-generic


@pytest.fixture(scope="module")
def fleet_np():
    p = make_params("10")
    u = nominal_exog()
    return fl.fleetify(p, M, np), fl.fleetify(u, M, np)


def test_fleet_rhs_jax_matches_numpy(fleet_np):
    fp, fu = fleet_np
    fpj = jax.tree.map(lambda l: jnp.asarray(l, jnp.float64), fp)
    fuj = jax.tree.map(lambda l: jnp.asarray(l, jnp.float64), fu)
    rng = np.random.default_rng(1)
    guess = fl.fleet_guess(fp, fu, np)
    y = guess + 0.02 * rng.standard_normal(guess.shape)
    r_np = fl.fleet_rhs(y, 0.3, fp, fu, np)
    r_jx = fl.fleet_rhs(jnp.asarray(y), jnp.float64(0.3), fpj, fuj, jnp)
    np.testing.assert_allclose(np.asarray(r_jx), r_np, rtol=0, atol=1e-12)


def test_fleet_rk4_matches_lsoda(fleet_np):
    """Coupled-fleet trajectory: fixed-step RK4 vs LSODA ≤1e-6 (f64)."""
    fp, fu = fleet_np
    fpj = jax.tree.map(lambda l: jnp.asarray(l, jnp.float64), fp)
    fuj = jax.tree.map(lambda l: jnp.asarray(l, jnp.float64), fu)
    fc = make_fleet_config("10", m=M, dtype=jnp.float64)
    st, _ = jax.jit(lambda k: reset(fc, k))(jax.random.PRNGKey(0))
    y0 = np.asarray(st.y).reshape(-1).astype(np.float64)

    win = jax.jit(lambda y, t0: rk4_window(
        lambda yy, tt: fl.fleet_rhs(yy.reshape(M, -1), tt, fpj, fuj, jnp
                                    ).reshape(-1), y, t0, 1.0 / 60, 120))
    rhs_flat = lambda t, yf: fl.fleet_rhs(
        yf.reshape(M, -1), t, fp, fu, np).reshape(-1)
    yj, yo = jnp.asarray(y0), y0.copy()
    for k in range(18):
        yj = win(yj, jnp.float64(k / 60))
        sol = solve_ivp(rhs_flat, (k / 60, (k + 1) / 60), yo,
                        method="LSODA", rtol=1e-10, atol=1e-10)
        yo = sol.y[:, -1]
    assert np.max(np.abs(np.asarray(yj) - yo)) < 1e-6


def test_fleet_env_steps_and_aggregates():
    fc = make_fleet_config("10", m=M)
    st, obs = jax.jit(lambda k: reset(fc, k))(jax.random.PRNGKey(0))
    assert obs.shape == (13,)
    assert st.y.shape == (M, 11)
    f = jax.jit(lambda s, a: step(fc, s, a))
    s = st
    for _ in range(10):
        s, o, r, d, i = f(s, jnp.int32(1))  # Q+ for the whole fleet
    assert float(s.q_ref[0]) == pytest.approx(0.1, abs=1e-6)
    assert np.all(np.asarray(s.q_ref) == np.asarray(s.q_ref)[0])
    assert np.isfinite(float(r))
    assert float(i["tripped_frac"]) == 0.0


def test_fleet_unit_trip_is_partial():
    """One unit tripping must not terminate the fleet episode; the coupled
    PCC keeps serving from remaining units."""
    fc = make_fleet_config("10", m=M)
    st, _ = jax.jit(lambda k: reset(fc, k))(jax.random.PRNGKey(0))
    # force unit 0 tripped
    rt = st.rt
    tripped = rt.tripped.at[0].set(1.0)
    from pvderx._pytree import replace
    st = replace(st, rt=replace(rt, tripped=tripped))
    f = jax.jit(lambda s, a: step(fc, s, a))
    s, o, r, d, i = f(st, jnp.int32(0))
    assert float(i["tripped_frac"]) == pytest.approx(1 / M)
    assert not bool(d)
    # remaining units pick up: aggregate P > 0
    assert float(i["p_pcc"]) > 0.2


def test_fleet_vmap_batch():
    fc = make_fleet_config("10", m=M, horizon=10)
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    stb, obsb = jax.jit(jax.vmap(lambda k: reset(fc, k)))(keys)
    sb = jax.jit(jax.vmap(lambda s, a: step_autoreset(fc, s, a)))
    stb, obsb, r, d, i = sb(stb, jnp.zeros((3,), jnp.int32))
    assert obsb.shape == (3, 13)
    assert np.all(np.isfinite(np.asarray(r)))


def test_fleet_batch_pallas_matches_scan():
    """Fused rank-4 fleet window kernel == vmapped scan path (interpret on CPU)."""
    import numpy as np
    from pvderx.env.fleet import make_fleet_batch_fns, make_fleet_config

    fc = make_fleet_config("10", m=4, n_sub=40, horizon=50, dtype=jnp.float32)
    n = 128
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    outs = {}
    for window in ("scan", "pallas"):
        rb, sb = make_fleet_batch_fns(fc, window=window, donate=False, block=128)
        st, obs = rb(keys)
        acts = jnp.arange(n, dtype=jnp.int32) % 5
        for _ in range(3):
            st, obs, rew, done, info = sb(st, acts)
        outs[window] = (np.asarray(obs), np.asarray(rew), np.asarray(st.y))
    for a, b in zip(outs["scan"], outs["pallas"]):
        assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_fleet_batch_pallas_matches_scan_three_phase_unbalanced():
    """Rank-4 fleet kernel with n_ph=3 and an unbalanced sag scheduled."""
    import numpy as np
    from pvderx.env import core
    from pvderx.env.fleet import make_fleet_batch_fns, make_fleet_config

    fc = make_fleet_config(
        "50", m=2, n_sub=40, horizon=50, dtype=jnp.float32,
        scen=core.ScenarioConfig(p_sag=1.0, p_unb=1.0, p_freq=0.0,
                                 p_cloud=0.0, p_load=0.0, sag_t_lo=0.05,
                                 sag_t_hi=0.1, sag_dur_lo=1.0, sag_dur_hi=1.5))
    n = 128
    keys = jax.random.split(jax.random.PRNGKey(9), n)
    outs = {}
    for window in ("scan", "pallas"):
        rb, sb = make_fleet_batch_fns(fc, window=window, donate=False, block=128)
        st, obs = rb(keys)
        assert float(jnp.max(st.sched.grid[:, 1, 4])) > 0.0  # unbalance scheduled
        acts = jnp.zeros((n,), jnp.int32)
        for _ in range(8):   # steps past the sag onset (t ~ 0.05-0.1 s)
            st, obs, rew, done, info = sb(st, acts)
        outs[window] = (np.asarray(obs), np.asarray(st.y))
    for a, b in zip(outs["scan"], outs["pallas"]):
        assert np.isfinite(a).all()
        assert np.allclose(a, b, atol=2e-5), np.abs(a - b).max()


def test_fleet_ppo_train_step():
    """BASELINE config 5 pairs the fleet env with the PPO learner: a full
    train_step over a FleetConfig (via pvderx.learn.env_api) runs, produces a
    finite loss, and steps the fleet batch."""
    from pvderx.learn import PPOConfig, make_ppo

    fc = make_fleet_config("10", m=M, n_sub=40, horizon=16)
    ppo = PPOConfig(rollout_len=2, n_epochs=1, n_minibatch=2)
    init_runner, train_step, _ = make_ppo(fc, ppo)
    runner = init_runner(jax.random.PRNGKey(0), 8)
    assert runner.env_state.y.shape == (8, M, 11)
    runner2, metrics = jax.jit(train_step)(runner)
    assert np.isfinite(float(metrics["loss"]))
    assert int(runner2.env_state.t_step.sum()) > 0


def test_fleet_dqn_train_step():
    """DQN over the fleet backend (same env_api dispatch)."""
    from pvderx.learn import DQNConfig, make_dqn

    fc = make_fleet_config("10", m=M, n_sub=40, horizon=16)
    dqn = DQNConfig(rollout_len=2, n_updates=1, capacity=256, batch_size=32)
    init_runner, train_step, _ = make_dqn(fc, dqn)
    runner = init_runner(jax.random.PRNGKey(0), 8)
    runner2, metrics = jax.jit(train_step)(runner)
    assert np.isfinite(float(metrics["loss"]))
    assert int(runner2.replay.size) == 16  # 2 steps x 8 envs inserted


def test_fleet_insolation_jitter_spreads_units():
    """scen.fleet_s_jitter gives each unit its own insolation (partial
    clouding): per-unit PV powers differ, the aggregate env still steps, and
    the per-unit spread is bounded by the configured jitter."""
    from pvderx.env.core import ScenarioConfig

    fc = make_fleet_config("10", m=M, n_sub=40, horizon=16,
                           scen=ScenarioConfig(fleet_s_jitter=0.3,
                                               p_sag=0.0, p_cloud=0.0,
                                               p_load=0.0, p_freq=0.0))
    st, obs = reset(fc, jax.random.PRNGKey(2))
    s = np.asarray(st.s_scale)
    assert s.std() > 0.01 and np.all((s <= 1.0 + 1e-6) & (s >= 0.7 - 1e-6))
    # distinct insolation -> distinct per-unit steady-state currents
    i_mag = np.hypot(np.asarray(st.y[:, 0]), np.asarray(st.y[:, 1]))
    assert i_mag.std() > 1e-3
    st1, obs1, r, d, info = step(fc, st, 0)
    assert np.isfinite(float(info["p_pv"]))
    assert np.all(np.isfinite(np.asarray(st1.y)))


def test_fleet_jitter_pallas_matches_scan():
    """Per-unit insolation flows through the fused fleet kernel identically
    to the scan path."""
    from pvderx.env.core import ScenarioConfig
    from pvderx.env.fleet import make_fleet_batch_fns

    fc = make_fleet_config("10", m=M, n_sub=40, horizon=16,
                           scen=ScenarioConfig(fleet_s_jitter=0.25))
    n = 128
    keys = jax.random.split(jax.random.PRNGKey(4), n)
    rb_p, sb_p = make_fleet_batch_fns(fc, donate=False, window="pallas",
                                      block=128)
    rb_s, sb_s = make_fleet_batch_fns(fc, donate=False, window="scan")
    st, obs = rb_p(keys)
    acts = jnp.zeros((n,), jnp.int32)
    _, obs_p, r_p, d_p, _ = sb_p(st, acts)
    _, obs_s, r_s, d_s, _ = sb_s(st, acts)
    np.testing.assert_allclose(np.asarray(obs_p), np.asarray(obs_s),
                               rtol=0, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_s))


def test_fleet_per_unit_obs_and_divergence():
    """Per-unit mode (round 5): [M] actions steer each inverter separately —
    a unit told Vdc+ (action 3) must raise its Vdc setpoint/state while a
    unit told Vdc- (action 4) lowers it, visible in the per-unit obs block
    [13 shared | M Vdc | M P | M Q | M conn]."""
    from pvderx.env.fleet import fleet_obs_dim

    m = 2   # two units suffice to show divergence (fast-gate budget)
    fc = make_fleet_config("10", m=m, n_sub=40, horizon=60, per_unit=True)
    assert fleet_obs_dim(fc) == 13 + 4 * m
    st, obs = fleet.reset(fc, jax.random.PRNGKey(3))
    assert obs.shape == (13 + 4 * m,)
    # the shared 13-dim head matches the aggregate layout bit-for-bit
    np.testing.assert_array_equal(
        np.asarray(obs[:13]),
        np.asarray(fleet.reset(make_fleet_config("10", m=m, n_sub=40,
                                                 horizon=60),
                               jax.random.PRNGKey(3))[1]))
    step = jax.jit(lambda s, a: fleet.step(fc, s, a))
    acts = jnp.asarray([3, 4], jnp.int32)         # unit0 Vdc+, unit1 Vdc-
    for _ in range(12):
        st, obs, r, d, info = step(st, acts)
    vdc_blk = np.asarray(obs[13:13 + m])
    assert st.vdc_ref[0] > st.vdc_ref[1] + 0.05   # setpoints diverged
    assert vdc_blk[0] > vdc_blk[1] + 0.02         # physical Vdc followed
    assert np.allclose(np.asarray(obs[13 + 3 * m:]), 1.0)  # all connected


def test_fleet_per_unit_batch_pallas_matches_scan():
    """Per-unit actions through the batched path: the fused fleet kernel and
    the scan path agree (same physics; actions [N, M])."""
    fc = make_fleet_config("10", m=4, n_sub=40, horizon=30, per_unit=True)
    n = 128
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    reset_b = jax.jit(jax.vmap(lambda k: fleet.reset(fc, k)))
    st, obs = reset_b(keys)
    acts = jax.random.randint(jax.random.PRNGKey(1), (n, 4), 0, 5)
    o_p = fleet._step_batch_impl(fc, st, acts, window="pallas", block=n,
                                 autoreset=True)
    o_s = fleet._step_batch_impl(fc, st, acts, window="scan", block=n,
                                 autoreset=True)
    for a, b in zip(jax.tree.leaves(o_p[:4]), jax.tree.leaves(o_s[:4])):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64), atol=5e-5)


def test_fleet_per_unit_ppo_train_step():
    """The factored PPO head (one Discrete(5) per unit, joint logp = per-unit
    sum) trains over the per-unit fleet env; DQN/SAC refuse loudly."""
    from pvderx.learn import DQNConfig, PPOConfig, make_dqn, make_ppo

    fc = make_fleet_config("10", m=4, n_sub=40, horizon=16, per_unit=True)
    ppo = PPOConfig(rollout_len=2, n_epochs=1, n_minibatch=2)
    init_runner, train_step, _ = make_ppo(fc, ppo, hidden=(32, 32))
    runner = init_runner(jax.random.PRNGKey(0), 8)
    assert runner.obs.shape == (8, 29)
    runner2, metrics = jax.jit(train_step)(runner)
    assert np.isfinite(float(metrics["loss"]))
    assert int(runner2.env_state.t_step.sum()) > 0
    with pytest.raises(ValueError, match="PPO-only"):
        make_dqn(fc, DQNConfig())
