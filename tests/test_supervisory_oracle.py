"""Independent supervisory oracle vs the env (SURVEY.md §2.4 / §3.2).

`oracle.supervisory_np` re-implements the ENTIRE supervisory layer (event
lookup, ride-through timers/latch/cessation, MPPT, Volt-VAR, action
application, obs/reward/termination) in plain numpy with ordinary control
flow and NO imports from pvderx.env or pvderx.scenario — closing the round-3
gap where `scipy_ref.run_episode` reused the env's own `_pre_window`/
`_post_window` and could not see a bug in the shared supervisory code.

With n_sub=120 (f64) the only remaining difference is integrator error:
measured ≤8.1e-9 obs / 1.4e-9 rewards over 8 random seeds on the default
scenario family, ≤1.9e-7 on a guaranteed-trip episode (the trip step and the
-100 penalty must land on the SAME control step in both implementations).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx.env import core
from pvderx.oracle import supervisory_np

TOL_OBS, TOL_REW = 1e-6, 1e-6   # >100x the measured integrator-error floor


def _compare_episode(cfg, seed, n_act=None):
    if n_act is None:
        n_act = core.N_ACTIONS_ANOM if cfg.anomaly_detect else core.N_ACTIONS
    step = jax.jit(lambda s, a: core.step(cfg, s, a))
    st, _ = core.reset(cfg, jax.random.PRNGKey(seed))
    if cfg.continuous:
        actions = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(seed + 1), (cfg.horizon, core.ACT_DIM_CONT),
            jnp.float64, minval=-1.2, maxval=1.2))  # beyond [-1,1]: clip path
    else:
        actions = np.asarray(jax.random.randint(
            jax.random.PRNGKey(seed + 1), (cfg.horizon,), 0, n_act))
    obs_o, rew_o, done_o = supervisory_np.run_episode_independent(
        cfg, st, actions)
    s = st
    obs_l, rew_l, done_l = [], [], []
    for a in actions:
        s, ob, r, d, _ = step(s, jnp.asarray(a))
        obs_l.append(np.asarray(ob))
        rew_l.append(float(r))
        done_l.append(bool(d))
        if done_l[-1]:
            break
    assert len(obs_l) == len(obs_o), (
        f"episode lengths differ: env={len(obs_l)} oracle={len(obs_o)}")
    np.testing.assert_allclose(np.stack(obs_l), obs_o, rtol=0, atol=TOL_OBS)
    np.testing.assert_allclose(np.asarray(rew_l), rew_o, rtol=0, atol=TOL_REW)
    np.testing.assert_array_equal(np.asarray(done_l), done_o)


@pytest.mark.parametrize("seed", range(8))
def test_independent_oracle_random_scenarios(seed):
    """8 random seeds of the default scenario family (sags, frequency
    excursions, clouds, load steps), full episodes."""
    cfg = core.make_env_config("10", dtype=jnp.float64, n_sub=120, horizon=60)
    _compare_episode(cfg, 100 + seed)


def test_independent_oracle_trip_episode():
    """A guaranteed deep sustained sag: the trip must latch on the SAME
    control step (timer semantics), with the r_trip penalty on that step and
    identical early termination."""
    scen = core.ScenarioConfig(
        p_sag=1.0, p_freq=0.0, sag_depth_lo=0.25, sag_depth_hi=0.35,
        sag_t_lo=0.2, sag_t_hi=0.3, sag_dur_lo=1.5, sag_dur_hi=2.0)
    cfg = core.make_env_config("10", dtype=jnp.float64, n_sub=120, horizon=90,
                               scen=scen)
    _compare_episode(cfg, 11)


@pytest.mark.parametrize("feature", ["voltvar", "mppt", "anomaly"])
def test_independent_oracle_features(feature):
    """Volt-VAR droop / MPPT P&O / anomaly-detection reward shaping, each
    recomputed independently."""
    kw = {"voltvar": dict(voltvar_enable=True),
          "mppt": dict(mppt_enable=True),
          "anomaly": dict(anomaly_detect=True)}[feature]
    cfg = core.make_env_config("10", dtype=jnp.float64, n_sub=120, horizon=60,
                               **kw)
    _compare_episode(cfg, 11)


def test_independent_oracle_three_phase():
    cfg = core.make_env_config("50", dtype=jnp.float64, n_sub=120, horizon=40)
    _compare_episode(cfg, 11)


def test_independent_oracle_unbalanced_sag():
    """Three-phase UNBALANCED sag (negative-sequence event columns v_g2/
    phi_g2 through the independent event lookup). Measured 3.0e-8 obs /
    1.4e-8 rewards."""
    scen = core.ScenarioConfig(
        p_sag=1.0, p_freq=0.0, p_unb=1.0, unb_frac=0.6,
        sag_depth_lo=0.5, sag_depth_hi=0.7,
        sag_t_lo=0.2, sag_t_hi=0.3, sag_dur_lo=0.2, sag_dur_hi=0.3)
    cfg = core.make_env_config("50", dtype=jnp.float64, n_sub=120, horizon=40,
                               scen=scen)
    _compare_episode(cfg, 17)


def test_independent_oracle_continuous_actions():
    """The continuous Box(2) extension: per-step deltas scaled by the (out-of
    -range, so clipped) action vector, recomputed independently."""
    cfg = core.make_env_config("10", dtype=jnp.float64, n_sub=120, horizon=40,
                               continuous=True)
    _compare_episode(cfg, 11)


def _compare_fleet_episode(fc, seed=5):
    from pvderx.env import fleet

    step = jax.jit(lambda s, a: fleet.step(fc, s, a))
    st, _ = fleet.reset(fc, jax.random.PRNGKey(seed))
    shape = ((fc.base.horizon, fc.m) if fc.per_unit
             else (fc.base.horizon,))
    actions = np.asarray(jax.random.randint(
        jax.random.PRNGKey(seed + 1), shape, 0, 5))
    obs_o, rew_o, done_o = supervisory_np.run_fleet_episode_independent(
        fc, st, actions)
    s = st
    obs_l, rew_l, done_l = [], [], []
    for a in actions:
        s, ob, r, d, _ = step(s, jnp.asarray(a))
        obs_l.append(np.asarray(ob))
        rew_l.append(float(r))
        done_l.append(bool(d))
        if done_l[-1]:
            break
    assert len(obs_l) == len(obs_o)
    np.testing.assert_allclose(np.stack(obs_l), obs_o, rtol=0, atol=TOL_OBS)
    np.testing.assert_allclose(np.asarray(rew_l), rew_o, rtol=0, atol=TOL_REW)
    np.testing.assert_array_equal(np.asarray(done_l), done_o)


def test_independent_oracle_fleet():
    """BASELINE config 5's supervisory layer (fleet-level action, per-unit
    ride-through on the common PCC voltage, aggregate obs, fleet-mean reward)
    recomputed independently; LSODA over the coupled [M*n_s] feeder system.
    Measured ≤8.4e-9 obs / 1.1e-9 reward at n_sub=120 f64 (M=4)."""
    from pvderx.env.fleet import make_fleet_config

    fc = make_fleet_config("10", m=4, dtype=jnp.float64, n_sub=120,
                           horizon=40)
    _compare_fleet_episode(fc)


def test_independent_oracle_fleet_per_unit():
    """Per-unit fleet mode (round 5): [M] actions steering each inverter
    separately + the per-unit [Vdc|P|Q|conn] obs block, recomputed by the
    independent oracle — the units genuinely diverge (different setpoint
    trajectories) and the obs block must track each one."""
    from pvderx.env.fleet import fleet_obs_dim, make_fleet_config

    fc = make_fleet_config("10", m=4, dtype=jnp.float64, n_sub=120,
                           horizon=40, per_unit=True)
    assert fleet_obs_dim(fc) == 13 + 16
    _compare_fleet_episode(fc)


@pytest.mark.parametrize("feature", ["s_jitter", "voltvar", "mppt"])
def test_independent_oracle_fleet_features(feature):
    """Per-unit insolation spread (partial clouding), common Volt-VAR
    setpoint, and per-unit MPPT — each ≤8.5e-9 measured."""
    from pvderx.env.fleet import make_fleet_config

    kw = {"s_jitter": dict(scen=core.ScenarioConfig(fleet_s_jitter=0.3)),
          "voltvar": dict(voltvar_enable=True),
          "mppt": dict(mppt_enable=True)}[feature]
    fc = make_fleet_config("10", m=4, dtype=jnp.float64, n_sub=120,
                           horizon=30, **kw)
    _compare_fleet_episode(fc)


def test_independent_oracle_shares_no_env_code():
    """The independence guarantee itself: the oracle module must not import
    pvderx.env or pvderx.scenario (directly or at module scope)."""
    import ast
    import inspect

    src = inspect.getsource(supervisory_np)
    for node in ast.walk(ast.parse(src)):
        names = []
        if isinstance(node, ast.Import):
            names = [a.name for a in node.names]
        elif isinstance(node, ast.ImportFrom) and node.module:
            names = [node.module]
        for nm in names:
            assert not nm.startswith(("pvderx.env", "pvderx.scenario")), (
                f"supervisory oracle imports env/scenario code: {nm}")
