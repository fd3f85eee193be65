"""Model-variant + implicit-integrator tests (SURVEY.md §2.1 #7, §2.2).

Covers the constant-Vdc three-phase variant (reference analog:
`[pvder:pvder/DER_components_three_phase_constant_Vdc.py]`, selected by type
string via `[pvder:pvder/DER_wrapper.py]` — unverified upstream paths) and
the A-stable implicit integrators that replace the reference's stiff
scipy.integrate.ode/BDF path.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx import DER_MODEL_TYPES, make_der, nominal_exog, physics
from pvderx.ode import (
    backward_euler_window, newton_solve, rk4_window, trapezoid_window)
from pvderx.oracle import scipy_ref

DT = 1.0 / 60.0


def _steady(p, u):
    pj = p.astype(jnp.float64)
    uj = u.astype(jnp.float64)
    y0, res = newton_solve(
        lambda y: physics.rhs(y, jnp.float64(0.0), pj, uj),
        physics.steady_state_guess(pj, uj))
    return pj, uj, y0, float(res)


def test_wrapper_type_strings():
    for t in DER_MODEL_TYPES:
        p = make_der(t)
        assert p.n_states in (11, 23)
    assert make_der("SolarPVDERThreePhaseConstantVdc").const_vdc == 1.0
    assert make_der("SolarPVDERThreePhase").const_vdc == 0.0
    assert make_der("SolarPVDERThreePhaseConstantVdc", preset="250").s_rated == 250e3
    with pytest.raises(KeyError):
        make_der("NoSuchModel")


def test_const_vdc_steady_state_tracks_p_ref():
    p = make_der("SolarPVDERThreePhaseConstantVdc")
    u = nominal_exog(p_ref=0.8, q_ref=0.1)
    pj, uj, y0, res = _steady(p, u)
    assert res < 1e-9
    g = physics.algebra(y0, jnp.float64(0.0), pj, uj)
    assert abs(float(g.p_pcc) - 0.8) < 1e-8
    assert abs(float(g.q_pcc) - 0.1) < 1e-8
    assert abs(float(y0[18]) - 1.0) < 1e-10      # Vdc pinned at vdc_ref


def test_const_vdc_trajectory_vs_oracle():
    """Eventful trajectory (p_ref step + deep sag): RK4 matches LSODA <=1e-6
    at the default n_sub=120 (SPEC.md §6 gate, const-Vdc variant).

    Measured post-recovery: the const-Vdc d-loop feeds back the *power*
    measurement, which jumps discontinuously at sag entry, so the fixed-step
    error transiently peaks ~1e-4 in the P-integrator state at the event edge
    and decays within ~0.5 s (the standard model's Vdc feedback is a state,
    hence continuous, and shows no such spike)."""
    p = make_der("SolarPVDERThreePhaseConstantVdc")
    u = nominal_exog(p_ref=0.8, q_ref=0.1)
    pj, uj, y0, _ = _steady(p, u)
    u2 = dataclasses.replace(uj, p_ref=jnp.float64(0.5))
    u3 = dataclasses.replace(u2, v_g=jnp.float64(0.6))
    win = jax.jit(lambda y, t0, uu: rk4_window(
        lambda yy, tt: physics.rhs(yy, tt, pj, uu), y, t0, DT, 120))
    y = y0
    y_or = np.asarray(y0)
    for k in range(120):
        uu = uj if k < 30 else (u3 if 45 <= k < 70 else u2)
        y = win(y, k * DT, uu)
        y_or = scipy_ref.integrate_window(
            y_or, k * DT, DT, p, jax.tree.map(float, uu), atol=1e-12)
    assert float(np.max(np.abs(np.asarray(y) - y_or))) < 1e-6
    # active power tracked the new setpoint through the sag
    g = physics.algebra(y, jnp.float64(120 * DT), pj, u2)
    assert abs(float(g.p_pcc) - 0.5) < 0.01


@pytest.mark.parametrize("window,n_sub,tol", [
    (trapezoid_window, 10, 5e-6),
    (trapezoid_window, 20, 1e-6),
    (backward_euler_window, 40, 5e-5),
])
def test_implicit_integrators_vs_oracle(window, n_sub, tol):
    """A-stable steppers at far-sub-RK4 substep counts (SURVEY.md §2.2: the
    TPU-native stiff path replacing scipy.integrate.ode/BDF)."""
    from pvderx import make_params
    p = make_params("10")
    u = nominal_exog()
    pj, uj, y0, _ = _steady(p, u)
    u_sag = dataclasses.replace(uj, v_g=jnp.float64(0.5))
    win = jax.jit(lambda y, t0, uu: window(
        lambda yy, tt: physics.rhs(yy, tt, pj, uu), y, t0, DT, n_sub))
    y = y0
    y_or = np.asarray(y0)
    for k in range(90):
        uu = u_sag if 30 <= k < 60 else uj
        y = win(y, k * DT, uu)
        y_or = scipy_ref.integrate_window(
            y_or, k * DT, DT, p, jax.tree.map(float, uu))
    err = float(np.max(np.abs(np.asarray(y) - y_or)))
    assert np.isfinite(err) and err < tol, err


def test_trapezoid_stable_where_rk4_explodes():
    """A-stability: at n_sub=5 (h·|λ|max ≈ 21) RK4 diverges, trapezoid holds."""
    from pvderx import make_params
    p = make_params("10")
    u = nominal_exog()
    pj, uj, y0, _ = _steady(p, u)
    f = lambda yy, tt: physics.rhs(yy, tt, pj, uj)
    y_rk = jax.jit(lambda y: rk4_window(f, y, 0.0, DT, 5))(y0 * 1.001)
    y_tr = jax.jit(lambda y: trapezoid_window(f, y, 0.0, DT, 5))(y0 * 1.001)
    assert not bool(jnp.all(jnp.abs(y_rk) < 1e3))      # RK4 blew up
    assert bool(jnp.all(jnp.abs(y_tr - y0) < 1.0))     # trapezoid stayed put


# ---------------------------------------------------------------------------
# integrator selection through the ENV surface (SURVEY.md §2.2 rows 1-2: one
# integrator abstraction with selectable scheme, as a product knob — not just
# a library function)
# ---------------------------------------------------------------------------
def _sag_cfg(integ, n_sub, horizon=60):
    from pvderx.env import core
    return core.make_env_config(
        "10", dtype=jnp.float64, n_sub=n_sub, horizon=horizon,
        integrator=integ,
        scen=core.ScenarioConfig(
            p_sag=1.0, p_freq=0.0, sag_depth_lo=0.5, sag_depth_hi=0.5,
            sag_t_lo=0.3, sag_t_hi=0.3, sag_dur_lo=0.3, sag_dur_hi=0.3))


def test_env_config_integrator_validation():
    from pvderx.env import core
    with pytest.raises(ValueError, match="integrator="):
        core.make_env_config("10", integrator="dopri5")
    with pytest.raises(ValueError, match="stability bound"):
        core.make_env_config("10", n_sub=8)              # rk4 default
    cfg = core.make_env_config("10", n_sub=8, integrator="trapezoid")
    assert cfg.integrator == "trapezoid" and cfg.n_sub == 8
    # the fused kernel is RK4-only: forcing it with an implicit scheme raises
    from pvderx.env.vector import make_batch_fns
    rb, sb = make_batch_fns(cfg, donate=False, window="pallas", block=128)
    st, obs = rb(jax.random.split(jax.random.PRNGKey(0), 128))
    with pytest.raises(ValueError, match="rk4"):
        sb(st, jnp.zeros((128,), jnp.int32))


@pytest.mark.parametrize("integ,n_sub,tol_obs,tol_rew", [
    ("trapezoid", 16, 2e-2, 5e-3),
    ("backward_euler", 16, 5e-2, 2e-2),
])
def test_env_integrator_vs_oracle(integ, n_sub, tol_obs, tol_rew):
    """Full fixed-seed env episode with an implicit window scheme at n_sub
    well below RK4's stability bound (40), pinned against the LSODA oracle
    twin (oracle substitutes only the integrator): the stiffness-margin
    option works END-TO-END through `core.step`, not just at the window
    level. Measured: trapezoid@16 tracks obs to 3.3e-3 / rewards to 8.9e-4;
    backward_euler@16 to 1.1e-2 / 3.7e-3 (f64, sag scenario)."""
    from pvderx.env import core
    cfg = _sag_cfg(integ, n_sub)
    st, _ = core.reset(cfg, jax.random.PRNGKey(3))
    actions = np.asarray(jax.random.randint(jax.random.PRNGKey(4),
                                            (cfg.horizon,), 0, 5))
    obs_o, rew_o, done_o = scipy_ref.run_episode(cfg, st, actions)
    step = jax.jit(lambda s, a: core.step(cfg, s, a))
    obs_l, rew_l = [], []
    s = st
    for a in actions[:len(rew_o)]:
        s, ob, r, d, _ = step(s, jnp.asarray(a))
        obs_l.append(np.asarray(ob))
        rew_l.append(float(r))
        if bool(d):
            break
    n = min(len(obs_l), len(obs_o))
    assert n == len(obs_o)  # same episode length as the oracle
    assert np.abs(np.stack(obs_l)[:n] - obs_o[:n]).max() < tol_obs
    assert np.abs(np.asarray(rew_l)[:n] - rew_o[:n]).max() < tol_rew


def test_dynamic_simulation_integrator_knob():
    """The standalone-sim surface takes the same knob (SURVEY §2.1 #3)."""
    from pvderx.scenario.events import EventBuilder
    from pvderx.sim import DynamicSimulation

    ev = EventBuilder()
    ev.add_grid_event(0.3, 0.6)
    ev.add_grid_event(0.6, 1.0)
    sims = {}
    for integ, n_sub in [("trapezoid", 16), ("rk4", 72)]:
        sim = DynamicSimulation("10", events=ev, tStop=1.0, n_sub=n_sub,
                                integrator=integ)
        series = sim.run_simulation()
        assert np.isfinite(series["vdc"]).all()
        sims[integ] = series
    # both schemes resolve the same physics (trapezoid@16 is 2nd-order)
    assert np.abs(sims["trapezoid"]["vdc"] - sims["rk4"]["vdc"]).max() < 2e-2
