"""Unit tests for the physics core (SURVEY.md §4 build plan, gates 1-2)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx import physics
from pvderx.ode import newton_solve
from pvderx.oracle import scipy_ref
from pvderx.params import make_params, nominal_exog
from pvderx.physics import rhs_core


@pytest.mark.parametrize("preset", ["10", "50", "250"])
def test_rhs_jax_matches_numpy(preset):
    """The JAX RHS and the oracle RHS are the same function (shared core)."""
    p = make_params(preset)
    u = nominal_exog()
    rng = np.random.default_rng(42)
    ss = scipy_ref.steady_state(p, u)
    pj, uj = p.astype(jnp.float64), u.astype(jnp.float64)
    for _ in range(5):
        y = ss + 0.05 * rng.standard_normal(ss.shape)
        t = float(rng.uniform(0, 10))
        r_np = scipy_ref.rhs_np(y, t, p, u)
        r_jx = np.asarray(physics.rhs(jnp.asarray(y), jnp.float64(t), pj, uj))
        np.testing.assert_allclose(r_jx, r_np, rtol=0, atol=1e-12)


def test_pv_power_curve():
    """Diode model sanity: peak near Vdc=1.0 pu, zero at/above open circuit."""
    p = make_params("10")
    pp = lambda v: rhs_core.pv_power(v, 1000.0, 298.15, p, np)
    assert 0.9 < pp(1.0) < 1.0
    assert pp(1.0) > pp(0.8)
    assert pp(1.0) > pp(1.1)
    assert pp(1.2) == 0.0
    # insolation scaling is ~linear at fixed voltage (well below Voc)
    assert abs(rhs_core.pv_power(0.9, 500.0, 298.15, p, np) / rhs_core.pv_power(0.9, 1000.0, 298.15, p, np) - 0.5) < 0.05


@pytest.mark.parametrize("preset", ["10", "50"])
def test_steady_state_init(preset):
    """Newton (JAX) and fsolve (oracle) find the same equilibrium (SPEC §7)."""
    p = make_params(preset)
    u = nominal_exog()
    ss = scipy_ref.steady_state(p, u)
    assert np.max(np.abs(scipy_ref.rhs_np(ss, 0.0, p, u))) < 1e-9

    pj, uj = p.astype(jnp.float64), u.astype(jnp.float64)
    f = lambda y: physics.rhs(y, jnp.float64(0.0), pj, uj)
    y_j, res = newton_solve(f, physics.steady_state_guess(pj, uj))
    assert float(res) < 1e-9
    np.testing.assert_allclose(np.asarray(y_j), ss, rtol=0, atol=1e-8)

    # physical sanity at equilibrium
    g = rhs_core.algebra(ss, 0.0, p, u, np)
    assert abs(ss[6 * p.n_ph] - 1.0) < 1e-6          # Vdc == Vdc_ref
    assert abs(g.q_pcc) < 1e-6                       # Q tracks Q_ref = 0
    assert 0.8 < g.p_pcc < 1.0                       # exports near-MPP power
    assert np.all(np.abs(np.hypot(g.m.re, g.m.im)) < 1.0)


def test_steady_state_is_stable_equilibrium():
    """All Jacobian eigenvalues strictly in the left half plane; RK4 step
    h=dt/120 is comfortably inside the stability region (SPEC §6)."""
    p = make_params("10")
    u = nominal_exog()
    ss = scipy_ref.steady_state(p, u)
    pj, uj = p.astype(jnp.float64), u.astype(jnp.float64)
    jac = jax.jacfwd(lambda y: physics.rhs(y, jnp.float64(0.0), pj, uj))(jnp.asarray(ss))
    ev = np.linalg.eigvals(np.asarray(jac))
    assert np.max(ev.real) < -1.0
    h = (1.0 / 60.0) / 120
    assert np.max(np.abs(ev)) * h < 1.5


def test_disconnected_settles_at_open_circuit():
    """With conn=0 the current decays and Vdc rises toward the array Voc
    (the diode model cuts power to zero there) — SPEC §5 trip limit."""
    p = make_params("10")
    u = nominal_exog()
    ss = scipy_ref.steady_state(p, u)
    u_off = dataclasses.replace(u, conn=0.0, ces=1.0)
    y = ss.copy()
    for k in range(120):  # 2 s
        y = scipy_ref.integrate_window(y, k / 60.0, 1.0 / 60.0, p, u_off)
    n = p.n_ph
    assert np.all(np.abs(y[0:2 * n]) < 1e-6)         # current gone
    vdc = y[6 * n]
    assert vdc > 1.1                                  # risen toward Voc
    assert rhs_core.pv_power(vdc, 1000.0, 298.15, p, np) < 0.02


@pytest.mark.parametrize("preset", ["10", "50"])
def test_rhs_jacobian_matches_finite_differences(preset):
    """The public jac_ODE_model analog (physics.rhs_jacobian) agrees with
    central finite differences of the RHS at a perturbed operating point."""
    p = make_params(preset)
    u = dataclasses.replace(nominal_exog(), v_g=0.9, q_ref=0.1)
    ss = scipy_ref.steady_state(p, dataclasses.replace(u, q_ref=0.0))
    pj, uj = p.astype(jnp.float64), u.astype(jnp.float64)
    y = jnp.asarray(ss) * 1.01
    t = jnp.float64(0.3)
    jac = np.asarray(physics.rhs_jacobian(y, t, pj, uj))
    assert jac.shape == (p.n_states, p.n_states)
    eps = 1e-6
    fd = np.empty_like(jac)
    for j in range(p.n_states):
        e = np.zeros(p.n_states); e[j] = eps
        fp = np.asarray(physics.rhs(y + e, t, pj, uj))
        fm = np.asarray(physics.rhs(y - e, t, pj, uj))
        fd[:, j] = (fp - fm) / (2 * eps)
    scale = np.maximum(np.abs(fd), 1.0)
    assert np.max(np.abs(jac - fd) / scale) < 1e-5
