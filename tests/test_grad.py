"""Differentiability through trajectories — a TPU-native capability the
reference's Python→Fortran (odeint) stack cannot offer at all: `jax.grad`
flows through the fixed-step RK4 windows (pure `lax.scan`), enabling
gradient-based controller-gain tuning and sensitivity analysis.
Demo: examples/gain_tuning.py.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pvderx._pytree import replace
from pvderx.ode import newton_solve, rk4_window
from pvderx.params import make_params, nominal_exog
from pvderx.physics import rhs_core

DT = 1.0 / 60.0
N_SUB = 40
N_WIN = 6


def _setup():
    p = make_params("10").astype(jnp.float64)
    u = nominal_exog().astype(jnp.float64)
    u_sag = replace(u, v_g=jnp.float64(0.7))
    y0, _ = newton_solve(
        lambda y: rhs_core.rhs(y, jnp.float64(0.0), p, u, jnp),
        rhs_core.steady_state_guess(p, u, jnp))
    return p, u_sag, y0


def _loss(kp_dc, p, u, y0):
    """Vdc tracking error over N_WIN windows of a sustained 0.7 pu sag."""
    p2 = replace(p, kp_dc=kp_dc)

    def body(y, k):
        t = k.astype(y.dtype) * DT
        y1 = rk4_window(lambda yy, tt: rhs_core.rhs(yy, tt, p2, u, jnp),
                        y, t, DT, N_SUB)
        return y1, (y1[6] - u.vdc_ref) ** 2

    _, errs = jax.lax.scan(body, y0, jnp.arange(N_WIN))
    return jnp.sum(errs)


def test_grad_through_trajectory_matches_finite_difference():
    p, u, y0 = _setup()
    kp = jnp.asarray(p.kp_dc, jnp.float64)
    g = jax.jit(jax.grad(_loss))(kp, p, u, y0)
    eps = 1e-5 * max(abs(float(kp)), 1.0)
    f = jax.jit(_loss)
    fd = (float(f(kp + eps, p, u, y0)) - float(f(kp - eps, p, u, y0))) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_gradient_step_reduces_tracking_error():
    """One capability demo at test scale: a few gradient steps on kp_dc
    reduce the sag tracking loss (full demo: examples/gain_tuning.py)."""
    p, u, y0 = _setup()
    kp = jnp.asarray(p.kp_dc, jnp.float64)
    f = jax.jit(_loss)
    df = jax.jit(jax.grad(_loss))
    loss0 = float(f(kp, p, u, y0))
    lr = 0.05 * abs(float(kp)) / max(abs(float(df(kp, p, u, y0))), 1e-12)
    for _ in range(5):
        kp = kp - lr * df(kp, p, u, y0)
    loss1 = float(f(kp, p, u, y0))
    assert loss1 < loss0
