"""Fixed-step RK4 over one control window as a `lax.scan`.

TPU-native replacement for the reference's adaptive `scipy.integrate.odeint`
(LSODA) inner loop (SURVEY.md §2.2): static shapes, no data-dependent control
flow, fuses to pure VPU element-wise work under jit/vmap. Substep times are
computed as `t0 + k*h` (not accumulated) so float32 rollouts don't drift.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def rk4_step(f, y, t, h):
    """One classical RK4 step. Arithmetic order mirrored by the numpy oracle."""
    k1 = f(y, t)
    k2 = f(y + 0.5 * h * k1, t + 0.5 * h)
    k3 = f(y + 0.5 * h * k2, t + 0.5 * h)
    k4 = f(y + h * k3, t + h)
    return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rk4_window(f, y0, t0, dt, n_sub: int):
    """Integrate y' = f(y, t) from t0 to t0+dt with n_sub fixed RK4 steps."""
    h = dt / n_sub
    ks = jnp.arange(n_sub)

    def body(y, k):
        return rk4_step(f, y, t0 + k * h, h), None

    y, _ = lax.scan(body, y0, ks)
    return y
