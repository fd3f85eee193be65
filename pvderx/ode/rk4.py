"""Fixed-step RK4 over one control window as a `lax.scan`.

TPU-native replacement for the reference's adaptive `scipy.integrate.odeint`
(LSODA) inner loop (SURVEY.md §2.2): static shapes, no data-dependent control
flow, fuses to pure VPU element-wise work under jit/vmap. Substep times are
computed as `t0 + k*h` (not accumulated) so float32 rollouts don't drift.

The state update is Kahan-compensated (SPEC.md §6): the per-substep increment
is small relative to the state, so a plain `y += delta` loses ~ulp(|y|) per
substep and random-walks to ~sqrt(n_sub*T)·ulp over an episode — measured
5.2e-6 at f32 over 120 windows of 72 substeps, which breached the 1e-6
contract on the production f32 path. Carrying the rounding residue in a
compensation array removes the walk (measured ~6e-7 after; the remaining
error is the f32 representation/RHS floor). Costs 3 extra VPU ops per state
per substep against 4 full RHS evaluations — noise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def rk4_step(f, y, t, h):
    """One classical RK4 step (uncompensated; kept for single-step callers)."""
    k1 = f(y, t)
    k2 = f(y + 0.5 * h * k1, t + 0.5 * h)
    k3 = f(y + 0.5 * h * k2, t + 0.5 * h)
    k4 = f(y + h * k3, t + h)
    return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rk4_delta(f, y, t, h):
    """The RK4 state increment (h/6)·(k1+2k2+2k3+k4) without applying it."""
    k1 = f(y, t)
    k2 = f(y + 0.5 * h * k1, t + 0.5 * h)
    k3 = f(y + 0.5 * h * k2, t + 0.5 * h)
    k4 = f(y + h * k3, t + h)
    return (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def kahan_add(y, c, delta):
    """One Kahan compensated accumulation step: returns (y', c') with
    y' ≈ y + delta and c' carrying the rounding residue. Arithmetic order is
    frozen — the numpy oracle (oracle/scipy_ref.rk4_window_np), the Pallas
    kernels (ops/window.py) and the C++ runtime (native/) mirror it exactly.
    XLA does not reassociate floating point, so the cancellation survives jit.
    """
    d = delta - c
    s = y + d
    c = (s - y) - d
    return s, c


def rk4_window(f, y0, t0, dt, n_sub: int):
    """Integrate y' = f(y, t) from t0 to t0+dt with n_sub fixed RK4 steps,
    Kahan-compensated (module docstring)."""
    h = dt / n_sub
    ks = jnp.arange(n_sub)

    def body(carry, k):
        y, c = carry
        d = rk4_delta(f, y, t0 + k * h, h)
        return kahan_add(y, c, d), None

    (y, _), _ = lax.scan(body, (y0, jnp.zeros_like(y0)), ks)
    return y
