"""Scipy reference implementation — the numerical truth oracle.

Mirrors the reference's solve path (SURVEY.md §3.2/§3.4: `DynamicSimulation`
windows driving `scipy.integrate.odeint`/LSODA with the DER `ODE_model`,
`[pvder:pvder/dynamic_simulation.py]` — unverified upstream path), built on the
same backend-generic equations as the JAX engine (`pvderx/physics/rhs_core.py`).
Per SPEC.md §6, LSODA at rtol=atol=1e-10 window-stepped on the 1/60 s grid is
"truth"; the JAX fixed-step RK4 path must match it to ≤1e-6 (float64).
"""
from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp
from scipy.optimize import fsolve

from pvderx.physics import rhs_core
from pvderx.params import DERParams, Exog

RTOL = 1e-10
ATOL = 1e-10


def rhs_np(y, t, p: DERParams, u: Exog):
    return rhs_core.rhs(np.asarray(y, dtype=np.float64), t, p, u, np)


def steady_state(p: DERParams, u: Exog):
    """fsolve-based steady-state init (reference analog: SURVEY.md §3.5)."""
    y0 = rhs_core.steady_state_guess(p, u, np)
    sol, info, ier, msg = fsolve(
        lambda y: rhs_np(y, 0.0, p, u), y0, xtol=1e-13, full_output=True
    )
    res = np.max(np.abs(rhs_np(sol, 0.0, p, u)))
    if ier != 1 and res > 1e-8:
        raise RuntimeError(f"oracle steady-state solve failed: {msg} (res={res:.3e})")
    return sol


def integrate_window(y, t0, dt, p: DERParams, u: Exog, rtol=RTOL, atol=ATOL):
    """One control window with LSODA at truth tolerances (SPEC.md §6)."""
    sol = solve_ivp(
        lambda t, yy: rhs_np(yy, t, p, u),
        (t0, t0 + dt), np.asarray(y, dtype=np.float64),
        method="LSODA", rtol=rtol, atol=atol,
    )
    if not sol.success:
        raise RuntimeError(f"oracle LSODA failed at t0={t0}: {sol.message}")
    return sol.y[:, -1]


def rk4_window_np(y, t0, dt, n_sub: int, p: DERParams, u: Exog):
    """Numpy mirror of `pvderx.ode.rk4.rk4_window` (identical arithmetic
    order, including the Kahan-compensated state accumulation), used to
    separate integrator error from implementation differences."""
    h = dt / n_sub
    y = np.asarray(y, dtype=np.float64)
    c = np.zeros_like(y)
    for k in range(n_sub):
        t = t0 + k * h
        k1 = rhs_np(y, t, p, u)
        k2 = rhs_np(y + 0.5 * h * k1, t + 0.5 * h, p, u)
        k3 = rhs_np(y + 0.5 * h * k2, t + 0.5 * h, p, u)
        k4 = rhs_np(y + h * k3, t + h, p, u)
        d = ((h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)) - c
        s = y + d
        c = (s - y) - d
        y = s
    return y


def run_episode(cfg, state, actions, rtol=RTOL, atol=ATOL):
    """Oracle twin of the RL episode — the judged contract made executable.

    Replays a fixed-seed episode from a `pvderx.env.core.reset` state,
    re-using the env's own pure supervisory/observation/reward functions
    (`_pre_window`/`_post_window`) and substituting ONLY the window
    integrator: LSODA at truth tolerances instead of the fixed-step RK4.
    Any per-step observation/reward difference vs `core.step` is therefore
    pure integrator error, which SPEC.md §6 bounds at ≤1e-6 (float64, knee
    n_sub). Reference analog: the env stepping `odeint` per control interval
    (SURVEY.md §3.2).

    Returns (obs [T, OBS_DIM], rewards [T], dones [T]) as numpy arrays.
    """
    import jax
    import jax.numpy as jnp

    from pvderx.env import core as env_core

    to_np = lambda tree: jax.tree.map(
        lambda x: np.asarray(x, np.float64), tree)
    p_host = to_np(cfg.der)
    obs_l, rew_l, done_l = [], [], []
    st = state
    for a in actions:
        t, exog, mppt, flag = env_core._pre_window(cfg, st, jnp.asarray(a))
        y1 = integrate_window(np.asarray(st.y, np.float64), float(t),
                              cfg.dt_ctrl, p_host, to_np(exog), rtol, atol)
        st, obs, r, done, _info = env_core._post_window(
            cfg, st, exog, mppt, t, jnp.asarray(y1, st.y.dtype), flag)
        obs_l.append(np.asarray(obs))
        rew_l.append(float(r))
        done_l.append(bool(done))
        if done_l[-1]:
            break
    return np.stack(obs_l), np.asarray(rew_l), np.asarray(done_l)


def run_trajectory(p: DERParams, exog_seq, y0=None, dt=1.0 / 60.0, rtol=RTOL, atol=ATOL):
    """Window-stepped trajectory with per-window exogenous inputs (ZOH).

    exog_seq: list of Exog, one per control step. Returns [n_steps+1, n_states]
    states at window boundaries. This is the oracle for the standalone-sim
    workflow (SURVEY.md §3.4).
    """
    if y0 is None:
        y0 = steady_state(p, exog_seq[0])
    ys = [np.asarray(y0, dtype=np.float64)]
    t = 0.0
    for k, u in enumerate(exog_seq):
        ys.append(integrate_window(ys[-1], k * dt, dt, p, u, rtol, atol))
    return np.stack(ys)
