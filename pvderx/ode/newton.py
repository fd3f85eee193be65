"""Damped Newton solver for steady-state initialization.

TPU-native replacement for the reference's `scipy.optimize.fsolve` (MINPACK
hybrd) steady-state init (SURVEY.md §2.2, §3.5): analytic Jacobian via
`jax.jacfwd`, fixed iteration count (branchless), vmappable over env batches.

The step is globalized with a branchless backtracking line search (step
scales 1, 1/2, 1/4, 1/16, pick the candidate with the smallest residual
norm): plain full-step Newton diverged on ~6% of coupled-fleet inits under
aggressive scenario randomization (zg_jitter=0.3 + per-unit insolation
spread, found by tests/test_checks.py::test_fleet_reset_residual), because
the diode exponential overshoots when the warm start is far from the basin.
Four extra RHS evaluations per iteration are noise at reset time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_STEP_SCALES = (1.0, 0.5, 0.25, 0.0625)


def newton_solve(f, y0, iters: int = 30, damping: float = 1.0):
    """Solve f(y) = 0. Returns (y, max_abs_residual_at_y)."""
    jac = jax.jacfwd(f)

    def body(y, _):
        r = f(y)
        j = jac(y)
        dy = jnp.linalg.solve(j, r)
        # guard: if the solve produced non-finite values, keep the iterate
        dy = jnp.where(jnp.isfinite(dy), dy, 0.0)
        # backtracking: try each step scale at the SAME array shape as the
        # iterate (sequential evals + a select chain, NOT a stacked batch +
        # argmin/gather — an extra candidate batch dim changes XLA:CPU
        # vectorization at the ulp level and broke bitwise shard-invariance
        # of vmapped resets, tests/multihost_launch.py). Ties keep the
        # larger step, so at convergence this reduces to full-step Newton.
        # A non-finite candidate residual (diode exp overflow) ranks last.
        best_y = y - damping * _STEP_SCALES[0] * dy
        best_n = jnp.max(jnp.abs(f(best_y)))
        best_n = jnp.where(jnp.isfinite(best_n), best_n, jnp.inf)
        for s in _STEP_SCALES[1:]:
            yc = y - damping * s * dy
            n = jnp.max(jnp.abs(f(yc)))
            n = jnp.where(jnp.isfinite(n), n, jnp.inf)
            better = n < best_n
            best_y = jnp.where(better, yc, best_y)
            best_n = jnp.where(better, n, best_n)
        return best_y, None

    y, _ = lax.scan(body, y0, None, length=iters)
    return y, jnp.max(jnp.abs(f(y)))
