"""Damped Newton solver for steady-state initialization.

TPU-native replacement for the reference's `scipy.optimize.fsolve` (MINPACK
hybrd) steady-state init (SURVEY.md §2.2, §3.5): analytic Jacobian via
`jax.jacfwd`, fixed iteration count (branchless), vmappable over env batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def newton_solve(f, y0, iters: int = 30, damping: float = 1.0):
    """Solve f(y) = 0. Returns (y, max_abs_residual_at_y)."""
    jac = jax.jacfwd(f)

    def body(y, _):
        r = f(y)
        j = jac(y)
        dy = jnp.linalg.solve(j, r)
        # guard: if the solve produced non-finite values, keep the iterate
        dy = jnp.where(jnp.isfinite(dy), dy, 0.0)
        return y - damping * dy, None

    y, _ = lax.scan(body, y0, None, length=iters)
    return y, jnp.max(jnp.abs(f(y)))
