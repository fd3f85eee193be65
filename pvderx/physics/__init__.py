"""JAX bindings of the shared physics core (rhs_core is backend-generic)."""
from __future__ import annotations

import jax.numpy as jnp

from pvderx.physics import rhs_core
from pvderx.physics.rhs_core import Algebra, unpack


def rhs(y, t, p, u):
    """dy/dt — JAX path (SPEC.md §5)."""
    return rhs_core.rhs(y, t, p, u, jnp)


def algebra(y, t, p, u) -> Algebra:
    """Algebraic measurements — JAX path (SPEC.md §4)."""
    return rhs_core.algebra(y, t, p, u, jnp)


def pv_power(vdc, s_irr, t_cell, p):
    return rhs_core.pv_power(vdc, s_irr, t_cell, p, jnp)


def steady_state_guess(p, u):
    return rhs_core.steady_state_guess(p, u, jnp)


__all__ = ["rhs", "algebra", "pv_power", "steady_state_guess", "Algebra", "unpack"]
