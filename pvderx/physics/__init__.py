"""JAX bindings of the shared physics core (rhs_core is backend-generic)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pvderx.physics import rhs_core
from pvderx.physics.rhs_core import Algebra, unpack


def rhs(y, t, p, u):
    """dy/dt — JAX path (SPEC.md §5)."""
    return rhs_core.rhs(y, t, p, u, jnp)


def rhs_jacobian(y, t, p, u):
    """∂(dy/dt)/∂y, the [n_states, n_states] system Jacobian — the analog of
    the reference's hand-written `jac_ODE_model(y, t)` (SURVEY.md §2.1 #6/#7,
    `[pvder:pvder/DER_components_*.py]` — unverified upstream path), here
    derived exactly from the shared RHS by forward-mode AD instead of being
    maintained by hand. Used by the implicit integrators and available for
    stiffness/eigenvalue analysis (e.g. picking n_sub against the RK4
    stability bound, SPEC.md §6)."""
    return jax.jacfwd(lambda yy: rhs_core.rhs(yy, t, p, u, jnp))(y)


def algebra(y, t, p, u) -> Algebra:
    """Algebraic measurements — JAX path (SPEC.md §4)."""
    return rhs_core.algebra(y, t, p, u, jnp)


def pv_power(vdc, s_irr, t_cell, p):
    return rhs_core.pv_power(vdc, s_irr, t_cell, p, jnp)


def steady_state_guess(p, u):
    return rhs_core.steady_state_guess(p, u, jnp)


__all__ = ["rhs", "rhs_jacobian", "algebra", "pv_power", "steady_state_guess",
           "Algebra", "unpack"]
