"""Multi-DER fleet on a shared feeder (BASELINE config 5; SPEC.md §11).

M inverters couple only through the shared PCC voltage: the feeder KCL uses
the **mean** per-unit injection (currents in per-unit of the aggregate base
M·S_base, so M identical units at 1 pu each inject 1 pu aggregate — standard
per-unit practice; this keeps the shipped Z_g presets meaningful for any M).

Reference analog: none — the reference simulates exactly one DER per process
(SURVEY.md §2.5 "Multi-DER intra-env parallel" row names this as the pvderx
extension). The per-DER physics is the shared core (`rhs_core.rhs_given_v`);
only the coupling differs: JAX path vmaps over the M axis, the numpy oracle
loops — both call the identical per-DER equations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pvderx.physics.rhs_core import (
    C, cscale, pcc_voltage, rhs_given_v, algebra_given_v, steady_state_guess,
)


def _shared(tree):
    """Take element 0 of each [M] leaf -> the shared feeder scalars."""
    return jax.tree.map(
        lambda l: l[0] if getattr(l, "ndim", 0) > 0 else l, tree)


def fleetify(tree, m: int, xp=np):
    """Broadcast every scalar leaf of a params/exog pytree to shape [M]."""
    def bc(l):
        arr = xp.asarray(l)
        return xp.broadcast_to(arr, (m,) + arr.shape) if arr.ndim == 0 else arr
    return jax.tree.map(bc, tree)


def fleet_pcc_voltage(Y, t, fp, fu, xp) -> C:
    """Shared PCC voltage from the mean per-unit injection of all M units."""
    n = fp.n_ph
    conn = fu.conn  # [M]
    i_inj = C(xp.mean(conn[:, None] * Y[:, 0:n], axis=0),
              xp.mean(conn[:, None] * Y[:, n:2 * n], axis=0))
    return pcc_voltage(i_inj, t, _shared(fp), _shared(fu), xp)


def fleet_rhs(Y, t, fp, fu, xp):
    """dY/dt for the fleet; Y [M, n_states], fp/fu leaves [M].

    Grid/load fields of `fu` (v_g, phi_g, dw_g, t_g, g_load, b_load) and grid
    params of `fp` (rg, xg) must be identical across M (shared feeder).
    """
    v = fleet_pcc_voltage(Y, t, fp, fu, xp)
    if xp is jnp:
        return jax.vmap(
            lambda y, p, u: rhs_given_v(y, t, p, u, v, jnp))(Y, fp, fu)
    rows = []
    m = Y.shape[0]
    for k in range(m):
        pk = jax.tree.map(lambda l: l[k] if getattr(l, "ndim", 0) > 0 else l, fp)
        uk = jax.tree.map(lambda l: l[k] if getattr(l, "ndim", 0) > 0 else l, fu)
        rows.append(rhs_given_v(Y[k], t, pk, uk, v, xp))
    return np.stack(rows)


def fleet_algebra(Y, t, fp, fu, xp):
    """Per-DER Algebra tuples with the shared PCC voltage (leaves [M, ...])."""
    v = fleet_pcc_voltage(Y, t, fp, fu, xp)
    if xp is jnp:
        return jax.vmap(
            lambda y, p, u: algebra_given_v(y, t, p, u, v, jnp))(Y, fp, fu)
    cols = []
    m = Y.shape[0]
    for k in range(m):
        pk = jax.tree.map(lambda l: l[k] if getattr(l, "ndim", 0) > 0 else l, fp)
        uk = jax.tree.map(lambda l: l[k] if getattr(l, "ndim", 0) > 0 else l, fu)
        cols.append(algebra_given_v(Y[k], t, pk, uk, v, xp))
    return jax.tree.map(lambda *xs: np.stack(xs), *cols)


def fleet_guess(fp, fu, xp):
    """Stacked single-DER steady-state guesses (weak coupling -> good start)."""
    if xp is jnp:
        return jax.vmap(lambda p, u: steady_state_guess(p, u, jnp))(fp, fu)
    m = len(np.asarray(fu.conn))
    rows = []
    for k in range(m):
        pk = jax.tree.map(lambda l: l[k] if getattr(l, "ndim", 0) > 0 else l, fp)
        uk = jax.tree.map(lambda l: l[k] if getattr(l, "ndim", 0) > 0 else l, fu)
        rows.append(steady_state_guess(pk, uk, xp))
    return np.stack(rows)
