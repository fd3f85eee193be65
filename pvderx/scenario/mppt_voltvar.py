"""MPPT (perturb & observe) and Volt-VAR droop — branchless supervisory logic.

Reference analog: the MPPT and Volt-VAR smart-inverter features evaluated
between integration windows (SURVEY.md §2.1 #8, `[pvder:pvder/DER_features.py]`
— unverified upstream path). Semantics per SPEC.md §8.
"""
from __future__ import annotations

import jax.numpy as jnp

from pvderx._pytree import pytree_dataclass


@pytree_dataclass
class MPPTState:
    p_prev: jnp.ndarray   # last sampled PV power [pu]
    direction: jnp.ndarray  # +1 / -1 perturb direction


def mppt_init(p0=0.0, dtype=jnp.float32) -> MPPTState:
    return MPPTState(p_prev=jnp.asarray(p0, dtype), direction=jnp.ones((), dtype))


# P&O power deadband [pu]: |dP| below this keeps the current direction.
# Real P&O controllers reject measurement noise this way; here it ALSO pins
# the cross-backend contract — at the MPP the raw dP >= 0 decision is
# sign-of-last-ulp, and jnp-vs-numpy ulp differences flipped direction bits
# nondeterministically between the env and its independent oracle (round 5,
# found when the divide hoist re-rolled the roundings: 2 of 6 seeds
# diverged by ~3e-2). 1e-6 pu (~0.25 W on the 250 kW preset) is far above
# any backend ulp and far below a real P&O step's dP.
MPPT_DEADBAND = 1e-6


def mppt_update(ms: MPPTState, vdc_ref, p_pv, k_step, n_mppt: int,
                dv: float = 0.005, lo: float = 0.7, hi: float = 1.2):
    """P&O update, active once every n_mppt control steps (SPEC.md §8).

    Returns (new_state, new_vdc_ref). Direction flips only when the power
    moved DOWN by more than MPPT_DEADBAND (see above).
    """
    active = (jnp.asarray(k_step) % n_mppt == 0).astype(vdc_ref.dtype)
    dp = p_pv - ms.p_prev
    new_dir = jnp.where(dp >= -MPPT_DEADBAND, ms.direction, -ms.direction)
    vdc_new = jnp.clip(vdc_ref + dv * new_dir, lo, hi)
    return (
        MPPTState(
            p_prev=ms.p_prev + active * (p_pv - ms.p_prev),
            direction=ms.direction + active * (new_dir - ms.direction),
        ),
        vdc_ref + active * (vdc_new - vdc_ref),
    )


# Volt-VAR droop curve knots (SPEC.md §8): full boost below 0.92, deadband
# 0.98..1.02, full absorb above 1.08.
VV_V = (0.92, 0.98, 1.02, 1.08)


def voltvar_qref(v_mag, q_max: float = 0.44):
    """Piecewise-linear Q_ref = f(|V_pos|), branchless (jnp.interp clamps)."""
    xp = jnp.asarray(VV_V, v_mag.dtype)
    fp = jnp.asarray([q_max, 0.0, 0.0, -q_max], v_mag.dtype)
    return jnp.interp(v_mag, xp, fp)
