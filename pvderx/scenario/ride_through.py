"""IEEE-1547-style voltage/frequency ride-through — branchless state machine.

Reference analog: `LVRT(t)/HVRT(t)/FRT(t)` zone timers + trip latches evaluated
between integration windows (SURVEY.md §2.1 #8, `[pvder:pvder/DER_features.py]`
— unverified upstream path). pvderx keeps the same semantics as pure masked
arithmetic on a [6]-vector of zone timers (SPEC.md §8): timers accumulate
dt_ctrl while in zone else reset; exceeding the zone limit latches a trip
(conn=0) for the rest of the episode; the LV2 zone additionally forces
momentary cessation while active.

Zone order: [LV1, LV2, HV1, HV2, LF, HF].
"""
from __future__ import annotations

import jax.numpy as jnp

from pvderx._pytree import pytree_dataclass

N_ZONES = 6


@pytree_dataclass
class RideThroughParams:
    """Thresholds [pu], time limits [s], per-zone enables (floats 0/1)."""

    v_lv1: float
    v_lv2: float
    v_hv1: float
    v_hv2: float
    f_lf: float
    f_hf: float
    t_lim: jnp.ndarray   # [6]
    enable: jnp.ndarray  # [6]


def default_rt_params(enabled: bool = True) -> RideThroughParams:
    # numpy (host) leaves — this runs at config time on the host; a jnp
    # creation here is a device round-trip per array through the TPU tunnel
    # (measured 145 s for one make_env_config on a degraded link; see
    # DERParams.astype)
    import numpy as np
    e = 1.0 if enabled else 0.0
    return RideThroughParams(
        v_lv1=0.88, v_lv2=0.50, v_hv1=1.10, v_hv2=1.20, f_lf=0.98, f_hf=1.02,
        t_lim=np.asarray([3.0, 1.0, 1.0, 0.16, 3.0, 3.0], np.float32),
        enable=np.full((N_ZONES,), e, np.float32),
    )


@pytree_dataclass
class RideThroughState:
    timers: jnp.ndarray  # [6]
    tripped: jnp.ndarray  # scalar 0/1 (latched)
    ces: jnp.ndarray      # scalar 0/1 (momentary cessation, not latched)


def rt_init(dtype=jnp.float32) -> RideThroughState:
    return RideThroughState(
        timers=jnp.zeros((N_ZONES,), dtype),
        tripped=jnp.zeros((), dtype),
        ces=jnp.zeros((), dtype),
    )


def rt_update(rt: RideThroughState, rtp: RideThroughParams, v_mag, f_meas, dt):
    """One supervisory update (between windows). Returns new state.

    `tripped` latches; `ces` is 1 only while the LV2 zone is active.
    """
    in_zone = jnp.stack([
        v_mag < rtp.v_lv1,
        v_mag < rtp.v_lv2,
        v_mag > rtp.v_hv1,
        v_mag > rtp.v_hv2,
        f_meas < rtp.f_lf,
        f_meas > rtp.f_hf,
    ]).astype(rt.timers.dtype) * rtp.enable
    timers = (rt.timers + dt) * in_zone
    trip_now = jnp.max(jnp.where(timers > rtp.t_lim, 1.0, 0.0))
    tripped = jnp.maximum(rt.tripped, trip_now.astype(rt.tripped.dtype))
    ces = in_zone[1].astype(rt.ces.dtype)
    return RideThroughState(timers=timers, tripped=tripped, ces=ces)
