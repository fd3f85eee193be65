"""Fleet environment: M inverters per env on a shared feeder (BASELINE cfg 5).

Same contract shape as `pvderx.env.core` (reset/step pure functions), with
per-unit ride-through/MPPT state and a coupled steady-state init. SPEC.md §11.

Two control granularities (round 5 added the second — the depth axis the
round-4 verdict flagged):

- **aggregate** (``per_unit=False``, default): one fleet-level Discrete(5)
  action applied to every unit; Box(13) aggregate observation (same layout
  as the single-DER env).
- **per-unit** (``per_unit=True``): the action is an [M] int32 vector — one
  Discrete(5) channel per inverter (gym: ``MultiDiscrete([5]*M)``) — and the
  observation appends a per-unit block to the 13 shared aggregates:
  ``[13 shared | M× Vdc | M× P_pcc | M× Q_pcc | M× conn]`` (dim 13 + 4M,
  `fleet_obs_dim`). Physics, events, ride-through and the fused fleet kernel
  are IDENTICAL in both modes — only the action fan-out (which is already
  elementwise over [M] setpoints) and the observation head differ. Reward
  stays the fleet-mean (one cooperative return; per-unit credit assignment
  is the policy's job), termination stays all-units-offline — partial trips
  are visible per unit through the conn block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pvderx._pytree import pytree_dataclass, replace
from pvderx.env import core as env_core
from pvderx.env.core import EnvConfig, OBS_DIM, N_ACTIONS
from pvderx.ode import newton_solve, rk4_window
from pvderx.params import DERParams, Exog
from pvderx.physics import fleet as fl
from pvderx.physics import rhs_core
from pvderx.scenario.events import EventSchedule, make_exog
from pvderx.scenario.mppt_voltvar import mppt_update, voltvar_qref
from pvderx.scenario.ride_through import RideThroughState, rt_update


@pytree_dataclass(meta=("m", "per_unit"))
class FleetConfig:
    base: EnvConfig
    m: int
    per_unit: bool = False


def make_fleet_config(preset: str = "10", m: int = 16,
                      per_unit: bool = False, **kw) -> FleetConfig:
    return FleetConfig(base=env_core.make_env_config(preset, **kw), m=m,
                       per_unit=per_unit)


def fleet_obs_dim(fc: FleetConfig) -> int:
    """13 shared aggregates (+ the 4M per-unit block in per-unit mode)."""
    return OBS_DIM + (4 * fc.m if fc.per_unit else 0)


@pytree_dataclass
class FleetState:
    der: DERParams          # leaves [M]
    sched: EventSchedule    # shared per env
    y: jnp.ndarray          # [M, n_states]
    t_step: jnp.ndarray
    vdc_ref: jnp.ndarray    # [M]
    q_ref: jnp.ndarray      # [M]
    s_scale: jnp.ndarray    # [M] per-unit insolation factor (scen.fleet_s_jitter)
    rt: RideThroughState    # leaves [M, ...]
    mppt: object            # MPPTState leaves [M]
    key: jnp.ndarray
    init_res: jnp.ndarray   # max-abs Newton residual of the coupled
                            # steady-state init (init sanity, SURVEY §2.1 #9)
    y0: jnp.ndarray
    s0: jnp.ndarray
    tc0: jnp.ndarray
    # cached episode-initial quantities (soft reset without re-evaluating the
    # fleet algebra — the hot autoreset path, same design as env.core)
    obs0: jnp.ndarray       # [OBS_DIM]
    ppv0: jnp.ndarray       # [M]


def _fleet_exog(sched: EventSchedule, t, m: int, vdc_ref, q_ref, conn, ces,
                s_scale=None) -> Exog:
    """Per-unit Exog ([M] leaves) with shared grid/load event fields; solar is
    shared too unless `s_scale` [M] spreads it per unit (partial clouding,
    scen.fleet_s_jitter)."""
    sh = make_exog(sched, t, jnp.zeros_like(vdc_ref[0]), jnp.zeros_like(q_ref[0]),
                   jnp.ones_like(conn[0]), jnp.zeros_like(ces[0]))
    bc = lambda x: jnp.broadcast_to(x, (m,))
    s_irr = bc(sh.s_irr) if s_scale is None else sh.s_irr * s_scale
    return Exog(
        s_irr=s_irr, t_cell=bc(sh.t_cell), v_g=bc(sh.v_g),
        phi_g=bc(sh.phi_g), dw_g=bc(sh.dw_g), t_g=bc(sh.t_g),
        v_g2=bc(sh.v_g2), phi_g2=bc(sh.phi_g2),
        g_load=bc(sh.g_load), b_load=bc(sh.b_load),
        vdc_ref=vdc_ref, q_ref=q_ref, conn=conn, ces=ces,
        p_ref=jnp.zeros_like(vdc_ref),
    )


def reset(fc: FleetConfig, key):
    cfg, m = fc.base, fc.m
    dtype = cfg.der.rf.dtype
    k_base, k_jit, k_ev, k_state = jax.random.split(key, 4)
    kb1, kb2, kb3 = jax.random.split(k_base, 3)
    sc = cfg.scen
    s0 = jax.random.uniform(kb1, (), dtype, minval=sc.s0_lo, maxval=sc.s0_hi)
    tc0 = jax.random.uniform(kb2, (), dtype, minval=sc.tc_lo, maxval=sc.tc_hi)
    # per-unit insolation spread (partial clouding), fixed for the episode.
    # Shading only (scale in (1-jitter, 1]): a scale > 1 can push a unit past
    # its current-limited capability at high s0, where NO steady state exists
    # (dxDC/dt = 0 forces Vdc == vdc_ref, unreachable beyond the limit) —
    # found by tests/test_checks.py::test_fleet_reset_residual, where both
    # Newton and scipy fsolve rightly failed on such a draw.
    s_scale = 1.0 - sc.fleet_s_jitter * jax.random.uniform(kb3, (m,), dtype)
    # shared-feeder impedance jitter: one draw, broadcast to all units
    der1 = env_core._jitter_params(k_jit, cfg.der, sc, dtype)
    der = fl.fleetify(der1, m, jnp)
    sched = env_core._sample_events(k_ev, cfg, s0, tc0, dtype)

    vdc_ref = jnp.ones((m,), dtype)
    q_ref = jnp.zeros((m,), dtype)
    conn = jnp.ones((m,), dtype)
    ces = jnp.zeros((m,), dtype)
    fu = _fleet_exog(sched, jnp.zeros((), dtype), m, vdc_ref, q_ref, conn, ces,
                     s_scale)

    n_s = 6 * cfg.der.n_ph + 5
    f = lambda yf: fl.fleet_rhs(
        yf.reshape(m, n_s), jnp.zeros((), dtype), der, fu, jnp).reshape(-1)
    y0, res = newton_solve(f, fl.fleet_guess(der, fu, jnp).reshape(-1), iters=15)
    y0 = y0.reshape(m, n_s).astype(dtype)

    g = fl.fleet_algebra(y0, jnp.zeros((), dtype), der, fu, jnp)
    rt = RideThroughState(
        timers=jnp.zeros((m, 6), dtype),
        tripped=jnp.zeros((m,), dtype), ces=jnp.zeros((m,), dtype))
    from pvderx.scenario.mppt_voltvar import MPPTState
    mppt = MPPTState(p_prev=g.p_pv, direction=jnp.ones((m,), dtype))
    st = FleetState(der=der, sched=sched, y=y0,
                    t_step=jnp.zeros((), jnp.int32),
                    vdc_ref=vdc_ref, q_ref=q_ref, s_scale=s_scale,
                    rt=rt, mppt=mppt,
                    key=k_state, init_res=jnp.asarray(res, dtype),
                    y0=y0, s0=s0, tc0=tc0,
                    obs0=jnp.zeros((fleet_obs_dim(fc),), dtype),
                    ppv0=jnp.asarray(g.p_pv, dtype))
    obs = _obs(fc, st, g, fu, jnp.zeros((), dtype))
    return replace(st, obs0=obs), obs


def _obs(fc: FleetConfig, st: FleetState, g, fu: Exog, t_next):
    """Observation: 13 shared aggregates (same layout as the single-DER env);
    per-unit mode appends [M× Vdc | M× P_pcc | M× Q_pcc | M× conn]
    (module docstring; dim = fleet_obs_dim(fc))."""
    cfg = fc.base
    dtype = st.y.dtype
    n = cfg.der.n_ph
    conn_frac = jnp.mean(fu.conn)
    agg = jnp.stack([
        jnp.mean(g.i_pos.re), jnp.mean(g.i_pos.im),
        g.v_pos.re[0], g.v_pos.im[0],
        jnp.mean(st.y[:, 6 * n]),
        jnp.mean(g.p_pcc), jnp.mean(g.q_pcc),
        jnp.mean(st.vdc_ref), jnp.mean(st.q_ref),
        jnp.mean(fu.s_irr) / 1000.0,  # fleet-mean insolation (per-unit spread
                                      # when scen.fleet_s_jitter > 0)
        10.0 * (jnp.mean(g.f_meas) - 1.0),
        t_next / cfg.horizon,
        conn_frac,
    ])
    if fc.per_unit:
        agg = jnp.concatenate([
            agg, st.y[:, 6 * n], g.p_pcc, g.q_pcc, fu.conn])
    return agg.astype(dtype)


def _pre_window(fc: FleetConfig, st: FleetState, action):
    """Action + supervisory layer (steps 1-2); ZOH exog for the window.

    Split from the integration so the batched path can swap in the fused
    Pallas fleet kernel (pvderx/ops/window.rk4_fleet_window_batch)."""
    cfg, m = fc.base, fc.m
    dtype = st.y.dtype
    dt = jnp.asarray(cfg.dt_ctrl, dtype)
    t = st.t_step.astype(dtype) * dt
    # aggregate mode: scalar action broadcast to all M setpoint channels;
    # per-unit mode: [M] actions act elementwise (q_ref/vdc_ref are already
    # [M] — identical arithmetic either way)
    a = jnp.asarray(action, jnp.int32)

    q_ref, vdc_ref = st.q_ref, st.vdc_ref
    if not cfg.voltvar_enable:
        dq = cfg.dq_action * ((a == 1).astype(dtype) - (a == 2).astype(dtype))
        q_ref = jnp.clip(q_ref + dq, cfg.q_lo, cfg.q_hi)
    if not cfg.mppt_enable:
        dv = cfg.dv_action * ((a == 3).astype(dtype) - (a == 4).astype(dtype))
        vdc_ref = jnp.clip(vdc_ref + dv, cfg.v_lo, cfg.v_hi)

    conn = 1.0 - st.rt.tripped
    fu = _fleet_exog(st.sched, t, m, vdc_ref, q_ref, conn, st.rt.ces,
                     st.s_scale)
    mppt = st.mppt
    if cfg.voltvar_enable or cfg.mppt_enable:
        g0 = fl.fleet_algebra(st.y, t, st.der, fu, jnp)
        if cfg.voltvar_enable:
            v_mag0 = jnp.hypot(g0.v_pos.re[0], g0.v_pos.im[0])
            q_ref = jnp.broadcast_to(voltvar_qref(v_mag0, cfg.q_vv), (m,))
        if cfg.mppt_enable:
            mppt, vdc_ref = jax.vmap(
                lambda ms, vr, pp: mppt_update(ms, vr, pp, st.t_step,
                                               cfg.n_mppt)
            )(mppt, vdc_ref, g0.p_pv)
        fu = replace(fu, vdc_ref=vdc_ref, q_ref=q_ref)
    return t, fu, mppt


def _post_window(fc: FleetConfig, st: FleetState, fu, mppt, t, y1):
    """Post-window measurements, ride-through, obs/reward/done (steps 4-5)."""
    cfg, m = fc.base, fc.m
    dtype = st.y.dtype
    dt = jnp.asarray(cfg.dt_ctrl, dtype)
    vdc_ref, q_ref = fu.vdc_ref, fu.q_ref
    g1 = fl.fleet_algebra(y1, t + dt, st.der, fu, jnp)
    v_mag1 = jnp.hypot(g1.v_pos.re[0], g1.v_pos.im[0])
    rt1 = jax.vmap(lambda rt, fm: rt_update(rt, cfg.rt, v_mag1, fm, dt)
                   )(st.rt, g1.f_meas)
    trip_now = jnp.mean(rt1.tripped * (1.0 - st.rt.tripped))

    t_next = (st.t_step + 1).astype(dtype)
    st1 = replace(st, y=y1, t_step=st.t_step + 1, vdc_ref=vdc_ref,
                  q_ref=q_ref, rt=rt1, mppt=mppt)
    fu_out = replace(fu, conn=1.0 - rt1.tripped)
    obs = _obs(fc, st1, g1, fu_out, t_next)
    vdc_m = jnp.mean(y1[:, 6 * cfg.der.n_ph])
    reward = env_core._reward(cfg, vdc_m, jnp.mean(vdc_ref),
                              jnp.mean(g1.q_pcc), jnp.mean(q_ref),
                              v_mag1, trip_now)
    terminated = jnp.min(rt1.tripped) > 0.5      # whole fleet offline
    truncated = st1.t_step >= cfg.horizon
    done = terminated | truncated
    info = {
        "vdc": vdc_m, "v_mag": v_mag1,
        "f_meas": jnp.mean(g1.f_meas),
        "p_pcc": jnp.mean(g1.p_pcc), "q_pcc": jnp.mean(g1.q_pcc),
        "p_pv": jnp.mean(g1.p_pv),
        "tripped_frac": jnp.mean(rt1.tripped), "trip_now_frac": trip_now,
        "terminated": terminated, "truncated": truncated,
    }
    return st1, obs, reward, done, info


def step(fc: FleetConfig, st: FleetState, action):
    """One control interval for the whole fleet (SPEC.md §11). The window
    scheme follows fc.base.integrator (see env.core.INTEGRATORS); implicit
    schemes solve the stacked [M*n_states] system per step."""
    cfg, m = fc.base, fc.m
    t, fu, mppt = _pre_window(fc, st, action)
    n_s = st.y.shape[-1]
    f = lambda yf, tt: fl.fleet_rhs(yf.reshape(m, n_s), tt, st.der, fu, jnp
                                    ).reshape(-1)
    win = env_core.INTEGRATORS[cfg.integrator]
    y1 = win(f, st.y.reshape(-1), t,
             jnp.asarray(cfg.dt_ctrl, st.y.dtype),
             cfg.n_sub).reshape(m, n_s)
    return _post_window(fc, st, fu, mppt, t, y1)


def step_autoreset(fc: FleetConfig, st: FleetState, action):
    st1, obs, reward, done, info = step(fc, st, action)
    st_r, obs_r = _soft_reset(fc, st1)
    sel = lambda a, b: jnp.where(done, a, b)
    return jax.tree.map(sel, st_r, st1), sel(obs_r, obs), reward, done, info


# ---------------------------------------------------------------------------
# batched fleet env (mirror of pvderx.env.vector for the fleet)
# ---------------------------------------------------------------------------
def _where_done(done, a, b):
    d = done.reshape(done.shape + (1,) * (a.ndim - 1))
    return jnp.where(d, a, b)


def _step_batch_impl(fc: FleetConfig, state, actions, *, window: str,
                     block: int, autoreset: bool, mesh=None):
    from functools import partial as _p

    from pvderx.env.vector import (
        _effective_block, _local_envs, _shard_mapped_window, _use_pallas)
    if fc.base.integrator != "rk4":
        if window == "pallas":
            raise ValueError(
                f"window='pallas' supports integrator='rk4' only, got "
                f"{fc.base.integrator!r} (use window='auto'/'scan')")
        window = "scan"
    n = state.y.shape[0]
    n_loc = _local_envs(n, mesh)
    if n_loc is None:
        if window == "pallas":
            raise ValueError(
                f"window='pallas' with mesh needs N={n} divisible by the "
                f"'env' shard count (each shard runs the kernel locally)")
        from pvderx.env.vector import _warn_scan_fallback
        if window == "auto":
            # an explicit window='scan' is not a fallback — don't cry wolf
            _warn_scan_fallback(n, mesh)
        window, n_loc = "scan", n
    blk = _effective_block(n_loc, block, cap=block)
    if _use_pallas(window, n_loc, blk):
        from pvderx.ops.window import (
            P_FIELDS, U_FIELDS, pack_struct, rk4_fleet_window_batch)
        cfg, m = fc.base, fc.m
        t, fu, mppt = jax.vmap(
            lambda s, a: _pre_window(fc, s, a))(state, actions)
        kern = _p(rk4_fleet_window_batch,
                  n_ph=cfg.der.n_ph, m=m, n_sub=cfg.n_sub, dt=cfg.dt_ctrl,
                  block=blk,
                  interpret=jax.default_backend() == "cpu")
        if mesh is not None:
            kern = _shard_mapped_window(kern, mesh, n_args_rank2=2)
        y1 = kern(state.y, t, pack_struct(state.der, P_FIELDS),
                  pack_struct(fu, U_FIELDS))
        out = jax.vmap(
            lambda s, e, mp, tt, yy: _post_window(fc, s, e, mp, tt, yy),
        )(state, fu, mppt, t, y1)
    else:
        out = jax.vmap(lambda s, a: step(fc, s, a))(state, actions)

    st1, obs, reward, done, info = out
    if not autoreset:
        return st1, obs, reward, done, info
    st_r, obs_r = jax.vmap(lambda s: _soft_reset(fc, s))(st1)
    from functools import partial as _partial
    st2 = jax.tree.map(_partial(_where_done, done), st_r, st1)
    obs2 = _where_done(done, obs_r, obs)
    return st2, obs2, reward, done, info


def make_fleet_batch_fns(fc: FleetConfig, autoreset: bool = True,
                         donate: bool = True, window: str = "auto",
                         block: int = 1024, mesh=None):
    """Batched fleet env: (reset_batch(keys), step_batch(state, actions)).

    window: "auto" | "pallas" | "scan" — pallas uses the fused rank-4 fleet
    window kernel (ops/window.rk4_fleet_window_batch); scan is the vmapped
    per-env `lax.scan` RK4 over the stacked [M*n_states] system. Both share
    the identical physics core. mesh: optional Mesh with an 'env' axis for
    the shard_map'd multi-chip kernel path (pvderx/env/vector.py)."""
    from functools import partial as _partial

    @jax.jit
    def reset_batch(keys):
        return jax.vmap(lambda k: reset(fc, k))(keys)

    @_partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_batch(state, actions):
        return _step_batch_impl(fc, state, actions, window=window,
                                block=block, autoreset=autoreset, mesh=mesh)

    return reset_batch, step_batch


def _soft_reset(fc: FleetConfig, st: FleetState):
    """Episode restart from the cached steady state + initial observation
    (no algebra evaluation — runs every batched step under the autoreset
    select, same design as env.core._soft_reset)."""
    cfg, m = fc.base, fc.m
    dtype = st.y.dtype
    k_ev, k_next = jax.random.split(st.key)
    sched = env_core._sample_events(k_ev, cfg, st.s0, st.tc0, dtype)
    from pvderx.scenario.mppt_voltvar import MPPTState
    st2 = replace(
        st, sched=sched, y=st.y0, t_step=jnp.zeros((), jnp.int32),
        vdc_ref=jnp.ones((m,), dtype), q_ref=jnp.zeros((m,), dtype),
        rt=RideThroughState(timers=jnp.zeros((m, 6), dtype),
                            tripped=jnp.zeros((m,), dtype),
                            ces=jnp.zeros((m,), dtype)),
        mppt=MPPTState(p_prev=st.ppv0, direction=jnp.ones((m,), dtype)),
        key=k_next)
    return st2, st.obs0
