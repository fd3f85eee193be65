"""Independent numpy oracle for the SUPERVISORY layer — no env.core imports.

`scipy_ref.run_episode` validates the episode contract but reuses the env's
own `_pre_window`/`_post_window`, so a bug in the shared supervisory /
observation / reward code is invisible to it (round-3 verdict, "missing #2").
This module re-implements the whole control-step supervisory loop from the
frozen spec (SPEC.md §8-§9) in plain numpy with ordinary `if` statements:

- event-table lookup (reference analog: `SimulationEvents` query-by-time,
  SURVEY.md §2.1 #5) — `np.searchsorted` instead of the env's one-hot mask;
- IEEE-1547 ride-through zone timers + trip latch + momentary cessation
  (SURVEY.md §2.1 #8) — explicit per-zone ifs instead of masked arithmetic;
- MPPT perturb-&-observe and Volt-VAR droop (SURVEY.md §2.1 #8);
- action application, observation assembly, reward, termination
  (the gym contract, SURVEY.md §2.4).

It deliberately imports NOTHING from `pvderx.env` or `pvderx.scenario`; the
only shared code is the physics core (`physics.rhs_core` with the numpy
backend), which has its own independent C++ twin pinned to 1e-12
(tests/test_native.py), and the LSODA window integrator from `scipy_ref`.
The env's `EnvConfig`/`EnvState` objects are read as plain data (attribute
access only). Pinned against `env.core.step` episodes across randomized
scenarios in tests/test_supervisory_oracle.py.
"""
from __future__ import annotations

import numpy as np

from pvderx.oracle import scipy_ref
from pvderx.params import Exog
from pvderx.physics import rhs_core

# ride-through zone order (SPEC.md §8): [LV1, LV2, HV1, HV2, LF, HF]
_N_ZONES = 6
# Volt-VAR droop knots (SPEC.md §8)
_VV_V = (0.92, 0.98, 1.02, 1.08)
# MPPT P&O constants (SPEC.md §8 defaults)
_MPPT_DV, _MPPT_LO, _MPPT_HI = 0.005, 0.7, 1.2
# P&O deadband — MUST mirror scenario.mppt_voltvar.MPPT_DEADBAND (the
# oracle independence rule forbids importing it); pinned by
# tests/test_supervisory_oracle.py's mppt feature episodes.
_MPPT_DEADBAND = 1e-6

OBS_DIM = 13


def _active_row(table: np.ndarray, t: float) -> np.ndarray:
    """Last row with table[:, 0] <= t (row 0 is the t=0 baseline)."""
    idx = int(np.searchsorted(table[:, 0], t, side="right")) - 1
    if idx < 0:
        raise ValueError(f"no event row active at t={t}")
    return table[idx]


def _exog_at(sched, t: float, vdc_ref: float, q_ref: float, conn: float,
             ces: float) -> Exog:
    """ZOH exogenous inputs for the window starting at t (SPEC.md §3)."""
    s = _active_row(np.asarray(sched.solar, np.float64), t)
    g = _active_row(np.asarray(sched.grid, np.float64), t)
    l = _active_row(np.asarray(sched.load, np.float64), t)
    z = np.float64(0.0)
    return Exog(
        s_irr=s[1], t_cell=s[2],
        v_g=g[1], phi_g=g[2], dw_g=g[3], t_g=g[0], v_g2=g[4], phi_g2=g[5],
        g_load=l[1], b_load=l[2],
        vdc_ref=np.float64(vdc_ref), q_ref=np.float64(q_ref),
        conn=np.float64(conn), ces=np.float64(ces), p_ref=z,
    )


class _RideThrough:
    """Zone timers + latch with ordinary control flow (SPEC.md §8)."""

    def __init__(self, rtp, timers=None, tripped=0.0, ces=0.0):
        self.v_lv1 = float(rtp.v_lv1)
        self.v_lv2 = float(rtp.v_lv2)
        self.v_hv1 = float(rtp.v_hv1)
        self.v_hv2 = float(rtp.v_hv2)
        self.f_lf = float(rtp.f_lf)
        self.f_hf = float(rtp.f_hf)
        self.t_lim = np.asarray(rtp.t_lim, np.float64)
        self.enable = np.asarray(rtp.enable, np.float64)
        self.timers = (np.zeros(_N_ZONES) if timers is None
                       else np.asarray(timers, np.float64).copy())
        self.tripped = float(tripped)
        self.ces = float(ces)

    def update(self, v_mag: float, f_meas: float, dt: float) -> float:
        """Advance one control step; returns trip_now (0/1)."""
        in_zone = [
            v_mag < self.v_lv1,
            v_mag < self.v_lv2,
            v_mag > self.v_hv1,
            v_mag > self.v_hv2,
            f_meas < self.f_lf,
            f_meas > self.f_hf,
        ]
        trip_now = 0.0
        for i in range(_N_ZONES):
            if in_zone[i] and self.enable[i] > 0.0:
                self.timers[i] += dt
                if self.timers[i] > self.t_lim[i]:
                    trip_now = 1.0
            else:
                self.timers[i] = 0.0
        was = self.tripped
        if trip_now:
            self.tripped = 1.0
        self.ces = 1.0 if (in_zone[1] and self.enable[1] > 0.0) else 0.0
        return self.tripped * (1.0 - was)


def _voltvar_qref(v_mag: float, q_max: float) -> float:
    return float(np.interp(v_mag, _VV_V, [q_max, 0.0, 0.0, -q_max]))


def _algebra(y, t, der_np, exog):
    return rhs_core.algebra(np.asarray(y, np.float64), float(t), der_np,
                            exog, np)


def run_episode_independent(cfg, state, actions, rtol=scipy_ref.RTOL,
                            atol=scipy_ref.ATOL):
    """Replay a fixed-seed episode from a reset state, fully independently.

    cfg / state are the env's config and `reset` output, read as plain data
    (scenario tables, initial state vector, DER params). Every supervisory
    decision — event lookup, setpoint nudges, Volt-VAR, MPPT, ride-through,
    observation, reward, termination — is recomputed by THIS module; the
    window integration is LSODA at truth tolerances. Returns
    (obs [T, OBS_DIM], rewards [T], dones [T]) like `scipy_ref.run_episode`.
    """
    import jax

    to_np = lambda tree: jax.tree.map(lambda x: np.asarray(x, np.float64),
                                      tree)
    der = to_np(state.der)
    sched = to_np(state.sched)
    dt = float(cfg.dt_ctrl)
    horizon = int(cfg.horizon)
    n_ph = int(cfg.der.n_ph)
    s0 = float(state.s0)

    y = np.asarray(state.y, np.float64).copy()
    vdc_ref = float(state.vdc_ref)
    q_ref = float(state.q_ref)
    rt = _RideThrough(to_np(cfg.rt), timers=state.rt.timers,
                      tripped=float(state.rt.tripped),
                      ces=float(state.rt.ces))
    mppt_p_prev = float(state.mppt.p_prev)
    mppt_dir = float(state.mppt.direction)
    t_step = int(state.t_step)

    obs_l, rew_l, done_l = [], [], []
    for a in np.asarray(actions):
        t = t_step * dt
        # 1. action -> setpoint nudges (SPEC §9); auto-controlled fields
        #    ignore the agent
        flag = 0.0
        if cfg.continuous:
            # continuous extension: action [2] in [-1,1] scales the deltas
            av = np.clip(np.asarray(a, np.float64), -1.0, 1.0)
            dq = cfg.dq_action * av[0]
            dv = cfg.dv_action * av[1]
        else:
            a = int(a)
            dq = cfg.dq_action * ((a == 1) - (a == 2))
            dv = cfg.dv_action * ((a == 3) - (a == 4))
            if cfg.anomaly_detect and a == 5:
                flag = 1.0
        if not cfg.voltvar_enable:
            q_ref = float(np.clip(q_ref + dq, cfg.q_lo, cfg.q_hi))
        if not cfg.mppt_enable:
            vdc_ref = float(np.clip(vdc_ref + dv, cfg.v_lo, cfg.v_hi))

        # 2. supervisory layer at window start (ZOH over the window)
        conn = 1.0 - rt.tripped
        exog = _exog_at(sched, t, vdc_ref, q_ref, conn, rt.ces)
        if cfg.voltvar_enable or cfg.mppt_enable:
            g0 = _algebra(y, t, der, exog)
            if cfg.voltvar_enable:
                v_mag0 = float(np.hypot(g0.v_pos.re, g0.v_pos.im))
                q_ref = _voltvar_qref(v_mag0, float(cfg.q_vv))
            if cfg.mppt_enable:
                # P&O, active once every n_mppt control steps (SPEC §8)
                p_pv = float(g0.p_pv)
                if t_step % int(cfg.n_mppt) == 0:
                    new_dir = (mppt_dir if (p_pv - mppt_p_prev)
                               >= -_MPPT_DEADBAND else -mppt_dir)
                    vdc_ref = float(np.clip(vdc_ref + _MPPT_DV * new_dir,
                                            _MPPT_LO, _MPPT_HI))
                    mppt_p_prev, mppt_dir = p_pv, new_dir
            exog = Exog(**{**{f: getattr(exog, f) for f in
                              exog.__dataclass_fields__},
                           "vdc_ref": np.float64(vdc_ref),
                           "q_ref": np.float64(q_ref)})

        # 3. integrate the window (LSODA truth)
        y = scipy_ref.integrate_window(y, t, dt, der, exog, rtol, atol)

        # 4. post-window measurements + ride-through
        g1 = _algebra(y, t + dt, der, exog)
        v_mag1 = float(np.hypot(g1.v_pos.re, g1.v_pos.im))
        trip_now = rt.update(v_mag1, float(g1.f_meas), dt)
        t_step += 1

        # 5. observation (SPEC §9; conn column reflects the post-step status)
        obs = np.array([
            g1.i_pos.re, g1.i_pos.im, g1.v_pos.re, g1.v_pos.im,
            y[6 * n_ph],
            g1.p_pcc, g1.q_pcc,
            vdc_ref, q_ref,
            exog.s_irr / 1000.0,
            10.0 * (float(g1.f_meas) - 1.0),
            t_step / horizon,
            1.0 - rt.tripped,
        ], np.float64)

        # reward (SPEC §9)
        vdc = float(y[6 * n_ph])
        band = max(v_mag1 - 1.05, 0.0) + max(0.95 - v_mag1, 0.0)
        reward = (cfg.r_alive
                  - cfg.w_vdc * abs(vdc - vdc_ref)
                  - cfg.w_q * abs(float(g1.q_pcc) - q_ref)
                  - cfg.w_vband * band
                  - cfg.r_trip * trip_now)
        if cfg.anomaly_detect:
            # ground truth: any injected deviation from the t=0 baseline
            anom = 1.0 if (abs(exog.v_g - 1.0) > 1e-6
                           or exog.v_g2 > 1e-9
                           or abs(exog.dw_g) > 1e-9
                           or abs(exog.s_irr - s0) > 1e-3
                           or exog.g_load > 1e-9
                           or abs(exog.b_load) > 1e-9) else 0.0
            reward += (flag * (anom * cfg.r_anom_tp
                               - (1.0 - anom) * cfg.r_anom_fp)
                       - (1.0 - flag) * anom * cfg.r_anom_fn)

        terminated = rt.tripped > 0.5
        truncated = t_step >= horizon
        done = bool(terminated or truncated)
        obs_l.append(obs)
        rew_l.append(float(reward))
        done_l.append(done)
        if done:
            break
    return np.stack(obs_l), np.asarray(rew_l), np.asarray(done_l)


def _integrate_fleet_window(y, t0, dt, der, fu, rtol, atol):
    """LSODA over the stacked [M*n_s] fleet system (shared-feeder coupling
    via physics.fleet.fleet_rhs — physics core, not supervisory code)."""
    from scipy.integrate import solve_ivp

    from pvderx.physics import fleet as fl

    m, n_s = y.shape
    sol = solve_ivp(
        lambda t, yy: fl.fleet_rhs(yy.reshape(m, n_s), t, der, fu,
                                   np).reshape(-1),
        (t0, t0 + dt), y.reshape(-1), method="LSODA", rtol=rtol, atol=atol)
    if not sol.success:
        raise RuntimeError(f"fleet oracle LSODA failed at t0={t0}")
    return sol.y[:, -1].reshape(m, n_s)


def run_fleet_episode_independent(fc, state, actions, rtol=scipy_ref.RTOL,
                                  atol=scipy_ref.ATOL):
    """Independent replay of a FLEET episode (BASELINE config 5 supervisory
    layer, SPEC.md §11): shared event fields with per-unit insolation
    scaling, per-unit ride-through driven by the common PCC voltage
    magnitude, common Volt-VAR setpoint from unit 0's PCC voltage, per-unit
    MPPT, fleet-mean reward, termination when ALL units trip. Two control
    granularities (pvderx/env/fleet.py docstring): aggregate
    (actions [T] ints applied fleet-wide, Box(13) obs) and per-unit
    (fc.per_unit: actions [T, M], obs appends the [M× Vdc | M× P | M× Q |
    M× conn] block). Same independence rules as `run_episode_independent`.
    """
    import jax

    from pvderx.physics import fleet as fl

    to_np = lambda tree: jax.tree.map(lambda x: np.asarray(x, np.float64),
                                      tree)
    cfg, m = fc.base, fc.m
    der = to_np(state.der)                    # [M] leaves
    sched = to_np(state.sched)
    s_scale = np.asarray(state.s_scale, np.float64)
    dt = float(cfg.dt_ctrl)
    horizon = int(cfg.horizon)
    n_ph = int(cfg.der.n_ph)

    y = np.asarray(state.y, np.float64).copy()           # [M, n_s]
    vdc_ref = np.asarray(state.vdc_ref, np.float64).copy()
    q_ref = np.asarray(state.q_ref, np.float64).copy()
    rtp = to_np(cfg.rt)
    timers = np.asarray(state.rt.timers, np.float64).copy()   # [M, 6]
    tripped = np.asarray(state.rt.tripped, np.float64).copy()  # [M]
    ces = np.asarray(state.rt.ces, np.float64).copy()
    mppt_p_prev = np.asarray(state.mppt.p_prev, np.float64).copy()
    mppt_dir = np.asarray(state.mppt.direction, np.float64).copy()
    t_step = int(state.t_step)

    def fleet_exog(t, vdc_ref, q_ref, conn, ces):
        s = _active_row(np.asarray(sched.solar, np.float64), t)
        g = _active_row(np.asarray(sched.grid, np.float64), t)
        l = _active_row(np.asarray(sched.load, np.float64), t)
        full = lambda v: np.full((m,), v, np.float64)
        return Exog(
            s_irr=s[1] * s_scale, t_cell=full(s[2]),
            v_g=full(g[1]), phi_g=full(g[2]), dw_g=full(g[3]),
            t_g=full(g[0]), v_g2=full(g[4]), phi_g2=full(g[5]),
            g_load=full(l[1]), b_load=full(l[2]),
            vdc_ref=vdc_ref, q_ref=q_ref, conn=conn, ces=ces,
            p_ref=np.zeros(m))

    per_unit = bool(getattr(fc, "per_unit", False))
    obs_l, rew_l, done_l = [], [], []
    for a in np.asarray(actions):
        t = t_step * dt
        # aggregate: scalar broadcast; per-unit: [M] elementwise — numpy
        # broadcasting makes the setpoint update below identical code
        a = np.asarray(a, np.int64) if per_unit else int(a)
        # 1. action -> per-unit setpoints (eq() handles both the scalar
        # aggregate action and the per-unit [M] array — numpy bools can't
        # subtract, floats can)
        eq = lambda v: np.asarray(a == v, np.float64)
        if not cfg.voltvar_enable:
            dq = cfg.dq_action * (eq(1) - eq(2))
            q_ref = np.clip(q_ref + dq, cfg.q_lo, cfg.q_hi)
        if not cfg.mppt_enable:
            dv = cfg.dv_action * (eq(3) - eq(4))
            vdc_ref = np.clip(vdc_ref + dv, cfg.v_lo, cfg.v_hi)

        # 2. supervisory layer at window start
        conn = 1.0 - tripped
        fu = fleet_exog(t, vdc_ref, q_ref, conn, ces)
        if cfg.voltvar_enable or cfg.mppt_enable:
            g0 = fl.fleet_algebra(y, t, der, fu, np)
            if cfg.voltvar_enable:
                v0 = float(np.hypot(g0.v_pos.re[0], g0.v_pos.im[0]))
                q_ref = np.full((m,), _voltvar_qref(v0, float(cfg.q_vv)))
            if cfg.mppt_enable and t_step % int(cfg.n_mppt) == 0:
                for j in range(m):
                    p_pv = float(g0.p_pv[j])
                    new_dir = (mppt_dir[j]
                               if p_pv - mppt_p_prev[j] >= -_MPPT_DEADBAND
                               else -mppt_dir[j])
                    vdc_ref[j] = float(np.clip(
                        vdc_ref[j] + _MPPT_DV * new_dir, _MPPT_LO, _MPPT_HI))
                    mppt_p_prev[j], mppt_dir[j] = p_pv, new_dir
            fu = Exog(**{**{f: getattr(fu, f) for f in
                            fu.__dataclass_fields__},
                         "vdc_ref": vdc_ref, "q_ref": q_ref})

        # 3. integrate the coupled window (LSODA truth)
        y = _integrate_fleet_window(y, t, dt, der, fu, rtol, atol)

        # 4. per-unit ride-through on the COMMON PCC voltage magnitude
        g1 = fl.fleet_algebra(y, t + dt, der, fu, np)
        v_mag1 = float(np.hypot(g1.v_pos.re[0], g1.v_pos.im[0]))
        was = tripped.copy()
        for j in range(m):
            rt_j = _RideThrough(rtp, timers=timers[j], tripped=tripped[j],
                                ces=ces[j])
            rt_j.update(v_mag1, float(g1.f_meas[j]), dt)
            timers[j], tripped[j], ces[j] = rt_j.timers, rt_j.tripped, rt_j.ces
        trip_now = float(np.mean(tripped * (1.0 - was)))
        t_step += 1

        # 5. aggregate observation + fleet-mean reward (SPEC §11)
        obs = np.array([
            np.mean(g1.i_pos.re), np.mean(g1.i_pos.im),
            g1.v_pos.re[0], g1.v_pos.im[0],
            np.mean(y[:, 6 * n_ph]),
            np.mean(g1.p_pcc), np.mean(g1.q_pcc),
            np.mean(vdc_ref), np.mean(q_ref),
            np.mean(fu.s_irr) / 1000.0,
            10.0 * (np.mean(g1.f_meas) - 1.0),
            t_step / horizon,
            np.mean(1.0 - tripped),
        ], np.float64)
        if per_unit:
            obs = np.concatenate([
                obs, y[:, 6 * n_ph], g1.p_pcc, g1.q_pcc, 1.0 - tripped])
        band = max(v_mag1 - 1.05, 0.0) + max(0.95 - v_mag1, 0.0)
        reward = (cfg.r_alive
                  - cfg.w_vdc * abs(float(np.mean(y[:, 6 * n_ph]))
                                    - float(np.mean(vdc_ref)))
                  - cfg.w_q * abs(float(np.mean(g1.q_pcc))
                                  - float(np.mean(q_ref)))
                  - cfg.w_vband * band
                  - cfg.r_trip * trip_now)
        terminated = float(np.min(tripped)) > 0.5
        truncated = t_step >= horizon
        done = bool(terminated or truncated)
        obs_l.append(obs)
        rew_l.append(float(reward))
        done_l.append(done)
        if done:
            break
    return np.stack(obs_l), np.asarray(rew_l), np.asarray(done_l)
