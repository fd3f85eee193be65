"""Standalone dynamic simulation — the non-gym validation workflow.

Reference analog: `DynamicSimulation` (SURVEY.md §2.1 #3,
`[pvder:pvder/dynamic_simulation.py]` — unverified upstream path): owns the
solve loop over a time horizon, collects the trajectory series
(`t_t, Vdc_t, ia_t, ma_t, vta_t, S_t, S_PCC_t, ...`), and supports stepwise
("loop mode") use. pvderx implements the same surface as one `lax.scan` over
control windows with the full supervisory layer (events, ride-through, MPPT,
Volt-VAR) applied between windows — identical semantics to the RL env's step,
minus actions/reward.

The scipy twin of this workflow is `pvderx.oracle.scipy_ref.run_trajectory`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pvderx._pytree import replace
from pvderx.env import core as env_core
from pvderx.env.core import EnvConfig, make_env_config
from pvderx.ode import newton_solve
from pvderx.physics import rhs_core
from pvderx.scenario.events import EventBuilder, EventSchedule, make_exog
from pvderx.scenario.mppt_voltvar import mppt_init
from pvderx.scenario.ride_through import rt_init


def init_from_schedule(cfg: EnvConfig, sched: EventSchedule,
                       vdc_ref: float = 1.0, q_ref: float = 0.0):
    """Steady-state init against the schedule's t=0 baseline (SPEC.md §7)."""
    dtype = cfg.der.rf.dtype
    vdc_ref = jnp.asarray(vdc_ref, dtype)
    q_ref = jnp.asarray(q_ref, dtype)
    exog0 = make_exog(sched, jnp.zeros((), dtype), vdc_ref, q_ref,
                      jnp.ones((), dtype), jnp.zeros((), dtype))
    f = lambda y: rhs_core.rhs(y, jnp.zeros((), dtype), cfg.der, exog0, jnp)
    y0, res = newton_solve(f, rhs_core.steady_state_guess(cfg.der, exog0, jnp))
    g = rhs_core.algebra(y0.astype(dtype), jnp.zeros((), dtype), cfg.der, exog0, jnp)
    s0 = exog0.s_irr
    st = env_core.EnvState(
        der=cfg.der, sched=sched, y=y0.astype(dtype),
        t_step=jnp.zeros((), jnp.int32), vdc_ref=vdc_ref, q_ref=q_ref,
        rt=rt_init(dtype), mppt=mppt_init(g.p_pv, dtype),
        key=jax.random.PRNGKey(0), init_res=jnp.asarray(res, dtype),
        y0=y0.astype(dtype),
        s0=s0, tc0=exog0.t_cell,
        # standalone sims never auto-reset; the cached-obs fields are unused
        obs0=jnp.zeros((env_core.OBS_DIM,), dtype),
        ppv0=jnp.asarray(g.p_pv, dtype),
    )
    return st, res


def simulate(cfg: EnvConfig, sched: EventSchedule, n_steps: int,
             vdc_ref: float = 1.0, q_ref: float = 0.0):
    """Run n_steps control windows, collecting the full series (jitted scan).

    Returns a dict of [n_steps(+1)]-shaped series: t, y (states), vdc, v_mag,
    p_pcc, q_pcc, p_pv, f_meas, m_mag, tripped — the reference's collected
    trajectory surface.
    """
    st0, _ = init_from_schedule(cfg, sched, vdc_ref, q_ref)

    def body(st, _):
        st1, obs, reward, done, info = env_core.step(cfg, st, jnp.int32(0))
        n = cfg.der.n_ph
        t = st1.t_step.astype(st1.y.dtype) * cfg.dt_ctrl
        exog = make_exog(st1.sched, t, st1.vdc_ref, st1.q_ref,
                         1.0 - st1.rt.tripped, st1.rt.ces)
        g = rhs_core.algebra(st1.y, t, st1.der, exog, jnp)
        m_mag = jnp.max(jnp.hypot(g.m.re, g.m.im))
        out = dict(t=t, y=st1.y, vdc=info["vdc"], v_mag=info["v_mag"],
                   p_pcc=info["p_pcc"], q_pcc=info["q_pcc"], p_pv=info["p_pv"],
                   f_meas=info["f_meas"], m_mag=m_mag,
                   i_mag=jnp.max(jnp.hypot(g.i.re, g.i.im)),
                   tripped=st1.rt.tripped)
        return st1, out

    st, series = jax.lax.scan(body, st0, None, length=n_steps)
    return st, series


class DynamicSimulation:
    """Host-side convenience wrapper mirroring the reference's class surface."""

    def __init__(self, preset: str = "10", events: EventBuilder | None = None,
                 tStop: float = 10.0, dtype=None, **cfg_kw):
        self.events = events if events is not None else EventBuilder()
        self.tStop = float(tStop)
        if dtype is None:  # oracle-grade f64 when x64 is on, else f32
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.cfg = make_env_config(preset, dtype=dtype, **cfg_kw)
        self.series = None
        self.state = None

    @property
    def n_steps(self) -> int:
        return int(round(self.tStop / self.cfg.dt_ctrl))

    def run_simulation(self, vdc_ref: float = 1.0, q_ref: float = 0.0):
        sched = self.events.build(dtype=np.dtype(self.cfg.der.rf.dtype).type)
        run = jax.jit(lambda: simulate(self.cfg, sched, self.n_steps,
                                       vdc_ref, q_ref))
        self.state, series = run()
        self.series = {k: np.asarray(v) for k, v in series.items()}
        return self.series

    # reference-style collected-series accessors (t_t, Vdc_t, ...)
    def __getattr__(self, name):
        if name.endswith("_t") and self.__dict__.get("series") is not None:
            key = name[:-2].lower()
            if key in self.series:
                return self.series[key]
        raise AttributeError(name)

    def show_PV_DER_states(self):
        """Pretty-print the current state (reference: PVDER_ModelUtilities'
        `show_PV_DER_states`; formatting in pvderx/utils/printing.py)."""
        if self.state is None:
            print("simulation not run")
            return
        from pvderx.utils import show_states

        t = float(self.state.t_step) * self.cfg.dt_ctrl
        exog = make_exog(self.state.sched, jnp.asarray(t, self.state.y.dtype),
                         self.state.vdc_ref, self.state.q_ref,
                         1.0 - self.state.rt.tripped, self.state.rt.ces)
        show_states(self.state.y, self.cfg.der, exog, t)
        print(f"  tripped={float(self.state.rt.tripped) > 0.5}")
