"""Unit tests for events, ride-through, MPPT, Volt-VAR (SURVEY.md §4 item 2)."""
import jax
import jax.numpy as jnp
import numpy as np

from pvderx.scenario import (
    EventBuilder, active_row, rt_init, rt_update, mppt_init, mppt_update,
    voltvar_qref,
)
from pvderx.scenario.ride_through import default_rt_params


def test_event_lookup_matches_searchsorted():
    ev = EventBuilder(s_irr=900.0)
    ev.add_solar_event(2.0, 500.0)
    ev.add_solar_event(5.0, 1000.0)
    sched = ev.build(dtype=np.float64)
    tbl = np.asarray(sched.solar)
    for t in [0.0, 1.99, 2.0, 2.01, 4.0, 5.0, 100.0]:
        idx = np.searchsorted(tbl[:, 0], t, side="right") - 1
        row = np.asarray(active_row(sched.solar, jnp.float64(t)))
        np.testing.assert_allclose(row, tbl[idx])


def test_event_builder_api():
    ev = EventBuilder()
    ev.add_grid_event(1.0, v=0.5)
    ev.add_grid_event(1.5)          # recovery
    ev.add_load_event(3.0, g_load=0.2)
    sched = ev.build()
    assert float(active_row(sched.grid, 1.2)[1]) == 0.5
    assert float(active_row(sched.grid, 2.0)[1]) == 1.0
    assert float(active_row(sched.load, 4.0)[1]) == np.float32(0.2)
    ev.remove_grid_event(1.0)
    sched2 = ev.build()
    assert float(active_row(sched2.grid, 1.2)[1]) == 1.0
    # reset() drops all scripted events, keeps the t=0 baselines
    ev.add_solar_event(2.0, 500.0)
    ev.reset()
    sched3 = ev.build()
    assert float(active_row(sched3.solar, 5.0)[1]) == 1000.0
    assert float(active_row(sched3.grid, 5.0)[1]) == 1.0
    assert float(active_row(sched3.load, 5.0)[1]) == 0.0


def test_ride_through_timers_and_latch():
    rtp = default_rt_params()
    rt = rt_init(jnp.float64)
    dt = 1.0 / 60.0
    # LV2 zone (v=0.4): cessation immediately, trip after 1.0 s
    steps_to_trip = int(1.0 / dt) + 1
    for k in range(steps_to_trip + 1):
        rt = rt_update(rt, rtp, jnp.float64(0.4), jnp.float64(1.0), dt)
        if k == 0:
            assert float(rt.ces) == 1.0 and float(rt.tripped) == 0.0
    assert float(rt.tripped) == 1.0
    # recovery does not un-latch; cessation clears
    rt = rt_update(rt, rtp, jnp.float64(1.0), jnp.float64(1.0), dt)
    assert float(rt.tripped) == 1.0 and float(rt.ces) == 0.0


def test_ride_through_zone_reset():
    rtp = default_rt_params()
    rt = rt_init(jnp.float64)
    dt = 0.1
    for _ in range(9):  # 0.9 s in LV1 (limit 3 s) — no trip
        rt = rt_update(rt, rtp, jnp.float64(0.8), jnp.float64(1.0), dt)
    assert float(rt.tripped) == 0.0 and float(rt.timers[0]) > 0.8
    rt = rt_update(rt, rtp, jnp.float64(1.0), jnp.float64(1.0), dt)
    assert float(rt.timers[0]) == 0.0  # timer resets out of zone


def test_ride_through_disabled():
    rtp = default_rt_params(enabled=False)
    rt = rt_init(jnp.float64)
    for _ in range(100):
        rt = rt_update(rt, rtp, jnp.float64(0.2), jnp.float64(0.9), 1.0)
    assert float(rt.tripped) == 0.0


def test_mppt_climbs_to_peak():
    """P&O on a synthetic parabola peaking at Vdc=1.0 climbs from 0.9."""
    ms = mppt_init(dtype=jnp.float64)
    vref = jnp.float64(0.90)
    for k in range(400):
        p = 1.0 - (vref - 1.0) ** 2 * 10.0  # synthetic P(V)
        ms, vref = mppt_update(ms, vref, p, k, n_mppt=1, dv=0.005)
    assert abs(float(vref) - 1.0) < 0.02


def test_voltvar_curve():
    q = lambda v: float(voltvar_qref(jnp.float64(v), 0.44))
    assert q(0.85) == 0.44          # full boost below 0.92
    assert q(1.00) == 0.0           # deadband
    assert q(1.15) == -0.44         # full absorb above 1.08
    assert 0.0 < q(0.95) < 0.44     # linear region
    assert abs(q(0.95) - 0.22) < 1e-9
