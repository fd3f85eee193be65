"""Standalone sim, plotting, metrics, checkpoint/resume tests (SURVEY §4/§5)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx.diag import MetricsLogger, SimulationResults
from pvderx.scenario import EventBuilder
from pvderx.sim import DynamicSimulation


@pytest.fixture(scope="module")
def sim_series():
    ev = EventBuilder()
    ev.add_solar_event(1.0, 500.0)
    ev.add_grid_event(2.0, v=0.7)
    ev.add_grid_event(2.4)
    sim = DynamicSimulation("10", events=ev, tStop=3.0, dtype=jnp.float64)
    series = sim.run_simulation()
    return sim, series


def test_dynamic_simulation_series(sim_series):
    sim, series = sim_series
    assert series["t"].shape == (180,)
    # cloud event halves insolation -> P roughly halves
    p_before = series["p_pcc"][50]
    p_after = series["p_pcc"][170]
    assert p_after < 0.7 * p_before
    # sag visible in |V|
    i_sag = np.searchsorted(series["t"], 2.2)
    assert series["v_mag"][i_sag] < 0.8
    assert series["tripped"][-1] == 0.0
    # reference-style accessors
    assert np.array_equal(sim.Vdc_t, series["vdc"])
    assert np.array_equal(sim.t_t, series["t"])


def test_sim_matches_oracle(sim_series):
    """The standalone sim equals the scipy oracle on the same schedule —
    the SURVEY §3.4 validation workflow, end to end with supervisory layer off
    ... ride-through enabled but not triggered here."""
    import dataclasses
    from pvderx.oracle import scipy_ref
    from pvderx.params import make_params, nominal_exog

    sim, series = sim_series
    p = make_params("10")
    u = nominal_exog()
    exogs = []
    for k in range(180):
        t = k / 60.0
        uu = u
        if t >= 1.0:
            uu = dataclasses.replace(uu, s_irr=500.0)
        if 2.0 <= t < 2.4:
            uu = dataclasses.replace(uu, v_g=0.7)
        exogs.append(uu)
    traj = scipy_ref.run_trajectory(p, exogs)
    ys = np.stack([series["y"][k] for k in range(180)])
    err = np.max(np.abs(ys - traj[1:]))
    assert err < 1e-6, f"sim vs oracle max-abs-err {err:.3e}"


def test_show_states_and_plots(sim_series, tmp_path):
    sim, series = sim_series
    sim.show_PV_DER_states()
    res = SimulationResults(series)
    for pt in ("power", "voltage", "current", "duty_cycle", "frequency", "dc",
               "all"):
        path = res.plot_DER_simulation(pt, save_path=str(tmp_path / f"{pt}.png"))
        assert os.path.getsize(path) > 1000
    with pytest.raises(ValueError):
        res.plot_DER_simulation("nope")


def test_profiler_compile_report_and_stopwatch():
    from pvderx.diag import Stopwatch, compile_report
    f = lambda x: jnp.sum(x * x)
    rep = compile_report(f, jnp.ones((128, 128), jnp.float32))
    assert rep["compile_s"] > 0
    step = jax.jit(lambda s: (s + 1.0,))
    sw = Stopwatch(step, jnp.zeros((8,), jnp.float32))
    assert sw.rate(reps=3, items_per_call=8) > 0
    assert float(sw.state[0]) >= 2.0  # state actually advanced (chained)


def test_force_sync_returns_derived_scalar():
    """force_sync must fetch a value computed FROM the output (the round-4
    sync contract: a host fetch is the only barrier that cannot return
    before execution — jax.block_until_ready provably no-ops on the axon
    remote-dispatch platform)."""
    from pvderx.diag.profiler import force_sync

    x = jax.jit(lambda a: a * 2.0)(jnp.arange(4, dtype=jnp.float32))
    assert force_sync(x) == pytest.approx(12.0)   # sum(0,2,4,6)
    # pytrees: reduces the first leaf
    tree = {"a": jnp.ones((3,)), "b": jnp.zeros((2,))}
    assert force_sync(tree) == pytest.approx(3.0)


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(path)
    ml.write(0, {"loss": jnp.float32(1.5), "reward": 0.25})
    ml.write(1, {"loss": jnp.float32(1.2), "reward": 0.5})
    ml.close()
    import json
    recs = [json.loads(l) for l in open(path)]
    assert recs[1]["loss"] == pytest.approx(1.2)
    assert recs[0]["step"] == 0


def test_checkpoint_resume_bitwise(tmp_path):
    """Save/restore the full PPORunner; continued training is bitwise equal."""
    from pvderx.diag import checkpoint
    from pvderx.env import make_env_config
    from pvderx.learn import PPOConfig, make_ppo

    cfg = make_env_config("10", horizon=20, n_sub=40)
    ppo = PPOConfig(rollout_len=4, n_epochs=1, n_minibatch=1)
    init_runner, train_step, _ = make_ppo(cfg, ppo)
    runner = init_runner(jax.random.PRNGKey(0), 8)
    ts = jax.jit(train_step)
    runner, _ = ts(runner)

    path = str(tmp_path / "ckpt")
    checkpoint.save(path, runner)
    restored = checkpoint.restore(path, jax.tree.map(lambda x: x, runner))

    r1, m1 = ts(runner)
    r2, m2 = ts(restored)
    for a, b in zip(jax.tree.leaves(r1), jax.tree.leaves(r2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m2["loss"])


def test_checked_step_catches_nan():
    """Sanitizer analog (SURVEY §5): checkify reifies bad states under jit."""
    from pvderx.diag.debug import checked_step
    from pvderx.env import core, make_env_config

    cfg = make_env_config("10", n_sub=40)
    st, _ = core.reset(cfg, jax.random.PRNGKey(0))
    step = jax.jit(checked_step(cfg))
    err, out = step(st, jnp.int32(0))
    err.throw()  # clean step: no error
    from pvderx._pytree import replace
    bad = replace(st, y=st.y.at[0].set(jnp.nan))
    err2, _ = step(bad, jnp.int32(0))
    with pytest.raises(Exception, match="non-finite"):
        err2.throw()


def test_debug_mode_restores_config():
    from pvderx.diag.debug import debug_mode
    before = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_device_op_summary(tmp_path):
    from pvderx.diag import device_op_summary, trace

    f = jax.jit(lambda x: jnp.sin(x).sum())
    x = jnp.ones((256, 256))
    f(x).block_until_ready()
    with trace(str(tmp_path / "t")) as d:
        f(x).block_until_ready()
    rows = device_op_summary(d, top=10)
    assert rows and all(len(r) == 3 for r in rows)
    assert all(ms >= 0 and n >= 1 for _, ms, n in rows)
    with pytest.raises(FileNotFoundError):
        device_op_summary(str(tmp_path / "missing"))


def test_roofline_op_count_and_utilization():
    """The roofline model (diag/roofline.py): the analytic substep op count
    must classify every primitive (no unclassified ops), stay in the band
    the round-5 artifact pinned (947 / 2411 for n_ph 1 / 3, cross-checked
    1.00x vs XLA cost_analysis — benchmarks/ROOFLINE.json), and the
    utilization arithmetic must be consistent."""
    from pvderx.diag import roofline

    for n_ph, lo, hi in ((1, 800, 1100), (3, 2000, 2800)):
        ops = roofline.substep_op_count(n_ph)
        assert "unclassified" not in ops, ops.get("unclassified")
        assert lo <= ops["total"] <= hi, (n_ph, ops["total"])
        assert ops["transcendental"] > 0 and ops["div"] > 0
        assert ops["total"] == (ops["alu"] + ops["div"]
                                + ops["transcendental"] + ops["other"])

    util = roofline.vpu_utilization(31.2e6, n_sub=64, n_ph=1)
    expect = 31.2e6 * 64 * util["ops_per_substep_per_der"]
    assert abs(util["kernel_ops_per_s"] - expect) < 1.0
    assert 0.0 < util["vpu_util"] < 1.0
    assert util["vpu_util_weighted"] > util["vpu_util"]
    assert util["hbm_util"] < 0.05  # compute-bound by construction
    # fleet: M DERs multiply the math per env step
    util_m = roofline.vpu_utilization(2.0e6, n_sub=64, n_ph=1, m=16)
    assert abs(util_m["kernel_ops_per_s"]
               - 16 * 2.0e6 / 31.2e6 * util["kernel_ops_per_s"]) < 1e3
