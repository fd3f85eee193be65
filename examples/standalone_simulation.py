"""Standalone dynamic simulation — the reference's validation workflow.

Reference analog (SURVEY.md §3.4): build events, run DynamicSimulation over a
horizon, plot the collected series. Run:

    python examples/standalone_simulation.py [--preset 50] [--tstop 20]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="10", choices=["10", "50", "250"])
    ap.add_argument("--tstop", type=float, default=20.0)
    ap.add_argument("--outdir", default="/tmp/pvderx_demo")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pvderx.diag import SimulationResults
    from pvderx.scenario import EventBuilder
    from pvderx.sim import DynamicSimulation
    from pvderx.utils import get_logger

    log = get_logger("examples")

    # scripted scenario, reference-style (SURVEY.md §3.4):
    ev = EventBuilder()
    ev.add_solar_event(10.0, 85.0, 300.0)     # insolation collapse at t=10s
    ev.add_solar_event(14.0, 1000.0, 298.15)  # recovery
    ev.add_grid_event(5.0, v=0.6)             # 0.6 pu sag at t=5s
    ev.add_grid_event(5.5, v=1.0)             # clears after 0.5s

    sim = DynamicSimulation(preset=args.preset, events=ev, tStop=args.tstop)
    log.info("running %s steps of %s kW preset...", sim.n_steps, args.preset)
    series = sim.run_simulation()
    sim.show_PV_DER_states()

    os.makedirs(args.outdir, exist_ok=True)
    res = SimulationResults(series, title=f"{args.preset} kW PV-DER")
    for pt in ("power", "voltage", "all"):
        path = res.plot_DER_simulation(pt, save_path=os.path.join(
            args.outdir, f"{args.preset}kW_{pt}.png"))
        log.info("wrote %s", path)


if __name__ == "__main__":
    main()
