"""Multi-DER fleet on a shared feeder — BASELINE config 5.

M inverters couple through one PCC feeder solve per RHS evaluation; the fleet
env batches over envs on top (SPEC.md §11).

    python examples/fleet_simulation.py --m 16 --n-envs 64 --steps 120
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="10")
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--n-envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--n-sub", type=int, default=None,
                    help="RK4 substeps/window; default = the per-preset 1e-6 knee (72 single-phase, 88 three-phase; SPEC §6)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    args.n_sub = args.n_sub or (72 if args.preset == "10" else 88)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pvderx.env import fleet
    from pvderx.utils import get_logger

    log = get_logger("examples.fleet")
    fc = fleet.make_fleet_config(args.preset, m=args.m, n_sub=args.n_sub)
    reset_b = jax.jit(jax.vmap(lambda k: fleet.reset(fc, k)))
    step_b = jax.jit(jax.vmap(lambda s, a: fleet.step_autoreset(fc, s, a)))

    keys = jax.random.split(jax.random.PRNGKey(0), args.n_envs)
    st, obs = reset_b(keys)
    log.info("fleet: %d envs x %d DERs = %d inverters",
             args.n_envs, args.m, args.n_envs * args.m)
    tot = jnp.zeros((args.n_envs,))
    for k in range(args.steps):
        acts = jax.random.randint(jax.random.PRNGKey(k), (args.n_envs,), 0, 5)
        st, obs, rew, done, info = step_b(st, acts)
        tot = tot + rew
        if k % 30 == 0:
            log.info("step %3d: mean reward %.3f  mean P_pcc %.3f  "
                     "tripped frac %.3f",
                     k, float(rew.mean()), float(info["p_pcc"].mean()),
                     float(info["tripped_frac"].mean()))
    log.info("mean return over %d steps: %.2f", args.steps, float(tot.mean()))


if __name__ == "__main__":
    main()
