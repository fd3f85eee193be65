"""Gradient-based controller-gain tuning through the simulated trajectory.

A capability the reference stack cannot offer: its odeint/Fortran solve is a
black box, so gain tuning there is trial-and-error. In pvderx the whole
trajectory is differentiable (`jax.grad` through the `lax.scan` RK4 windows),
so the DC-link PI gains can be tuned by Adam against a tracking objective —
here: minimize Vdc excursion through a 0.6 pu voltage sag and recovery.
Long horizons use `jax.checkpoint` per window (remat) to bound memory
(SURVEY.md §5: the rollout time axis is the sequence-parallel analog).

    python examples/gain_tuning.py --iters 40
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="10")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--windows", type=int, default=60, help="1/60 s windows")
    ap.add_argument("--n-sub", type=int, default=None,
                    help="RK4 substeps/window; default = the per-preset 1e-6 "
                         "knee (72 single-phase, 88 three-phase; SPEC §6)")
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    args.n_sub = args.n_sub or (72 if args.preset == "10" else 88)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from pvderx._pytree import replace
    from pvderx.ode import newton_solve, rk4_window
    from pvderx.params import make_params, nominal_exog
    from pvderx.physics import rhs_core
    from pvderx.utils import get_logger

    log = get_logger("examples.gain_tuning")
    dt = 1.0 / 60.0
    p = make_params(args.preset)
    u0 = nominal_exog()
    u_sag = replace(u0, v_g=jnp.asarray(0.6, jnp.float32))
    y0, _ = newton_solve(
        lambda y: rhs_core.rhs(y, jnp.float32(0.0), p, u0, jnp),
        rhs_core.steady_state_guess(p, u0, jnp))
    n = p.n_ph
    sag_lo, sag_hi = args.windows // 3, 2 * args.windows // 3

    def loss(gains):
        p2 = replace(p, kp_dc=gains["kp_dc"], ki_dc=gains["ki_dc"])

        @jax.checkpoint  # remat per window: O(1) activation memory in horizon
        def window(y, k):
            t = k.astype(y.dtype) * dt
            in_sag = (k >= sag_lo) & (k < sag_hi)
            u = jax.tree.map(lambda a, b: jnp.where(in_sag, a, b), u_sag, u0)
            y1 = rk4_window(lambda yy, tt: rhs_core.rhs(yy, tt, p2, u, jnp),
                            y, t, dt, args.n_sub)
            return y1, (y1[6 * n] - 1.0) ** 2

        _, errs = jax.lax.scan(window, y0, jnp.arange(args.windows))
        return jnp.mean(errs)

    gains = {"kp_dc": jnp.asarray(p.kp_dc), "ki_dc": jnp.asarray(p.ki_dc)}
    opt = optax.adam(args.lr * float(p.kp_dc))
    opt_state = opt.init(gains)
    val_grad = jax.jit(jax.value_and_grad(loss))

    t0 = time.perf_counter()
    for i in range(args.iters):
        v, g = val_grad(gains)
        updates, opt_state = opt.update(g, opt_state)
        gains = optax.apply_updates(gains, updates)
        if i % 10 == 0 or i == args.iters - 1:
            log.info("iter %d: loss=%.3e kp_dc=%.4f ki_dc=%.4f", i, float(v),
                     float(gains["kp_dc"]), float(gains["ki_dc"]))
    log.info("done in %.1fs: Vdc sag-tracking loss improved to %.3e",
             time.perf_counter() - t0, float(val_grad(gains)[0]))


if __name__ == "__main__":
    main()
