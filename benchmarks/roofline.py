"""Roofline artifact for the fused window kernel (SURVEY.md §5/§6).

Produces the reproducible speed-of-light record behind the headline
env-steps/s figure (round-4 verdict gap #1). Three legs:

1. Analytic op count of one RK4 substep (pvderx.diag.roofline): the exact
   per-env VPU work, from the jaxpr of the kernel's own arithmetic.
2. Cross-check against XLA's `cost_analysis()` flops on the SAME physics
   run through the pure-XLA scan path (the kernel itself is a Mosaic custom
   call, opaque to XLA cost analysis — the scan path runs identical
   rhs_core arithmetic, so its flop count validates the analytic count).
3. Kernel-only measured rate on the attached chip: a lax.scan chain of
   `rk4_window_batch` windows under one jit, timed by scalar fetch
   (diag.profiler.force_sync — the only trustworthy barrier here), then
   achieved ops/s vs the v5e VPU issue ceiling and bytes/s vs HBM.

Writes benchmarks/ROOFLINE.json and prints a summary. Run:
    python benchmarks/roofline.py [--n-envs 32768] [--n-sub 64] [--cpu]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def xla_flops_per_substep(n_envs: int = 1024, n_sub: int = 8) -> dict:
    """Leg 2: XLA cost_analysis flops of the scan-path window, per substep.

    XLA counts 1 flop per elementwise output element (transcendentals
    reported separately) and counts a `while`-loop BODY ONCE regardless of
    trip count — verified by probing two n_sub values and checking the
    totals are trip-count-independent — so per-substep = flops / n_envs.
    CSE across the 4 RK4 stages can push it slightly below the analytic
    issue count; agreement within ~25% validates the analytic model.
    """
    import jax
    import jax.numpy as jnp

    from pvderx.ode import rk4_window
    from pvderx.params import make_params, nominal_exog
    from pvderx.physics import rhs_core

    p = make_params("10").astype(jnp.float32)
    u0 = nominal_exog()
    u = jax.tree.map(
        lambda v: jnp.full((n_envs,), v, jnp.float32), u0.astype(jnp.float32))

    def win(y, t0, u):
        def one(yi, ti, ui):
            f = lambda yy, tt: rhs_core.rhs(yy, tt, p, ui, jnp)
            return rk4_window(f, yi, ti, jnp.float32(1.0 / 60.0), n_sub)
        return jax.vmap(one)(y, t0, u)

    y = jnp.zeros((n_envs, p.n_states), jnp.float32)
    t0 = jnp.zeros((n_envs,), jnp.float32)

    def cost_at(ns):
        nonlocal n_sub
        n_sub = ns
        return jax.jit(win).lower(y, t0, u).compile().cost_analysis() or {}

    c1, c2 = cost_at(8), cost_at(16)
    fl, trans = c1.get("flops"), c1.get("transcendentals")
    body_once = (fl is not None and c2.get("flops") is not None
                 and abs(c2["flops"] - fl) / max(fl, 1.0) < 0.05)
    div = n_envs if body_once else n_envs * 8
    return {
        "xla_flops_per_substep": None if fl is None else fl / div,
        "xla_transcendentals_per_substep": None if trans is None
        else trans / div,
        "xla_counts_loop_body_once": body_once,
        "probe": {"n_envs": n_envs, "n_sub": [8, 16], "path": "scan"},
    }


def measure_kernel_rate(n_envs: int, n_sub: int, n_win: int, reps: int = 5):
    """Leg 3: windows/s of the bare fused kernel (no env glue), chained
    window-to-window inside one jit, scalar-fetch synced."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvderx.params import make_params, nominal_exog
    from pvderx.ops.window import (
        P_FIELDS, U_FIELDS, pack_struct, rk4_window_batch)

    p = make_params("10").astype(jnp.float32)
    u0 = nominal_exog().astype(jnp.float32)
    pb = jax.tree.map(lambda v: jnp.full((n_envs,), v, jnp.float32), p)
    ub = jax.tree.map(lambda v: jnp.full((n_envs,), v, jnp.float32), u0)
    p_pack = pack_struct(pb, P_FIELDS)
    u_pack = pack_struct(ub, U_FIELDS)
    dt = 1.0 / 60.0

    from pvderx.oracle import scipy_ref
    y0 = scipy_ref.steady_state(make_params("10"), nominal_exog())  # f64 solve
    y = jnp.broadcast_to(jnp.asarray(y0, jnp.float32), (n_envs, p.n_states))

    @jax.jit
    def many(y):
        def body(carry, k):
            yy = carry
            t = jnp.full((n_envs,), k * dt, jnp.float32)
            yy = rk4_window_batch(yy, t, p_pack, u_pack, n_ph=p.n_ph,
                                  n_sub=n_sub, dt=dt)
            return yy, None
        y, _ = lax.scan(body, y, jnp.arange(n_win, dtype=jnp.float32))
        return y, jnp.sum(y)

    t0 = time.perf_counter()
    y, s = many(y)
    float(s)
    log(f"kernel chain compile+run: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y, s = many(y)
        float(s)  # scalar-fetch sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = n_envs * n_win / best
    log(f"kernel-only: times={['%.3f' % t for t in times]} "
        f"-> {rate:,.0f} env-windows/s")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=32768)
    ap.add_argument("--n-sub", type=int, default=64)
    ap.add_argument("--n-win", type=int, default=1200,
                    help="windows per timed chain (>=2 s region on a v5e)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pvderx.diag import roofline

    out = {"analytic": {}, "chip": roofline.V5E}
    for n_ph in (1, 3):
        ops = roofline.substep_op_count(n_ph)
        out["analytic"][f"n_ph={n_ph}"] = ops
        log(f"analytic n_ph={n_ph}: {ops['total']} ops/substep/env "
            f"(alu {ops['alu']}, div {ops['div']}, "
            f"transcendental {ops['transcendental']})")

    xc = xla_flops_per_substep()
    out["xla_cross_check"] = xc
    a1 = out["analytic"]["n_ph=1"]["total"]
    if xc["xla_flops_per_substep"]:
        xt = (xc["xla_flops_per_substep"]
              + (xc["xla_transcendentals_per_substep"] or 0))
        out["xla_cross_check"]["ratio_analytic_over_xla"] = a1 / xt
        log(f"XLA cost_analysis cross-check: {xt:.0f} flops+trans/substep "
            f"(scan path) vs analytic {a1} -> ratio {a1 / xt:.2f}")

    backend = jax.default_backend()
    out["backend"] = backend
    if backend not in ("cpu",):
        rate_w = measure_kernel_rate(args.n_envs, args.n_sub, args.n_win)
        util = roofline.vpu_utilization(rate_w, n_sub=args.n_sub, n_ph=1)
        out["measured"] = {
            "n_envs": args.n_envs, "n_sub": args.n_sub, "n_win": args.n_win,
            "env_windows_per_s": rate_w,
            "ns_per_env_substep": 1e9 / (rate_w * args.n_sub),
            **util,
        }
        log(f"ACHIEVED: {util['kernel_ops_per_s'] / 1e12:.2f} T VPU ops/s = "
            f"{util['vpu_util'] * 100:.1f}% of the "
            f"{util['vpu_issue_peak_per_s'] / 1e12:.2f} T/s issue ceiling "
            f"(weighted {util['vpu_util_weighted'] * 100:.1f}%); "
            f"HBM {util['hbm_bytes_per_s'] / 1e9:.1f} GB/s = "
            f"{util['hbm_util'] * 100:.2f}% of peak -> compute-bound")
    else:
        log("CPU backend: skipping the on-chip measurement leg")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps({k: out[k] for k in out if k != "analytic"}))


if __name__ == "__main__":
    main()
