"""The double-float experiment SPEC.md §6 used to reject by assertion.

SURVEY.md §7: "validate 1e-6 is reachable in f32; if not, selective f64 ...
with cost measured." Round 4 shipped a two-tier contract (f64 <= 1e-6;
f32 gated <= 4e-6, floored at ~2.2e-6 by f32 RHS arithmetic noise) with a
prose-only "double-float would cost ~3-4x — rejected". This script puts
numbers behind that decision:

1. **Accuracy**: the df32 window kernel (ops/dualfloat.py — the UNMODIFIED
   rhs_core physics evaluated in two-float32 arithmetic, ~49-bit mantissa,
   with DF-grade range-reduced transcendentals) run through the SAME
   120-window eventful gate scenario as `bench.measure_f32_accuracy`,
   against the same LSODA f64 truth. Expected: the ~3.3e-7 input-
   representation floor (params/exog/initial state are still f32), since
   the single-eval RHS error drops from 2.6e-4 (f32) to 4.0e-11 (df32,
   measured on CPU, round 5).
2. **Cost**: chained kernel-only window rate (scalar-fetch synced, same
   protocol as benchmarks/roofline.py) for the df32 kernel vs the f32
   production kernel at the same batch/n_sub.

Writes benchmarks/DUALFLOAT.json. The verdict (ship as opt-in / reject with
measurement) is recorded in BASELINE.md row 3 and SPEC.md §6.

Run: python benchmarks/dualfloat_study.py [--n-envs 8192] [--n-sub 64]
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


def measure_df_accuracy(n_sub: int, n_steps: int = 120, preset: str = "10"):
    """df32 kernel vs LSODA f64 truth on bench.py's exact gate scenario
    (imported from bench.gate_scenario_exogs — one definition, both tiers;
    round-5 review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import gate_scenario_exogs
    from pvderx.oracle import scipy_ref
    from pvderx.params import make_params
    from pvderx.ops.window import P_FIELDS, U_FIELDS, pack_struct
    from pvderx.ops.dualfloat import rk4_window_batch_df

    p = make_params(preset)
    dt = 1.0 / 60.0
    exogs = gate_scenario_exogs(n_steps)
    traj_truth = scipy_ref.run_trajectory(p, exogs)

    n = 128
    interpret = jax.default_backend() == "cpu"
    pf = p.astype(jnp.float32)
    pb = jax.tree.map(lambda v: jnp.broadcast_to(jnp.asarray(v), (n,)), pf)
    p_pack = pack_struct(pb, P_FIELDS)

    @jax.jit
    def win(y_hi, y_lo, t0, u_pack):
        return rk4_window_batch_df(y_hi, y_lo, t0, p_pack, u_pack,
                                   n_ph=p.n_ph, n_sub=n_sub, dt=dt, block=n,
                                   interpret=interpret)

    y_hi = jnp.broadcast_to(jnp.asarray(traj_truth[0], jnp.float32),
                            (n, traj_truth.shape[1]))
    y_lo = jnp.zeros_like(y_hi)   # lo starts 0: y0 is an f32 input by contract
    errs = np.zeros(n_steps)
    for k, uu in enumerate(exogs):
        ub = jax.tree.map(
            lambda v: jnp.full((n,), v, jnp.float32), uu.astype(jnp.float32))
        y_hi, y_lo = win(y_hi, y_lo, jnp.full((n,), k * dt, jnp.float32),
                         pack_struct(ub, U_FIELDS))
        yk = np.asarray(y_hi[0], np.float64) + np.asarray(y_lo[0], np.float64)
        errs[k] = float(np.max(np.abs(yk - traj_truth[k + 1])))
    log(f"df32 kernel vs LSODA f64 truth (preset {preset}, n_sub={n_sub}, "
        f"{n_steps} windows): max_abs_err={errs.max():.3e} "
        f"(final-window {errs[-1]:.3e})")
    return float(errs.max())


def measure_rate(df: bool, n_envs: int, n_sub: int, n_win: int, reps: int = 4):
    """Kernel-only windows/s, chained, scalar-fetch synced."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pvderx.oracle import scipy_ref
    from pvderx.params import make_params, nominal_exog
    from pvderx.ops.window import (
        P_FIELDS, U_FIELDS, pack_struct, rk4_window_batch)
    from pvderx.ops.dualfloat import rk4_window_batch_df

    p = make_params("10")
    pf = p.astype(jnp.float32)
    u0 = nominal_exog().astype(jnp.float32)
    pb = jax.tree.map(lambda v: jnp.full((n_envs,), v, jnp.float32), pf)
    ub = jax.tree.map(lambda v: jnp.full((n_envs,), v, jnp.float32), u0)
    p_pack = pack_struct(pb, P_FIELDS)
    u_pack = pack_struct(ub, U_FIELDS)
    dt = 1.0 / 60.0
    y0 = scipy_ref.steady_state(p, nominal_exog())
    y = jnp.broadcast_to(jnp.asarray(y0, jnp.float32), (n_envs, p.n_states))
    block = min(1024, n_envs)

    if df:
        @jax.jit
        def many(y, ylo):
            def body(carry, k):
                yh, yl = carry
                t = jnp.full((n_envs,), k * dt, jnp.float32)
                yh, yl = rk4_window_batch_df(yh, yl, t, p_pack, u_pack,
                                             n_ph=p.n_ph, n_sub=n_sub, dt=dt,
                                             block=block)
                return (yh, yl), None
            (yh, yl), _ = lax.scan(body, (y, ylo),
                                   jnp.arange(n_win, dtype=jnp.float32))
            return yh, yl, jnp.sum(yh)
        state = (y, jnp.zeros_like(y))
        run = lambda s: many(*s)
        unpack = lambda o: ((o[0], o[1]), o[2])
    else:
        @jax.jit
        def many(y):
            def body(carry, k):
                t = jnp.full((n_envs,), k * dt, jnp.float32)
                # production-default block (2048 post round-5 re-tune) so the
                # cost factor compares df32 against the SHIPPED f32 config
                return rk4_window_batch(carry, t, p_pack, u_pack, n_ph=p.n_ph,
                                        n_sub=n_sub, dt=dt), None
            y, _ = lax.scan(body, y, jnp.arange(n_win, dtype=jnp.float32))
            return y, jnp.sum(y)
        state = y
        run = lambda s: many(s)
        unpack = lambda o: (o[0], o[1])

    t0 = time.perf_counter()
    out = run(state)
    state, s = unpack(out)
    float(s)
    log(f"{'df32' if df else 'f32 '} chain compile+run: "
        f"{time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(state)
        state, s = unpack(out)
        float(s)   # scalar-fetch sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = n_envs * n_win / best
    log(f"{'df32' if df else 'f32 '}: {rate:,.0f} env-windows/s "
        f"({1e9 / (rate * n_sub):.2f} ns/env-substep)")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=8192)
    ap.add_argument("--n-sub", type=int, default=64)
    ap.add_argument("--n-win", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()

    out = {"backend": backend, "n_sub": args.n_sub}
    out["df32_max_abs_err"] = measure_df_accuracy(args.n_sub)
    if backend != "cpu":
        # 3-phase coverage (round 5: DF supports n_ph=3 after the
        # shift-angle iota fix): preset 50 at its n_sub=80 knee
        out["df32_max_abs_err_preset50"] = measure_df_accuracy(
            80, preset="50")
    if backend != "cpu":
        r_f32 = measure_rate(False, args.n_envs, args.n_sub, args.n_win)
        r_df = measure_rate(True, args.n_envs, args.n_sub, args.n_win)
        out.update({
            "n_envs": args.n_envs,
            "f32_env_windows_per_s": r_f32,
            "df32_env_windows_per_s": r_df,
            "df32_cost_factor": r_f32 / r_df,
        })
        log(f"df32 cost factor: {r_f32 / r_df:.2f}x the f32 kernel")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "DUALFLOAT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
