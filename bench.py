"""pvderx headline benchmark: vectorized env-steps/s on the attached device.

Prints exactly ONE JSON line on stdout:
  {"metric": "env_steps_per_s", "value": N, "unit": "env-steps/s",
   "vs_baseline": R, ...}

vs_baseline = value / ORACLE_BASELINE[preset]: speedup over the reference's
architecture (1 env per process, adaptive LSODA via scipy — SURVEY.md §6: the
reference publishes no numbers, so the in-repo oracle is the baseline of
record). The denominator is PINNED (BASELINE.md): a long-run median measured
once on this host, so the headline ratio is comparable across rounds — a live
3 s re-measure on the busy 2-core host swung r01→r02 by 60% while real
throughput moved 8%. `--measure-oracle` re-measures and reports the live
figure alongside, without changing the denominator.

Synchronization (round-4 hardening): every timed region ends with a HOST
FETCH of a scalar computed from the output (`diag.profiler.force_sync`) —
NEVER `jax.block_until_ready`, which provably no-ops on this platform's
remote-dispatch (axon) TPU tunnel: round 3's block_until_ready-timed headline
was ~2000x inflated because dispatch returned in <1 ms while the chunk took
~1 s to execute. A fetch of data derived from the result is the only barrier
that cannot return early. The JSON records `"sync": "scalar-fetch"`.

The JSON also carries the honesty gates the headline depends on, under
"gates" (overall "gate" is PASS only if all pass; any FAIL exits nonzero):
  - "sync_linearity": self-check that the measurement scales with work — two
    chained chunks must take ~2x one chunk (1.5x-2.7x accepted). A
    dispatch-only "measurement" times ~1x and FAILS, refusing the headline.
  - "f32_accuracy": "max_abs_err_f32" (trajectory error of the production
    f32 Pallas window-kernel path vs the f64 scipy-LSODA truth over an
    eventful fixed scenario — cloud step + deep sag + frequency excursion,
    the on-TPU accuracy figure SPEC.md §6 cites) must be within the pinned
    per-preset bound F32_ERR_BOUND. Skipped with --no-accuracy.
  - "reset_compile_s" / "rollout_compile_s": XLA compile+first-run times, so
    compile-time regressions are caught (a persistent compilation cache under
    .jax_cache/ makes warm reruns near-instant; --no-cache measures cold).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# Pinned single-env scipy-LSODA oracle rates [env-steps/s] on this host's CPU
# (rtol=1e-6/atol=1e-8, eventful sag scenario — same workload as
# measure_oracle). Median of 8x 20 s runs, 2026-08-20 (see BASELINE.md
# "Oracle baseline of record"; the 2-core VM shows ±20% load-dependent
# scatter, which is exactly why the denominator is pinned).
ORACLE_BASELINE = {"10": 43.5, "50": 26.5, "250": 31.1}

# Accuracy gate: pinned per-preset bound on max_abs_err_f32 (the production
# f32 Pallas path vs the f64 LSODA truth, measure_f32_accuracy's fixed
# eventful scenario). Measured with the Kahan-compensated kernel (round 4):
# 2.54e-6 / 2.56e-6 / 2.75e-6 for presets 10/50/250; the bound adds ~45%
# margin. SPEC.md §6 documents the error budget behind these numbers
# (~3.3e-7 input-representation floor + ~2.2e-6 f32 RHS arithmetic noise);
# bench exits nonzero if the measurement exceeds the bound, so a silent f32
# regression cannot ship.
F32_ERR_BOUND = {"10": 4.0e-6, "50": 4.0e-6, "250": 4.0e-6}

# Compile-time budget gate (round 5, SURVEY.md §4 item 6): reset/rollout
# compile+first-run must stay under these bounds or bench exits nonzero —
# the r02 239 s config-leaf blowup recurs silently otherwise. The idle-host
# cold record after the round-5 chunked-reset fix is ~9 s reset / ~7 s
# rollout (PARITY.md; was 55-66 s in r04), but compile runs on the SHARED
# 2-core host CPU and is load-confounded by up to ~9x (measured 81.9 s for
# the same 9 s reset while the full test suite saturated both cores), so
# the gate bounds are sized as a blowup backstop that no plausible host
# load can false-trip, not as a regression detector for the last few
# seconds — the idle-host figure recorded in PARITY is the precision
# metric.
RESET_COMPILE_BUDGET_S = 120.0
ROLLOUT_COMPILE_BUDGET_S = 60.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_oracle(preset: str, seconds: float = 3.0) -> float:
    import numpy as np
    from pvderx.oracle import scipy_ref
    from pvderx.params import make_params, nominal_exog

    p = make_params(preset)
    u = nominal_exog()
    u_sag = dataclasses.replace(u, v_g=0.7)
    y = scipy_ref.steady_state(p, u)
    dt = 1.0 / 60.0
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        uu = u_sag if (n % 120) in range(60, 90) else u  # eventful, like the env
        y = scipy_ref.integrate_window(y, n * dt, dt, p, uu, rtol=1e-6, atol=1e-8)
        n += 1
    rate = n / (time.perf_counter() - t0)
    log(f"oracle (scipy LSODA, 1 env, cpu, live): {rate:.1f} env-steps/s over {n} steps")
    return rate


def enable_compilation_cache():
    """Persistent XLA compilation cache (repo-local, gitignored): warm bench
    reruns skip the 32k-env reset/rollout compiles entirely."""
    import jax

    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        log(f"compilation cache unavailable: {e}")


def gate_scenario_exogs(n_steps: int = 120):
    """The fixed eventful gate scenario (settle / cloud step to 400 W/m² /
    0.55 pu deep sag / +0.5 Hz frequency excursion) as a ZOH exog list —
    the SINGLE definition shared by the f32 accuracy gate here and the df32
    study (benchmarks/dualfloat_study.py), so the two tiers are always
    measured on the same scenario."""
    from pvderx.params import nominal_exog

    u = nominal_exog()
    dt = 1.0 / 60.0
    q = n_steps // 4
    exogs = []
    for k in range(n_steps):
        if k < q:
            exogs.append(u)                                    # settle
        elif k < 2 * q:
            exogs.append(dataclasses.replace(u, s_irr=400.0))  # cloud step
        elif k < 3 * q:
            exogs.append(dataclasses.replace(u, v_g=0.55))     # deep sag
        else:
            exogs.append(dataclasses.replace(u, dw_g=0.5 / 60.0,
                                             t_g=3 * q * dt))  # freq excursion
    return exogs


def measure_f32_accuracy(preset: str = "10", n_sub: int = 72,
                         n_steps: int = 120):
    """Trajectory error of the production f32 Pallas window path vs f64 truth.

    Rolls a 2 s eventful scenario (insolation step to 400 W/m², 0.55 pu sag,
    +0.5 Hz frequency excursion — the test_trajectory.py hard-scenario
    family) through `ops.window.rk4_window_batch` in float32 on the attached
    device and compares the state trajectory at every window boundary against
    the scipy-LSODA rtol=1e-10 truth (float64, host). Returns the max
    abs error over all window boundaries (float). SPEC.md §6 cites it.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pvderx.env.vector import _use_pallas
    from pvderx.oracle import scipy_ref
    from pvderx.params import make_params, nominal_exog
    from pvderx.ops.window import P_FIELDS, U_FIELDS, pack_struct, rk4_window_batch

    p = make_params(preset)
    dt = 1.0 / 60.0
    exogs = gate_scenario_exogs(n_steps)
    traj_truth = scipy_ref.run_trajectory(p, exogs)  # [n_steps+1, n_s] f64

    n = 128  # minimum legal Pallas tile width
    pf = p.astype(jnp.float32)
    pb = jax.tree.map(lambda v: jnp.broadcast_to(jnp.asarray(v), (n,)), pf)
    p_pack = pack_struct(pb, P_FIELDS)
    use_pallas = _use_pallas("auto", n, n)

    if use_pallas:
        @jax.jit
        def win(y, t0, u_pack):
            return rk4_window_batch(y, t0, p_pack, u_pack, n_ph=p.n_ph,
                                    n_sub=n_sub, dt=dt, block=n)
    else:
        # CPU fallback: the jitted f32 scan path (same physics core) — the
        # interpret-mode kernel would take minutes for 120 windows
        from pvderx.ode import rk4_window
        from pvderx.ops.window import unpack_struct
        from pvderx.params import Exog
        from pvderx.physics import rhs_core

        @jax.jit
        def win(y, t0, u_pack):
            u = unpack_struct(Exog, u_pack, U_FIELDS)

            def one(yi, ti, ui):
                f = lambda yy, tt: rhs_core.rhs(yy, tt, pf, ui, jnp)
                return rk4_window(f, yi, ti, jnp.float32(dt), n_sub)

            return jax.vmap(one)(y, t0, u)

    y = jnp.broadcast_to(jnp.asarray(traj_truth[0], jnp.float32),
                         (n, traj_truth.shape[1]))
    errs = np.zeros(n_steps)
    for k, uu in enumerate(exogs):
        ub = jax.tree.map(
            lambda v: jnp.full((n,), v, jnp.float32), uu.astype(jnp.float32))
        y = win(y, jnp.full((n,), k * dt, jnp.float32), pack_struct(ub, U_FIELDS))
        # compare on host in f64 (the bench process runs with x64 disabled)
        errs[k] = float(np.max(np.abs(
            np.asarray(y[0], np.float64) - traj_truth[k + 1])))
    max_err = float(errs.max())
    log(f"f32 {'pallas' if use_pallas else 'scan'} path vs LSODA f64 "
        f"truth ({preset}, n_sub={n_sub}, {n_steps} windows): "
        f"max_abs_err={max_err:.3e} (final-window {errs[-1]:.3e})")
    return max_err


def measure_f32_accuracy_fleet(preset: str = "10", m: int = 4,
                               n_sub: int = 64, n_steps: int = 60):
    """Config-5 accuracy gate: the fused f32 FLEET kernel vs the coupled
    fleet LSODA f64 truth (shared feeder, per-unit insolation spread).

    Same protocol as measure_f32_accuracy: eventful scenario (cloud step +
    deep sag), max abs state error over all window boundaries and units.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pvderx.env.vector import _use_pallas
    from pvderx.oracle.supervisory_np import _integrate_fleet_window
    from pvderx.params import make_params, nominal_exog
    from pvderx.physics import fleet as fl
    from pvderx.ops.window import (
        P_FIELDS, U_FIELDS, pack_struct, rk4_fleet_window_batch)

    if not _use_pallas("auto", 128, 128):
        log("fleet accuracy: no TPU backend, skipping")
        return None
    p = make_params(preset)
    u = nominal_exog()
    dt = 1.0 / 60.0
    s_scale = np.linspace(1.0, 0.75, m)     # per-unit partial clouding
    der = fl.fleetify(p, m, np)

    def fu_at(base_u):
        fu = fl.fleetify(base_u, m, np)
        return dataclasses.replace(fu, s_irr=fu.s_irr * s_scale)

    q = n_steps // 3
    exogs = [fu_at(u)] * q
    exogs += [fu_at(dataclasses.replace(u, s_irr=400.0))] * q
    exogs += [fu_at(dataclasses.replace(u, v_g=0.6))] * (n_steps - 2 * q)

    # f64 truth trajectory (coupled LSODA) from the coupled steady state
    from scipy.optimize import fsolve
    n_s = p.n_states
    y0 = fsolve(lambda yf: fl.fleet_rhs(yf.reshape(m, n_s), 0.0, der,
                                        exogs[0], np).reshape(-1),
                fl.fleet_guess(der, exogs[0], np).reshape(-1), xtol=1e-13)
    y0 = y0.reshape(m, n_s)
    truth = [y0]
    for k, fu in enumerate(exogs):
        truth.append(_integrate_fleet_window(truth[-1], k * dt, dt, der, fu,
                                             1e-10, 1e-10))

    n = 128
    pf = jax.tree.map(lambda v: jnp.asarray(np.asarray(v, np.float32)), der)
    pb = jax.tree.map(lambda v: jnp.broadcast_to(v[None, :], (n, m)), pf)
    p_pack = pack_struct(pb, P_FIELDS)

    @jax.jit
    def win(y, t0, u_pack):
        return rk4_fleet_window_batch(y, t0, p_pack, u_pack, n_ph=p.n_ph,
                                      m=m, n_sub=n_sub, dt=dt, block=n)

    y = jnp.broadcast_to(jnp.asarray(y0, jnp.float32)[None], (n, m, n_s))
    max_err = 0.0
    for k, fu in enumerate(exogs):
        ub = jax.tree.map(
            lambda v: jnp.broadcast_to(
                jnp.asarray(np.asarray(v, np.float32))[None, :], (n, m)), fu)
        y = win(y, jnp.full((n,), k * dt, jnp.float32),
                pack_struct(ub, U_FIELDS))
        max_err = max(max_err, float(np.max(np.abs(
            np.asarray(y[0], np.float64) - truth[k + 1]))))
    log(f"f32 FLEET kernel vs coupled LSODA f64 truth ({preset}, m={m}, "
        f"n_sub={n_sub}, {n_steps} windows): max_abs_err={max_err:.3e}")
    return max_err


BASELINE_CONFIGS = {
    # BASELINE.json configs 1-5 (see BASELINE.md). Per-config `chunk` sizes
    # the timed region to >=2 s so the ~23 ms/call dispatch jitter of the
    # remote-TPU tunnel stays <2% of the measurement (round-3 verdict weak
    # #4: config 2's 0.1 s chunks were noise-dominated — and now FAIL the
    # sync-linearity gate, measured 4.2x).
    1: dict(preset="10", n_envs=1, chunk=960, cfg_kw={}),  # ~184 steps/s
    # (round-5 record): keep the timed region ~5 s (the 3840 default would
    # make it ~21 s/rep)
    2: dict(preset="50", n_envs=1024, n_sub=80, chunk=19200,
            cfg_kw=dict(voltvar_enable=True)),
    3: dict(preset="10", n_envs=8192, chunk=5760,
            cfg_kw=dict(anomaly_detect=True,
                        scen=dict(p_sag=0.9, p_freq=0.1, sag_depth_lo=0.2,
                                  sag_depth_hi=0.85))),
    4: dict(preset="10", n_envs=16384, chunk=3840,
            cfg_kw=dict(mppt_enable=True,
                        scen=dict(p_cloud=0.9, zg_jitter=0.3))),
    # fleet sizing: block is VMEM-capped at 1024 envs (M=16 copies of every
    # field; 2048 OOMs the 16 MiB scoped vmem), so n_envs >= 1024 keeps the
    # env tile a full 8x128 f32 vreg (512 -> rows=4 half-tiles, 2x slower) and
    # n_envs >= 2048 adds grid pipelining. v5e sweep at n_sub=72: 512 -> 862k,
    # 1024 -> 1.76M, 2048 -> 1.86M, 4096 -> 1.92M env-steps/s.
    5: dict(preset="10", n_envs=4096, fleet_m=16, cfg_kw={}),
}


def check_linearity(double_thunk, best_single: float):
    """The sync self-check (round-4 hardening): run TWO chained chunks under
    one scalar-fetch sync and require the time to be ~2x one chunk.

    A real measurement scales with work (ratio ~2.0); a dispatch-rate
    artifact (the round-3 failure mode: block_until_ready returning before
    execution) times ~1 dispatch regardless of work (ratio ~1.0 and
    milliseconds). Accepts 1.5x-2.7x to leave room for host-load noise.
    Returns (status, ratio).
    """
    for attempt in (1, 2):
        t0 = time.perf_counter()
        out = double_thunk()
        float(out)  # host fetch of a scalar derived from BOTH chunks
        t_double = time.perf_counter() - t0
        ratio = t_double / best_single
        status = "PASS" if 1.5 <= ratio <= 2.7 else "FAIL"
        log(f"sync linearity: 2-chunk/1-chunk = "
            f"{t_double:.3f}s/{best_single:.3f}s = {ratio:.2f}x -> {status}")
        if status == "PASS" or attempt == 2:
            return status, ratio
        # one retry: the remote tunnel occasionally hiccups for a single
        # region (observed a 33x outlier followed by clean 1.99x); a real
        # sync bug fails BOTH attempts
        log("sync linearity: retrying once (transient tunnel hiccup?)")
    return status, ratio


def bench_fleet(args, m: int):
    """Config 5: M inverters per env on a shared feeder (fused fleet kernel).

    Returns (rate, sync_gate, sync_ratio). All timed regions sync by scalar
    fetch (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from pvderx.diag.profiler import force_sync
    from pvderx.env import fleet

    n = args.n_envs
    fc = fleet.make_fleet_config(args.preset, m=m, n_sub=args.n_sub)
    reset_b = jax.jit(jax.vmap(lambda k: fleet.reset(fc, k)))
    t0 = time.perf_counter()
    st, obs = reset_b(jax.random.split(jax.random.PRNGKey(0), n))
    force_sync(obs)
    bench_fleet.reset_compile_s = time.perf_counter() - t0
    log(f"fleet reset (compile+run): {bench_fleet.reset_compile_s:.1f}s")
    block = min(1024, n)

    def chunk(st, key):
        def body(carry, k):
            s = carry
            acts = jax.random.randint(k, (n,), 0, 5)
            s, ob, r, d, _ = fleet._step_batch_impl(
                fc, s, acts, window="auto", block=block, autoreset=True)
            return s, r
        keys = jax.random.split(key, args.chunk)
        st, rews = jax.lax.scan(body, st, keys)
        # scalar reduction INSIDE the jitted chunk: the timing loop fetches
        # this to the host, which is the only barrier that cannot return
        # before the chunk has actually executed (module docstring)
        return st, jnp.sum(rews)

    ro = jax.jit(chunk, donate_argnums=(0,))
    st, rs = ro(st, jax.random.PRNGKey(1))
    float(rs)
    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        st, rs = ro(st, jax.random.PRNGKey(2 + r))
        float(rs)  # scalar-fetch sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = n * args.chunk / best

    def ro2():
        nonlocal st
        st, r1 = ro(st, jax.random.PRNGKey(97))
        st, r2 = ro(st, jax.random.PRNGKey(98))
        return r1 + r2

    sync_gate, sync_ratio = check_linearity(ro2, best)
    log(f"fleet m={m}: {rate:,.0f} env-steps/s "
        f"({rate * m:,.0f} DER-steps/s)")
    return rate, sync_gate, sync_ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="10")
    ap.add_argument("--n-envs", type=int, default=32768,
                    help="v5e sweep at n_sub=72/chunk=480 (round-2 era, when "
                         "block_until_ready still blocked): 23.3M (8k) / "
                         "26.2M (16k) / 28.9M (32k) / 29.5M (64k) "
                         "env-steps/s — 32k is the knee (64k buys ~2% for "
                         "2x the reset compile); round-5 scalar-fetch record "
                         "at 32k is 34.1M (Kahan kernel, n_sub=64 f32 knee, "
                         "divide hoist + block 2048 + chunk 3840)")
    ap.add_argument("--n-sub", type=int, default=64,
                    help="RK4 substeps per 1/60 s window. The F64 1e-6 "
                         "contract knees (hardest scenario, sustained "
                         "0.45 pu sag) are 72 / 88 for presets 10 / 50-250. "
                         "The F32 production path is floored by arithmetic "
                         "noise (~2.2e-6, SPEC.md §6), so its knee is LOWER: "
                         "64 for preset 10 (measured 2.42e-6 gate scenario / "
                         "1.49e-6 hard scenario — better than 72's 2.54e-6/"
                         "1.64e-6, because fewer substeps accumulate less "
                         "noise) and 80 for presets 50/250 (bitwise-equal "
                         "accuracy to 88: the max error is the f32 "
                         "quasi-equilibrium offset, n_sub-independent). "
                         "48 breaches (1.4e-5). See SPEC.md §6 and "
                         "benchmarks/integrator_study.py")
    ap.add_argument("--chunk", type=int, default=3840,
                    help="env steps per timed call. This sandbox's TPU "
                         "tunnel adds ~23 ms of dispatch overhead per jitted "
                         "call (measured; absent on a directly-attached "
                         "chip), so longer chunks amortize it: at 32k envs "
                         "480 -> 28.9M, 960 -> 29.7M env-steps/s (round 2); "
                         "round-5 re-sweep post block re-tune: 960 -> "
                         "33.47M, 1920 -> 33.92M, 3840 -> 34.17M (the "
                         "~3.7 s timed region keeps dispatch <0.7%); "
                         "64k envs adds only +0.6% for 2x the reset compile")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--config", type=int, choices=sorted(BASELINE_CONFIGS),
                    help="run a BASELINE.md config (1-5) instead of the "
                         "headline 8192-env benchmark")
    ap.add_argument("--measure-oracle", action="store_true",
                    help="also live-measure the scipy oracle rate (reported "
                         "as oracle_live; the vs_baseline denominator stays "
                         "pinned to BASELINE.md)")
    ap.add_argument("--no-accuracy", action="store_true",
                    help="skip the f32-vs-f64-truth accuracy gate")
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent compilation cache")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_cache:
        enable_compilation_cache()
    import jax.numpy as jnp

    from pvderx.env import make_env_config
    from pvderx.env.vector import make_batch_fns, rollout

    extra_cfg = {}
    fleet_m = None
    if args.config is not None:
        bc = BASELINE_CONFIGS[args.config]
        args.preset = bc["preset"]
        args.n_envs = bc["n_envs"]
        args.n_sub = bc.get("n_sub", args.n_sub)
        args.chunk = bc.get("chunk", args.chunk)
        fleet_m = bc.get("fleet_m")
        extra_cfg = dict(bc["cfg_kw"])
        if "scen" in extra_cfg:
            from pvderx.env.core import ScenarioConfig
            extra_cfg["scen"] = ScenarioConfig(**{
                **dataclasses.asdict(ScenarioConfig()), **extra_cfg["scen"]})

    oracle_rate = ORACLE_BASELINE[args.preset]
    oracle_live = measure_oracle(args.preset) if args.measure_oracle else None

    from pvderx.diag.profiler import force_sync

    def finish(rate, sync_gate, sync_ratio, compile_fields):
        """Assemble gates + JSON line; nonzero exit if any gate fails."""
        max_err_f32 = None
        acc_gate = "SKIPPED"
        bound = F32_ERR_BOUND[args.preset]
        if not args.no_accuracy:
            # measured at the SAME n_sub (and, for fleet, the SAME M) the
            # throughput ran with — the gate must certify the configuration
            # that produced the headline; the fleet config gates the fused
            # FLEET kernel against the coupled fleet LSODA truth
            if fleet_m is not None:
                # n_steps=36 keeps the M=16 coupled-LSODA truth (~1-3 s per
                # window) inside a ~90 s budget; 12 windows per regime still
                # reaches the mid-sag quasi-equilibrium where the error peaks
                max_err_f32 = measure_f32_accuracy_fleet(
                    args.preset, m=fleet_m, n_sub=args.n_sub, n_steps=36)
            else:
                max_err_f32 = measure_f32_accuracy(args.preset,
                                                   n_sub=args.n_sub)
            if max_err_f32 is None:   # kernel path unavailable (CPU backend)
                acc_gate = "SKIPPED"
            else:
                acc_gate = "PASS" if max_err_f32 <= bound else "FAIL"
                log(f"f32 accuracy gate: {max_err_f32:.3e} <= {bound:.1e} "
                    f"-> {acc_gate}")
        gates = {"sync_linearity": sync_gate, "f32_accuracy": acc_gate}
        # compile-time budget gate (see RESET_COMPILE_BUDGET_S above)
        comp_gate = "PASS"
        if compile_fields.get("reset_compile_s", 0) > RESET_COMPILE_BUDGET_S:
            comp_gate = "FAIL"
        if (compile_fields.get("rollout_compile_s", 0)
                > ROLLOUT_COMPILE_BUDGET_S):
            comp_gate = "FAIL"
        gates["compile_budget"] = comp_gate
        if comp_gate == "FAIL":
            log(f"compile budget gate: {compile_fields} exceeds "
                f"reset<={RESET_COMPILE_BUDGET_S}s / "
                f"rollout<={ROLLOUT_COMPILE_BUDGET_S}s -> FAIL")
        overall = "FAIL" if "FAIL" in gates.values() else "PASS"
        # roofline utilization of the measured headline (benchmarks/roofline.py
        # is the full artifact: analytic op count cross-checked 1.00x against
        # XLA cost_analysis, v5e ceilings quoted there). vpu_util is a LOWER
        # bound (1 issue/op; transcendentals/divides take several passes) and
        # counts only kernel math — env glue (~7% of the step) is excluded.
        from pvderx.diag import roofline
        util = roofline.vpu_utilization(
            rate, n_sub=args.n_sub, n_ph=1 if args.preset == "10" else 3,
            m=fleet_m or 1)
        log(f"roofline: {util['kernel_ops_per_s'] / 1e12:.2f} T VPU ops/s = "
            f"{util['vpu_util'] * 100:.1f}% of the v5e issue ceiling "
            f"(weighted {util['vpu_util_weighted'] * 100:.1f}%), "
            f"HBM {util['hbm_util'] * 100:.2f}% -> compute-bound")
        print(json.dumps({
            "metric": "env_steps_per_s",
            "value": round(rate, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(rate / oracle_rate, 1),
            "sync": "scalar-fetch",
            "gate": overall,
            "gates": gates,
            "sync_linearity_ratio": round(sync_ratio, 2),
            "max_abs_err_f32": max_err_f32,
            "f32_err_bound": bound,
            "vpu_util": round(util["vpu_util"], 3),
            "roofline": {
                "vpu_util": round(util["vpu_util"], 4),
                "vpu_util_weighted": round(util["vpu_util_weighted"], 4),
                "kernel_ops_per_s": round(util["kernel_ops_per_s"]),
                "ops_per_substep_per_der": util["ops_per_substep_per_der"],
                "vpu_issue_peak_per_s": util["vpu_issue_peak_per_s"],
                "hbm_util": round(util["hbm_util"], 5),
                "chip": util["chip"],
                "artifact": "benchmarks/roofline.py (ROOFLINE.json)",
            },
            **compile_fields,
            "config": {
                "baseline_config": args.config, "fleet_m": fleet_m,
                "preset": args.preset, "n_envs": args.n_envs,
                "n_sub": args.n_sub, "chunk": args.chunk,
                "backend": jax.default_backend(),
                "oracle_env_steps_per_s": oracle_rate,
                "oracle_source": "pinned(BASELINE.md)",
                "oracle_live": oracle_live,
            },
        }))
        if overall == "FAIL":
            sys.exit(1)

    if fleet_m is not None:
        rate, sync_gate, sync_ratio = bench_fleet(args, fleet_m)
        finish(rate, sync_gate, sync_ratio,
               {"reset_compile_s": round(bench_fleet.reset_compile_s, 1)})
        return

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"backend={backend} device={dev} n_envs={args.n_envs} "
        f"preset={args.preset} n_sub={args.n_sub} chunk={args.chunk}")

    cfg = make_env_config(args.preset, dtype=jnp.float32, n_sub=args.n_sub,
                          **extra_cfg)
    reset_batch, _ = make_batch_fns(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), args.n_envs)
    t0 = time.perf_counter()
    state, obs = reset_batch(keys)
    force_sync(obs)
    reset_compile_s = time.perf_counter() - t0
    log(f"reset (compile+run): {reset_compile_s:.1f}s")

    policy = lambda ob, k: jnp.zeros((ob.shape[0],), jnp.int32)

    def chunk_fn(s, o, k):
        s, o, rews, dones = rollout(cfg, s, o, policy, args.chunk, k)
        # scalar reductions INSIDE the chunk; the timing loop fetches rew_sum
        # to the host — the only sync that cannot return before execution
        return s, o, jnp.sum(rews), jnp.sum(dones)

    ro = jax.jit(chunk_fn, donate_argnums=(0, 1))

    t0 = time.perf_counter()
    state, obs, rs, ds = ro(state, obs, jax.random.PRNGKey(1))
    float(rs)
    rollout_compile_s = time.perf_counter() - t0
    log(f"rollout chunk (compile+run): {rollout_compile_s:.1f}s")

    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        state, obs, rs, ds = ro(state, obs, jax.random.PRNGKey(2 + r))
        float(rs)  # scalar-fetch sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = args.n_envs * args.chunk / best
    log(f"times={['%.3f' % t for t in times]} best={best:.3f}s "
        f"-> {rate:,.0f} env-steps/s")

    def ro2():
        nonlocal state, obs
        state, obs, r1, _ = ro(state, obs, jax.random.PRNGKey(97))
        state, obs, r2, _ = ro(state, obs, jax.random.PRNGKey(98))
        return r1 + r2

    sync_gate, sync_ratio = check_linearity(ro2, best)

    finish(rate, sync_gate, sync_ratio,
           {"reset_compile_s": round(reset_compile_s, 1),
            "rollout_compile_s": round(rollout_compile_s, 1)})


if __name__ == "__main__":
    main()
