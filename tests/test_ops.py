"""Fused Pallas window kernel vs the XLA scan path (pvderx/ops/window.py).

The kernel must reproduce the vmapped `lax.scan` RK4 window — the path the
oracle equivalence tests validate — to float roundoff, for both the
single-phase (11-state) and three-phase (23-state) models, including per-env
heterogeneous params/exog. Runs in interpret mode on the CPU test backend;
the same kernel compiles natively on TPU (benchmarked in bench.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx.env import make_env_config
from pvderx.env.vector import make_batch_fns
from pvderx.ode.rk4 import rk4_window
from pvderx.ops.window import (
    P_FIELDS, U_FIELDS, pack_struct, rk4_window_batch, unpack_struct)
from pvderx.params import DERParams, Exog, make_params, nominal_exog
from pvderx.physics import rhs_core

N_SUB, DT = 105, 1.0 / 60.0


def _batch(preset, n, key, dtype):
    p = make_params(preset)
    u = nominal_exog()
    k1, k2, k3 = jax.random.split(key, 3)
    y0 = rhs_core.steady_state_guess(p, u, jnp).astype(dtype)
    y = jnp.tile(y0[None, :], (n, 1)) + 1e-3 * jax.random.normal(
        k1, (n, p.n_states), dtype)
    t0 = jax.random.uniform(k2, (n,), dtype)
    pf = jax.tree.map(lambda v: jnp.full((n,), v, dtype), p)
    uf = jax.tree.map(lambda v: jnp.full((n,), v, dtype), u)
    # heterogeneous envs: jitter grid impedance + insolation per env
    jit_r = 1.0 + 0.2 * jax.random.uniform(k3, (n,), dtype, minval=-1, maxval=1)
    pf = pf.__class__(**{**{f: getattr(pf, f) for f in P_FIELDS},
                         "rg": pf.rg * jit_r, "n_ph": p.n_ph})
    uf = uf.__class__(**{**{f: getattr(uf, f) for f in U_FIELDS},
                         "s_irr": uf.s_irr * jit_r})
    return p, pf, uf, y, t0


@pytest.mark.parametrize("preset", ["10", "50"])
def test_kernel_matches_scan(preset):
    dtype = jnp.float32
    n = 256
    p, pf, uf, y, t0 = _batch(preset, n, jax.random.PRNGKey(0), dtype)

    def win_one(yy, tt, pp, uu):
        return rk4_window(lambda a, b: rhs_core.rhs(a, b, pp, uu, jnp),
                          yy, tt, DT, N_SUB)

    ref = jax.vmap(win_one, in_axes=(0, 0, 0, 0))(y, t0, pf, uf)
    out = rk4_window_batch(y, t0, pack_struct(pf, P_FIELDS),
                           pack_struct(uf, U_FIELDS), n_ph=p.n_ph,
                           n_sub=N_SUB, dt=DT, block=n, interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert np.isfinite(err) and err < 5e-6, err


def test_pack_unpack_roundtrip():
    p = make_params("50")
    n = 8
    pf = jax.tree.map(lambda v: jnp.full((n,), v, jnp.float32), p)
    arr = pack_struct(pf, P_FIELDS)
    back = unpack_struct(DERParams, arr, P_FIELDS, n_ph=3)
    for f in P_FIELDS:
        assert np.array_equal(np.asarray(getattr(back, f)),
                              np.asarray(getattr(pf, f))), f


def test_env_step_pallas_matches_scan():
    """Full batched env step: pallas window path == scan path."""
    cfg = make_env_config("10", dtype=jnp.float32, n_sub=64)
    n = 128
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    outs = {}
    for window in ("scan", "pallas"):
        reset_b, step_b = make_batch_fns(cfg, window=window, donate=False,
                                         block=128)
        st, obs = reset_b(keys)
        acts = jnp.arange(n, dtype=jnp.int32) % 5
        for _ in range(3):
            st, obs, rew, done, info = step_b(st, acts)
        outs[window] = (np.asarray(obs), np.asarray(rew), np.asarray(done))
    for a, b in zip(outs["scan"], outs["pallas"]):
        assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_kernel_block_size_invariance_bitwise():
    """Reproducibility across tilings: each env's window integration is
    independent of how the batch is partitioned into VMEM blocks, so
    different `block` sizes must give BITWISE-identical results (the
    resharding-determinism analog at the kernel level)."""
    dtype = jnp.float32
    n = 2048
    p, pf, uf, y, t0 = _batch("10", n, jax.random.PRNGKey(5), dtype)
    pp = pack_struct(pf, P_FIELDS)
    uu = pack_struct(uf, U_FIELDS)
    kw = dict(n_ph=p.n_ph, n_sub=4, dt=DT, interpret=True)
    y_whole = rk4_window_batch(y, t0, pp, uu, block=2048, **kw)
    y_tiled = rk4_window_batch(y, t0, pp, uu, block=1024, **kw)
    np.testing.assert_array_equal(np.asarray(y_whole), np.asarray(y_tiled))


def test_kernel_matches_scan_disconnect_and_cessation():
    """Edge masks through the kernel: random conn∈{0,1} (tripped/breaker
    open) and ces∈{0,1} (momentary cessation) patterns must integrate
    identically in the fused kernel and the scan path — mask handling is
    where fused kernels typically diverge first."""
    dtype = jnp.float32
    n = 256
    p, pf, uf, y, t0 = _batch("10", n, jax.random.PRNGKey(9), dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(10))
    conn = (jax.random.uniform(k1, (n,)) < 0.5).astype(dtype)
    ces = conn * (jax.random.uniform(k2, (n,)) < 0.5).astype(dtype)
    uf = uf.__class__(**{**{f: getattr(uf, f) for f in U_FIELDS},
                         "conn": conn, "ces": ces})

    def win_one(yy, tt, pp, uu):
        return rk4_window(lambda a, b: rhs_core.rhs(a, b, pp, uu, jnp),
                          yy, tt, DT, 16)

    y_scan = jax.vmap(win_one)(y, t0, pf, uf)
    y_kern = rk4_window_batch(
        y, t0, pack_struct(pf, P_FIELDS), pack_struct(uf, U_FIELDS),
        n_ph=1, n_sub=16, dt=DT, block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(y_kern), np.asarray(y_scan),
                               rtol=0, atol=2e-6)
    # disconnected envs decay their filter current (conn=0 branch active)
    off = np.asarray(conn) == 0.0
    i0 = np.hypot(np.asarray(y)[off, 0], np.asarray(y)[off, 1])
    i1 = np.hypot(np.asarray(y_kern)[off, 0], np.asarray(y_kern)[off, 1])
    assert np.all(i1 <= i0 + 1e-6)


def test_dualfloat_arithmetic_and_transcendentals():
    """ops/dualfloat.py (round 5): the two-float32 number type must deliver
    ~double-precision results through its error-free transforms and
    range-reduced transcendentals (the basis of the df32 kernel's measured
    8.9e-7 gate-scenario accuracy, benchmarks/DUALFLOAT.json)."""
    from pvderx.ops.dualfloat import DF, _exp_df, _lift, _sincos, dfp

    def val(d):
        return np.float64(np.asarray(d.hi)) + np.float64(np.asarray(d.lo))

    # basic ops vs f64
    a, b = _lift(0.1), _lift(0.3)
    assert abs(val(a * b) - 0.03) < 1e-12
    assert abs(val(a + b) - 0.4) < 1e-12
    assert abs(val(a / b) - 1.0 / 3.0) < 1e-12
    assert abs(val(dfp.sqrt(_lift(2.0))) - np.sqrt(2.0)) < 1e-12
    assert abs(val(_lift(2.0) ** (-1.0 / 16.0)) - 2.0 ** (-1 / 16)) < 1e-12
    # transcendentals incl. range reduction + quadrants and large exp args
    for x in (0.01, 0.5, 1.3, 3.9, -2.2, 17.3, 40.0, 100.0, -55.5):
        s, c = _sincos(_lift(x))
        assert abs(val(s) - np.sin(np.float64(x))) < 5e-11, ("sin", x)
        assert abs(val(c) - np.cos(np.float64(x))) < 5e-11, ("cos", x)
        e = _exp_df(_lift(min(x, 30.0)))
        assert abs(val(e) / np.exp(np.float64(min(x, 30.0))) - 1) < 2e-11
    # overflow guard: huge positive arg saturates finite (no inf*0 nan in /)
    big = _exp_df(_lift(500.0))
    q = _lift(1.0) / (_lift(1.0) + big)
    assert np.isfinite(val(q)) and val(q) < 1e-30


def test_dualfloat_rhs_matches_f64():
    """The UNMODIFIED rhs_core evaluated in DF arithmetic must match the f64
    RHS at the same f32-rounded inputs to ~1e-10 (vs ~2.6e-4 for plain f32 —
    the arithmetic-noise floor SPEC.md §6 budgets). One set of equations,
    three precisions."""
    import dataclasses

    from pvderx.oracle import scipy_ref
    from pvderx.ops.dualfloat import DF, dfp

    p64 = make_params("10")
    u64 = nominal_exog()
    y64 = scipy_ref.steady_state(p64, u64)
    u_sag = dataclasses.replace(u64, v_g=0.55)
    p32 = p64.astype(jnp.float32)
    u32 = u_sag.astype(jnp.float32)
    y32 = jnp.asarray(np.asarray(y64), jnp.float32)

    pdf = jax.tree.map(lambda v: DF(jnp.asarray(v, jnp.float32)), p32)
    udf = jax.tree.map(lambda v: DF(jnp.asarray(v, jnp.float32)), u32)
    rdf = rhs_core.rhs(DF(y32), DF(jnp.float32(0.3)), pdf, udf, dfp)
    rdf64 = np.asarray(rdf.hi, np.float64) + np.asarray(rdf.lo, np.float64)

    p64r = jax.tree.map(lambda v: np.asarray(v, np.float64), p32)
    u64r = jax.tree.map(lambda v: np.asarray(v, np.float64), u32)
    r_truth = rhs_core.rhs(np.asarray(y32, np.float64),
                           np.float64(np.float32(0.3)), p64r, u64r, np)
    err = np.abs(rdf64 - r_truth).max()
    assert err < 1e-9, err
    # and the plain-f32 evaluation really is ~6 orders worse (the gap the
    # df32 kernel buys)
    r32 = rhs_core.rhs(y32, jnp.float32(0.3), p32, u32, jnp)
    err32 = np.abs(np.asarray(r32, np.float64) - r_truth).max()
    assert err32 > 1e-5


def test_dualfloat_window_kernel_interpret():
    """The df32 Pallas window kernel (interpret mode) vs an f64 scan of the
    same window: one 48-substep window (the RK4 stability bound needs
    n_sub >= 40) must agree to ~5e-8 (the ~4e-11 per-eval df32 noise
    amplified by the stiff dynamics over 192 RHS evals) — ~50x below the
    f32-kernel tolerance of test_window_kernel_matches_scan."""
    from pvderx.ops.dualfloat import rk4_window_batch_df

    p = make_params("10")
    u = nominal_exog()
    from pvderx.oracle import scipy_ref
    y0 = scipy_ref.steady_state(p, u)
    n = 128
    pf = p.astype(jnp.float32)
    pb = jax.tree.map(lambda v: jnp.broadcast_to(jnp.asarray(v), (n,)), pf)
    ub = jax.tree.map(
        lambda v: jnp.full((n,), v, jnp.float32), u.astype(jnp.float32))
    y_hi = jnp.broadcast_to(jnp.asarray(y0, jnp.float32), (n, p.n_states))
    y_lo = jnp.zeros_like(y_hi)
    dt = 1.0 / 60.0
    hi, lo = rk4_window_batch_df(
        y_hi, y_lo, jnp.zeros((n,), jnp.float32), pack_struct(pb, P_FIELDS),
        pack_struct(ub, U_FIELDS), n_ph=1, n_sub=48, dt=dt, block=n,
        interpret=True)
    got = np.asarray(hi[0], np.float64) + np.asarray(lo[0], np.float64)

    # f64 truth: same fixed-step RK4 at f32-rounded inputs
    p64r = jax.tree.map(lambda v: np.asarray(v, np.float64), pf)
    u64r = jax.tree.map(
        lambda v: np.float64(np.float32(v)), u.astype(jnp.float32))
    y64 = np.asarray(y_hi[0], np.float64)
    h = np.float64(dt) / 48

    def f(yy, tt):
        return rhs_core.rhs(yy, tt, p64r, u64r, np)

    y = y64
    for k in range(48):
        t = k * h
        k1 = f(y, t)
        k2 = f(y + 0.5 * h * k1, t + 0.5 * h)
        k3 = f(y + 0.5 * h * k2, t + 0.5 * h)
        k4 = f(y + h * k3, t + h)
        y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    assert np.abs(got - y).max() < 5e-8, np.abs(got - y).max()
