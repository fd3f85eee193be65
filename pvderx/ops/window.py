"""Pallas TPU kernel: the fused RK4 control-window integrator.

This is the hot op of the whole framework (SURVEY.md §3.2: thousands of RHS
evaluations per env-step in the reference; here 4·n_sub per control window).
The XLA default path runs each RK4 substep as its own HBM-roundtripping fused
kernel — at [N, 11..23] f32 state sizes that is launch/bandwidth bound
(~4.5 ms per 105-substep window at N=8192, measured). This kernel keeps a
block of environments' state resident in VMEM and runs ALL n_sub substeps in
one `pallas_call`: one HBM read of (state, params, exog) and one write of the
final state per window.

Layout — the whole trick: every array is [n_rows, R, 128] with the
*variable/field index* on the leading (untiled) axis and environments on the
(sublane, lane) axes. Indexing a variable (`y[3]`, `p_pack[k]`) slices the
untiled axis — free, no relayout — and every arithmetic op is a dense
[R, 128] (or [n_ph, R, 128]) VPU tile op. `rhs_core` is batch-transparent
over trailing axes (phase reductions are axis-0), so the kernel body calls
the *identical* physics code the scipy oracle validates — there is no second
implementation of the equations.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvderx.params import DERParams, Exog

LANE = 128


def _data_field_names(cls, meta=("n_ph",)):
    return [f.name for f in dataclasses.fields(cls) if f.name not in meta]

P_FIELDS = _data_field_names(DERParams)
U_FIELDS = _data_field_names(Exog, meta=())


def pack_struct(tree, fields) -> jnp.ndarray:
    """Stack a dataclass of [N] leaves into one [n_fields, N] array."""
    return jnp.stack([getattr(tree, f) for f in fields])


def unpack_struct(cls, arr, fields, **meta):
    """Rebuild the dataclass with index-0 views of a [n_fields, ...] array."""
    kw = {f: arr[i] for i, f in enumerate(fields)}
    kw.update(meta)
    return cls(**kw)


def _window_kernel(t_ref, y_ref, p_ref, u_ref, out_ref, *, n_ph, n_sub, h):
    from pvderx.physics import rhs_core

    y = y_ref[:]                       # [n_states, R, 128]
    p = unpack_struct(DERParams, p_ref[:], P_FIELDS, n_ph=n_ph)
    u = unpack_struct(Exog, u_ref[:], U_FIELDS)
    t0 = t_ref[0]                      # [R, 128] per-env window start time
    # window-invariant algebra hoisted out of the 4·n_sub RHS evaluations
    # (bitwise-identical arithmetic to the inline path — see rhs_core.Prep)
    prep = rhs_core.prep_invariants(p, u, jnp, bdims=2)

    # the grid rotation phasor is a function of the stage *time* only: the RK4
    # half-point is shared by k2/k3 and the endpoint is the next substep's
    # start, so 2 cexpj per substep replace 4 (sin/cos were ~10% of the kernel)
    # Kahan-compensated state accumulation (c carries the rounding residue) —
    # same arithmetic order as ode.rk4.kahan_add; without it the f32 state
    # random-walks ~sqrt(n_substeps)·ulp and breaches the 1e-6 contract
    def body(k, carry):
        y, c, r1 = carry
        t = t0 + k * h
        rh = rhs_core.grid_rot(t + 0.5 * h, p, u, jnp)
        r4 = rhs_core.grid_rot(t + h, p, u, jnp)
        k1 = rhs_core.rhs(y, t, p, u, jnp, prep, r1)
        k2 = rhs_core.rhs(y + (0.5 * h) * k1, t + 0.5 * h, p, u, jnp, prep, rh)
        k3 = rhs_core.rhs(y + (0.5 * h) * k2, t + 0.5 * h, p, u, jnp, prep, rh)
        k4 = rhs_core.rhs(y + h * k3, t + h, p, u, jnp, prep, r4)
        d = ((h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)) - c
        s = y + d
        return s, (s - y) - d, r4

    # NEGATIVE RESULT (round 5, measured, do not re-try without new ideas):
    # fully unrolling this loop (Mosaic supports only unroll=1 or
    # unroll=n_sub) measured 0.469 vs 0.461 ns/env-substep — 2% SLOWER —
    # at 10x the compile time (41 s vs 4 s): the rolled loop body already
    # saturates VPU issue slots (roofline: 49-53% incl. multi-pass
    # transcendentals), so unrolling only bloats the instruction stream.
    y1, _, _ = lax.fori_loop(
        0, n_sub, body,
        (y, jnp.zeros_like(y), rhs_core.grid_rot(t0, p, u, jnp)))
    out_ref[:] = y1


def _to_tiles(a, n_rows, block):
    """[n_rows, N] -> [n_rows, N//128, 128]."""
    return a.reshape(n_rows, -1, LANE)


def _fleet_window_kernel(t_ref, y_ref, p_ref, u_ref, out_ref, *, n_ph, m,
                         n_sub, h):
    """Fused RK4 window for M coupled DERs per env (SPEC.md §11).

    Blocks are rank-4 [field/state, M, R, 128]: unit index on axis 1,
    environments on the (sublane, lane) axes. The shared-feeder coupling is
    a mean over the M axis inside the RHS; `rhs_core` broadcasts the shared
    PCC voltage [n_ph, 1, R, 128] against the per-unit states
    [n_ph, M, R, 128] — identical arithmetic to `physics.fleet.fleet_rhs`
    up to reduction order.
    """
    from pvderx.physics import rhs_core

    y = y_ref[:]                      # [n_states, M, R, 128]
    p = unpack_struct(DERParams, p_ref[:], P_FIELDS, n_ph=n_ph)
    u = unpack_struct(Exog, u_ref[:], U_FIELDS)
    t0 = t_ref[0, 0]                  # [R, 128] per-env window start time
                                      # (single copy — t is env-wide, not
                                      # per-unit; an M-broadcast here cost
                                      # 0.25 MiB of the 16 MiB scoped VMEM)
    # shared feeder quantities: unit 0's grid/load fields (identical across M
    # by the fleet contract), kept as [1, R, 128] slices so shapes broadcast
    shared = lambda l: l[0:1]
    p_sh = jax.tree.map(shared, p)
    u_sh = jax.tree.map(shared, u)
    prep = rhs_core.prep_invariants(p, u, jnp, bdims=3)
    prep_sh = rhs_core.prep_invariants(p_sh, u_sh, jnp, bdims=3)

    def rhs_fleet(y, t, rot):
        i = rhs_core.C(y[0:n_ph], y[n_ph:2 * n_ph])
        i_inj = rhs_core.C(jnp.mean(u.conn * i.re, axis=1, keepdims=True),
                           jnp.mean(u.conn * i.im, axis=1, keepdims=True))
        v = rhs_core.pcc_voltage(i_inj, t, p_sh, u_sh, jnp, prep_sh, rot)
        return rhs_core.rhs_given_v(y, t, p, u, v, jnp, prep)

    # Kahan-compensated accumulation, same order as ode.rk4.kahan_add
    def body(k, carry):
        y, c, r1 = carry
        t = t0 + k * h
        rh = rhs_core.grid_rot(t + 0.5 * h, p_sh, u_sh, jnp)
        r4 = rhs_core.grid_rot(t + h, p_sh, u_sh, jnp)
        k1 = rhs_fleet(y, t, r1)
        k2 = rhs_fleet(y + (0.5 * h) * k1, t + 0.5 * h, rh)
        k3 = rhs_fleet(y + (0.5 * h) * k2, t + 0.5 * h, rh)
        k4 = rhs_fleet(y + h * k3, t + h, r4)
        d = ((h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)) - c
        s = y + d
        return s, (s - y) - d, r4

    y1, _, _ = lax.fori_loop(
        0, n_sub, body,
        (y, jnp.zeros_like(y), rhs_core.grid_rot(t0, p_sh, u_sh, jnp)))
    out_ref[:] = y1


@partial(jax.jit, static_argnames=("n_ph", "m", "n_sub", "dt", "block",
                                   "interpret"))
def rk4_fleet_window_batch(y, t0, p_pack, u_pack, *, n_ph: int, m: int,
                           n_sub: int, dt: float, block: int = 1024,
                           interpret: bool = False):
    """Integrate N fleet envs (M units each) over one control window.

    y: [N, M, n_states]; t0: [N]; p_pack: [n_p, N, M]; u_pack: [n_u, N, M].
    Returns y1 [N, M, n_states]. Same tiling rules as rk4_window_batch;
    default block is smaller because VMEM holds M copies of every field —
    at M=16 block=1024 needs ~16.2 MiB with the Kahan compensation carry
    (one extra [n_s, M, R, 128] block), so the kernel requests a 24 MiB
    scoped-vmem cap (v5e has 128 MiB physical; block=2048 still fails to
    compile even at the raised cap — measured r04 — and historically bought
    only ~5%). Throughput wants N >= block: N=512 compiles (rows=4) but
    every VPU op runs a half-filled 8x128 vreg and the grid is 1 (no
    DMA/compute overlap) — measured 862k env-steps/s vs 1.76M at N=1024
    (n_sub=72); the r04 record is 2.04M at N=4096/n_sub=64.
    """
    n, m_, n_s = y.shape
    assert m_ == m
    block = min(block, n)
    if (block % MIN_BLOCK and block != n) or n % block:
        raise ValueError(
            f"N={n} must tile by block={block} (multiple of {MIN_BLOCK})")
    h = dt / n_sub
    rows = block // LANE
    grid = (n // block,)
    kernel = partial(_fleet_window_kernel, n_ph=n_ph, m=m, n_sub=n_sub, h=h)

    def spec(n_rows, n_m=m):
        return pl.BlockSpec((n_rows, n_m, rows, LANE), lambda i: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)

    def tiles(a, n_rows):
        # [n_rows, N, M] -> [n_rows, M, N//128, 128]
        return a.transpose(0, 2, 1).reshape(n_rows, m, -1, LANE)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(1, 1), spec(n_s), spec(len(P_FIELDS)),
                  spec(len(U_FIELDS))],
        out_specs=spec(n_s),
        out_shape=jax.ShapeDtypeStruct((n_s, m, n // LANE, LANE), y.dtype),
        # the Kahan compensation carry adds one [n_s, M, R, 128] block on
        # top of the r03 working set, which sat exactly at Mosaic's 16 MiB
        # default scoped-vmem cap at block=1024/M=16; raise the cap (v5e has
        # 128 MiB physical VMEM) instead of shrinking the block to rows=4
        # half-tiles (measured 2x slower at block=512)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(
        # t is env-wide: one [1, 1, R, 128] copy, not M (VMEM headroom —
        # the Kahan carry consumes one extra [n_s, M, R, 128] block)
        t0.reshape(1, 1, -1, LANE),
        tiles(y.transpose(2, 0, 1), n_s),
        tiles(p_pack, len(P_FIELDS)),
        tiles(u_pack, len(U_FIELDS)),
    )
    return out.reshape(n_s, m, n).transpose(2, 1, 0)


MIN_BLOCK = 8 * LANE  # sublane (8) x lane (128) tile of one f32 vreg


@partial(jax.jit, static_argnames=("n_ph", "n_sub", "dt", "block", "interpret"))
def rk4_window_batch(y, t0, p_pack, u_pack, *, n_ph: int, n_sub: int,
                     dt: float, block: int = 2048, interpret: bool = False):
    """Integrate all N envs over one control window in a single fused kernel.

    y: [N, n_states]; t0: [N]; p_pack: [n_p, N]; u_pack: [n_u, N].
    Returns y1 [N, n_states]. N must be a multiple of ``min(N, block)``,
    which must be a multiple of 1024 (8 sublanes x 128 lanes per f32 tile).
    Measured on a v5e (long-chunk amortized — see the tunnel-overhead note in
    bench.py --help): pre-hoist, block 2048 and 4096 tied and 8192+
    regressed (grid pipelining stops overlapping DMA); after the round-5
    divide hoist the leaner body re-balanced the pipeline and block=2048 is
    +4.8% over 4096 (35.6M vs 33.8M env-windows/s at 32k envs, n_sub=64;
    1024 regresses to 33.9M) — now the default.
    """
    n, n_s = y.shape
    block = min(block, n)
    if (block % MIN_BLOCK and block != n) or n % block:
        raise ValueError(
            f"N={n} must tile by block={block} (multiple of {MIN_BLOCK})")
    h = dt / n_sub
    rows = block // LANE
    grid = (n // block,)
    kernel = partial(_window_kernel, n_ph=n_ph, n_sub=n_sub, h=h)

    def spec(n_rows):
        return pl.BlockSpec((n_rows, rows, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(1), spec(n_s), spec(len(P_FIELDS)), spec(len(U_FIELDS))],
        out_specs=spec(n_s),
        out_shape=jax.ShapeDtypeStruct((n_s, n // LANE, LANE), y.dtype),
        interpret=interpret,
    )(
        _to_tiles(t0[None, :], 1, block),
        _to_tiles(y.T, n_s, block),
        _to_tiles(p_pack, len(P_FIELDS), block),
        _to_tiles(u_pack, len(U_FIELDS), block),
    )
    return out.reshape(n_s, n).T
