"""Batched environment: jit(vmap(step)) factories.

This is the core TPU design (SURVEY.md §2.5): all env state is a pytree of
[N, ...] leaves; stepping N envs is one fused XLA program. The config is
closed over (its scalars become compile-time constants).

The window integration (step 3 of SURVEY.md §3.2, ~95% of the math) has two
interchangeable implementations:

- ``scan``:   jax.vmap over the per-env `lax.scan` RK4 (pure XLA) — works on
              any backend/batch size; each substep round-trips HBM.
- ``pallas``: the fused VMEM-resident window kernel (pvderx/ops/window.py) —
              one HBM read/write per *window* instead of per substep;
              0.90 ms/window at 32k envs / n_sub=64 (the f32 knee) on a
              v5e (~20x the XLA per-substep scan path). Roofline (measured,
              benchmarks/roofline.py round 5): 923 VPU ops per env-substep
              (analytic jaxpr count, cross-checked vs XLA cost_analysis;
              947 before the round-5 divide hoist — 8 per-RHS divides with
              window-invariant divisors now ride Prep as reciprocal
              multiplies) at 0.43 ns/env-substep kernel-only (block=2048,
              re-tuned post-hoist) = 2.19 T ops/s = **56% of the v5e VPU
              issue ceiling** (70% weighting transcendentals/divides at 4
              passes), HBM at 1.1% — compute-bound at the issue rate, not
              bandwidth. The kernel is 93% of the step; all remaining XLA
              ops (obs/reward/events/autoreset) total 7.0%
              (benchmarks/kernel_split.py, round-5 post-hoist re-measure,
              scalar-fetch-synced).

``window="auto"`` picks pallas on TPU backends when the batch tiles legally.
Both paths share the identical `rhs_core` physics and agree to f32 roundoff
(tested in tests/test_env.py).

Multi-chip (``mesh=``): pass a `jax.sharding.Mesh` with an 'env' axis and the
kernel invocation is wrapped in `jax.shard_map` over that axis — each chip
runs the Mosaic kernel on its LOCAL shard of the batch by construction,
instead of relying on GSPMD auto-partitioning a `pallas_call` (which works on
one chip but is not a contract on eight). The per-shard batch must still tile
legally (N/num_env_shards % 128 == 0). Everything outside the kernel stays
GSPMD-partitioned as before. Exercised on the 8-virtual-device CPU mesh in
tests/test_dist.py and by `__graft_entry__.dryrun_multichip`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from pvderx.env import core


# reset-compile chunk width: reset bodies are compiled at this env width and
# looped via lax.map for larger batches (see make_batch_fns.reset_batch)
RESET_CHUNK = 4096


def _where_done(done, a, b):
    """jnp.where with done [N] broadcast against [N, ...] leaves."""
    d = done.reshape(done.shape + (1,) * (a.ndim - 1))
    return jnp.where(d, a, b)


def _effective_block(n: int, block: int, cap: int = 8192) -> int:
    """Largest legal kernel block for an n-env (per-shard) batch: the
    configured block when it tiles n; otherwise fall back to one whole-batch
    block (legal for any n % 128 == 0) up to `cap` rather than silently
    demoting to the ~20x slower scan path — the round-5 block re-tune
    (4096→2048) would otherwise have demoted batch sizes like N=3072 that
    previously ran as a single whole-batch block (review finding, round 5).
    `cap` bounds the fallback's VMEM footprint: 8192 for the single-DER
    kernel; the fleet path passes its own VMEM-limited block (a 1536-env
    whole-batch fleet block at M=16 exceeds the 24 MiB Mosaic cap)."""
    b = min(block, n)
    if b and n % b == 0:
        return b
    if n % 128 == 0 and n <= cap:
        return n
    return b


def _use_pallas(window: str, n: int, block: int) -> bool:
    if window == "scan":
        return False
    # legal tilings: whole batch in one block, or grid blocks of >=1024
    # (8 sublanes x 128 lanes per f32 tile — see pvderx/ops/window.py)
    tilable = n % 128 == 0 and (n <= block or (n % block == 0
                                               and block % 1024 == 0))
    if window == "pallas":
        if not tilable:
            raise ValueError(
                f"window='pallas' needs N % 128 == 0 and N tiled by "
                f"block={block}, got N={n}")
        return True
    return tilable and jax.default_backend() not in ("cpu",)


def _local_envs(n: int, mesh) -> int | None:
    """Per-shard env count under the mesh's 'env' axis (n if no mesh).

    Returns None when N does not divide across the env shards — the caller
    falls back to the scan path (window='auto') or raises (window='pallas');
    a non-divisible batch is only a constraint for the per-shard KERNEL, not
    for GSPMD-partitioned scan stepping."""
    if mesh is None:
        return n
    from pvderx.dist.mesh import ENV_AXIS
    n_sh = mesh.shape[ENV_AXIS]
    if n % n_sh:
        return None
    return n // n_sh


def _warn_scan_fallback(n: int, mesh) -> None:
    """Loud warning when window='auto' skips the kernel because the batch
    doesn't divide across the mesh's env shards — the scan path is ~20x
    slower, which must never happen silently."""
    import warnings

    from pvderx.dist.mesh import ENV_AXIS
    warnings.warn(
        f"mesh batch N={n} does not divide across the "
        f"{mesh.shape[ENV_AXIS]} 'env' shards: falling back to the ~20x "
        f"slower scan path (pick N as a multiple of "
        f"{128 * mesh.shape[ENV_AXIS]} for the per-shard Pallas kernel)",
        stacklevel=3)


def _shard_mapped_window(kern, mesh, n_args_rank2):
    """Wrap a window-kernel call in shard_map over the mesh 'env' axis.

    kern(y, t, p_pack, u_pack) -> y1, with the env axis leading on y/t and
    second on the packed params/exog. Each shard runs the Mosaic kernel on
    its local rows — the structural multi-chip guarantee (module docstring).
    """
    from pvderx.dist.mesh import ENV_AXIS
    P = PartitionSpec
    env_first = P(ENV_AXIS)                    # y [N, ...], t [N]
    env_second = P(None, ENV_AXIS)             # packed [n_fields, N, ...]
    in_specs = (env_first, env_first) + (env_second,) * n_args_rank2
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation; the data dependence y1(y, t, p, u) is trivially env-varying
    return jax.shard_map(kern, mesh=mesh, in_specs=in_specs,
                         out_specs=env_first, check_vma=False)


def _step_batch_impl(cfg: core.EnvConfig, state, actions, *, window: str,
                     block: int, autoreset: bool, p_pack=None, mesh=None):
    if cfg.integrator != "rk4":
        # the fused kernel implements RK4 only; implicit schemes (selectable
        # per SURVEY.md §2.2) run the vmapped scan path
        if window == "pallas":
            raise ValueError(
                f"window='pallas' supports integrator='rk4' only, got "
                f"{cfg.integrator!r} (use window='auto'/'scan')")
        window = "scan"
    n = state.y.shape[0]
    n_loc = _local_envs(n, mesh)
    if n_loc is None:
        if window == "pallas":
            raise ValueError(
                f"window='pallas' with mesh needs N={n} divisible by the "
                f"'env' shard count (each shard runs the kernel locally)")
        if window == "auto":
            # an explicit window='scan' is not a fallback — don't cry wolf
            _warn_scan_fallback(n, mesh)
        window, n_loc = "scan", n
    blk = _effective_block(n_loc, block)
    if _use_pallas(window, n_loc, blk):
        from pvderx.ops.window import (
            P_FIELDS, U_FIELDS, pack_struct, rk4_window_batch)
        t, exog, mppt, flag = jax.vmap(
            lambda s, a: core._pre_window(cfg, s, a))(state, actions)
        if p_pack is None:
            p_pack = pack_struct(state.der, P_FIELDS)
        kern = partial(
            rk4_window_batch, n_ph=cfg.der.n_ph, n_sub=cfg.n_sub,
            dt=cfg.dt_ctrl, block=blk,
            interpret=jax.default_backend() == "cpu")
        if mesh is not None:
            kern = _shard_mapped_window(kern, mesh, n_args_rank2=2)
        y1 = kern(state.y, t, p_pack, pack_struct(exog, U_FIELDS))
        out = jax.vmap(
            lambda s, e, m, tt, yy, fl: core._post_window(
                cfg, s, e, m, tt, yy, fl),
        )(state, exog, mppt, t, y1, flag)
    else:
        out = jax.vmap(lambda s, a: core.step(cfg, s, a))(state, actions)

    st1, obs, reward, done, info = out
    if not autoreset:
        return st1, obs, reward, done, info
    st_r, obs_r = jax.vmap(lambda s: core._soft_reset(cfg, s))(st1)
    st2 = jax.tree.map(partial(_where_done, done), st_r, st1)
    obs2 = _where_done(done, obs_r, obs)
    return st2, obs2, reward, done, info


def make_batch_fns(cfg: core.EnvConfig, autoreset: bool = True,
                   donate: bool = True, window: str = "auto",
                   block: int = 2048, mesh=None):
    """Returns (reset_batch(keys) -> (state, obs),
                step_batch(state, actions) -> (state, obs, reward, done, info)).

    keys: [N, 2] PRNG keys; actions: [N] int32. All outputs batched on axis 0.
    window: "auto" | "pallas" | "scan"; mesh: optional Mesh with an 'env'
    axis for the shard_map'd multi-chip kernel path (see module docstring).
    """

    @jax.jit
    def reset_batch(keys):
        f = jax.vmap(lambda k: core.reset(cfg, k))
        n = keys.shape[0]
        if mesh is not None or n <= RESET_CHUNK or n % RESET_CHUNK:
            return f(keys)
        # compile-time control (round-5): XLA's compile time for the reset
        # program GROWS with batch width (measured on a v5e host: 3.7 s at
        # <=4096 envs vs 8-23 s at 32768, the batched 11x11 LU of the Newton
        # init being the worst scaler), while the per-env math is width-
        # independent. Compiling the body ONCE at a fixed 4096-env width and
        # lax.map-ing over chunks cuts the 32k-env cold reset compile ~2-6x
        # at identical steady-state runtime (2.0 s) — and makes reset MORE
        # width-invariant, since every env now runs in a 4096-wide program
        # regardless of N (chunked-vs-direct y agrees to <1e-9, below one
        # f32 ulp of the obs; obs bitwise equal, measured). Skipped under a
        # mesh: GSPMD already compiles per-shard widths, and a serial chunk
        # loop would defeat cross-chip parallelism.
        out = jax.lax.map(
            f, keys.reshape(n // RESET_CHUNK, RESET_CHUNK, *keys.shape[1:]))
        return jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), out)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_batch(state, actions):
        return _step_batch_impl(cfg, state, actions, window=window,
                                block=block, autoreset=autoreset, mesh=mesh)

    return reset_batch, step_batch


def make_batch_fns_df(cfg: core.EnvConfig, autoreset: bool = True,
                      donate: bool = True, block: int = 1024):
    """The df32 precision tier at the ENV surface (round 5): same contract
    as `make_batch_fns`, but the ODE state is carried as a two-float32
    (hi, lo) pair through the double-float window kernel
    (`pvderx.ops.dualfloat.rk4_window_batch_df`) — the ≤1e-6 trajectory
    contract on-chip (measured 8.9e-7 vs the f64 LSODA truth on the gate
    scenario, `benchmarks/DUALFLOAT.json`) at a measured 5.1× kernel cost.

    Returns (reset_df(keys) -> ((state, y_lo), obs),
             step_df((state, y_lo), actions) -> ((state, y_lo), obs, r,
             done, info)).
    The carry is the plain EnvState plus the [N, n_states] lo residual —
    NOT a new EnvState field, so checkpoints/shardings of the f32 tier are
    untouched. Observations/rewards/termination evaluate on the hi part
    (they are f32-precision surfaces by contract); the lo part rides the
    integration and zeroes on auto-reset (the cached y0 is an exact-f32
    episode anchor). Requires integrator='rk4'; runs the interpret-mode
    kernel off-TPU (slow — CPU use is for tests).
    """
    if cfg.integrator != "rk4":
        raise ValueError("the df32 tier implements integrator='rk4' only")
    from pvderx.ops.dualfloat import rk4_window_batch_df
    from pvderx.ops.window import P_FIELDS, U_FIELDS, pack_struct

    @jax.jit
    def reset_df(keys):
        f = jax.vmap(lambda k: core.reset(cfg, k))
        state, obs = f(keys)
        return (state, jnp.zeros_like(state.y)), obs

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_df(carry, actions):
        state, y_lo = carry
        t, exog, mppt, flag = jax.vmap(
            lambda s, a: core._pre_window(cfg, s, a))(state, actions)
        p_pack = pack_struct(state.der, P_FIELDS)
        n = state.y.shape[0]
        y1, y1_lo = rk4_window_batch_df(
            state.y, y_lo, t, p_pack, pack_struct(exog, U_FIELDS),
            n_ph=cfg.der.n_ph, n_sub=cfg.n_sub, dt=cfg.dt_ctrl,
            block=min(block, n),
            interpret=jax.default_backend() == "cpu")
        st1, obs, reward, done, info = jax.vmap(
            lambda s, e, m, tt, yy, fl: core._post_window(
                cfg, s, e, m, tt, yy, fl),
        )(state, exog, mppt, t, y1, flag)
        if not autoreset:
            return (st1, y1_lo), obs, reward, done, info
        st_r, obs_r = jax.vmap(lambda s: core._soft_reset(cfg, s))(st1)
        st2 = jax.tree.map(partial(_where_done, done), st_r, st1)
        obs2 = _where_done(done, obs_r, obs)
        y_lo2 = _where_done(done, jnp.zeros_like(y1_lo), y1_lo)
        return (st2, y_lo2), obs2, reward, done, info

    return reset_df, step_df


def rollout(cfg: core.EnvConfig, state, obs, policy_fn, n_steps: int, key,
            window: str = "auto", block: int = 2048, mesh=None):
    """Scan a policy over n_steps of a batched env with auto-reset.

    policy_fn(obs, key) -> actions [N]. Returns (state, obs, rewards [T,N],
    dones [T,N]). The time axis is a lax.scan (SURVEY.md §5: the TPU analog of
    sequence parallelism is the rollout time axis; use jax.checkpoint upstream
    for very long horizons). mesh: as in `make_batch_fns`.
    """

    # per-env params never change across steps (soft reset keeps der), so the
    # [n_p, N] kernel packing is loop-invariant: pack once outside the scan
    # instead of re-stacking 27 [N] fields in every step's body
    p_pack = None
    n_loc = _local_envs(state.y.shape[0], mesh)
    if (cfg.integrator == "rk4" and n_loc is not None
            and _use_pallas(window, n_loc, _effective_block(n_loc, block))):
        from pvderx.ops.window import P_FIELDS, pack_struct
        p_pack = pack_struct(state.der, P_FIELDS)

    def body(carry, k):
        st, ob = carry
        acts = policy_fn(ob, k)
        st, ob, rew, done, _ = _step_batch_impl(
            cfg, st, acts, window=window, block=block, autoreset=True,
            p_pack=p_pack, mesh=mesh)
        return (st, ob), (rew, done)

    keys = jax.random.split(key, n_steps)
    (state, obs), (rews, dones) = jax.lax.scan(body, (state, obs), keys)
    return state, obs, rews, dones
