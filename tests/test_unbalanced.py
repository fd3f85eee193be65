"""Unbalanced three-phase grid (negative-sequence) tests — SPEC.md §3/§4.1.

Upstream parity: the reference three-phase DER model is unbalanced-capable
(SURVEY.md §2.1 #7); pvderx represents unbalance in symmetric-component form
(Exog.v_g2 / phi_g2). These tests pin the sequence algebra, oracle
equivalence under an unbalanced sag, and the Pallas kernel path.
"""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvderx import physics
from pvderx.ode import rk4_window
from pvderx.oracle import scipy_ref
from pvderx.params import make_params, nominal_exog
from pvderx.physics import rhs_core
from pvderx.physics.rhs_core import C

DT = 1.0 / 60.0


def test_sequence_extraction_identities():
    """pos-seq extraction rejects neg-seq exactly and vice versa."""
    a_k = rhs_core.cexpj(rhs_core._shift_angles(3, np), np)
    vp = C(np.float64(0.9), np.float64(0.2))
    vn = C(np.float64(0.15), np.float64(-0.05))
    v = rhs_core.cadd(rhs_core.cscale(a_k, 0.0),  # zeros of shape [3]
                      rhs_core.cadd(
                          rhs_core.cmul(C(vp.re + a_k.re * 0, vp.im + a_k.im * 0), a_k),
                          rhs_core.cmul(C(vn.re + a_k.re * 0, vn.im + a_k.im * 0),
                                        rhs_core.cconj(a_k))))
    v_pos = rhs_core.cmean(rhs_core.cmul(v, rhs_core.cconj(a_k)), np)
    v_neg = rhs_core.neg_seq(v, 3, np)
    np.testing.assert_allclose([v_pos.re, v_pos.im], [vp.re, vp.im], atol=1e-14)
    np.testing.assert_allclose([v_neg.re, v_neg.im], [vn.re, vn.im], atol=1e-14)


def test_neg_seq_zero_for_single_phase():
    v = C(np.ones(1), np.zeros(1))
    vn = rhs_core.neg_seq(v, 1, np)
    assert float(vn.re) == 0.0 and float(vn.im) == 0.0


def test_unbalanced_source_gives_unbalanced_phase_voltages():
    """With v_g2 > 0 the three PCC phase voltage magnitudes differ, and the
    injected source decomposes back into exactly (v_g, v_g2)."""
    p = make_params("50")
    u = dataclasses.replace(nominal_exog(), v_g=0.8, v_g2=0.12, phi_g2=0.7)
    i0 = C(np.zeros(3), np.zeros(3))  # open-circuit: v = v_g source
    v = rhs_core.pcc_voltage(i0, 0.0, p, u, np)
    mags = np.hypot(np.asarray(v.re), np.asarray(v.im))
    assert mags.std() > 0.01, mags          # genuinely unbalanced per phase
    a_k = rhs_core.cexpj(rhs_core._shift_angles(3, np), np)
    v_pos = rhs_core.cmean(rhs_core.cmul(v, rhs_core.cconj(a_k)), np)
    v_neg = rhs_core.neg_seq(v, 3, np)
    assert np.hypot(v_pos.re, v_pos.im) == pytest.approx(0.8, abs=1e-12)
    assert np.hypot(v_neg.re, v_neg.im) == pytest.approx(0.12, abs=1e-12)
    assert np.arctan2(v_neg.im, v_neg.re) == pytest.approx(0.7, abs=1e-12)


def test_single_phase_ignores_unbalance_fields():
    p = make_params("10")
    u = nominal_exog()
    u2 = dataclasses.replace(u, v_g2=0.3, phi_g2=1.0)
    y = rhs_core.steady_state_guess(p, u, np)
    np.testing.assert_array_equal(rhs_core.rhs(y, 0.1, p, u, np),
                                  rhs_core.rhs(y, 0.1, p, u2, np))


def _jax_rollout(p, exogs, y0, n_sub):
    pj = p.astype(jnp.float64)

    @partial(jax.jit, static_argnums=(2,))
    def win(y, args, n_sub):
        t0, uu = args
        return rk4_window(lambda yy, tt: physics.rhs(yy, tt, pj, uu),
                          y, t0, DT, n_sub)

    y = jnp.asarray(y0)
    out = [np.asarray(y)]
    for k, u in enumerate(exogs):
        y = win(y, (jnp.float64(k * DT), u.astype(jnp.float64)), n_sub)
        out.append(np.asarray(y))
    return np.stack(out)


def test_rk4_matches_lsoda_unbalanced_sag():
    """1.5 s three-phase trajectory with an unbalanced 0.7 pu sag — ≤1e-6
    (the judged equivalence gate extended to the unbalance feature)."""
    p = make_params("50")
    u = nominal_exog()
    u_sag = dataclasses.replace(u, v_g=0.7, v_g2=0.15, phi_g2=0.5)
    exogs = [u_sag if 30 <= k < 60 else u for k in range(90)]
    traj_o = scipy_ref.run_trajectory(p, exogs)
    traj_j = _jax_rollout(p, exogs, traj_o[0], 120)
    err = np.max(np.abs(traj_j - traj_o))
    assert err < 1e-6, f"max-abs-err {err:.3e}"


def test_kernel_matches_scan_unbalanced():
    """Pallas window kernel == scan path with per-env unbalance (3-phase)."""
    from pvderx.ops.window import (P_FIELDS, U_FIELDS, pack_struct,
                                   rk4_window_batch)
    dtype = jnp.float32
    n = 256
    p = make_params("50")
    u = nominal_exog()
    y0 = rhs_core.steady_state_guess(p, u, jnp).astype(dtype)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    y = jnp.tile(y0[None, :], (n, 1)) + 1e-3 * jax.random.normal(
        k1, (n, p.n_states), dtype)
    t0 = jax.random.uniform(k2, (n,), dtype)
    pf = jax.tree.map(lambda v: jnp.full((n,), v, dtype), p)
    uf = jax.tree.map(lambda v: jnp.full((n,), v, dtype), u)
    uf = dataclasses.replace(
        uf, v_g2=0.2 * jax.random.uniform(k3, (n,), dtype),
        phi_g2=jnp.linspace(0.0, 2.0, n, dtype=dtype))

    def win_one(yy, tt, pp, uu):
        return rk4_window(lambda a, b: rhs_core.rhs(a, b, pp, uu, jnp),
                          yy, tt, DT, 64)

    ref = jax.vmap(win_one, in_axes=(0, 0, 0, 0))(y, t0, pf, uf)
    out = rk4_window_batch(y, t0, pack_struct(pf, P_FIELDS),
                           pack_struct(uf, U_FIELDS), n_ph=3,
                           n_sub=64, dt=DT, block=n, interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert np.isfinite(err) and err < 5e-6, err


def test_scenario_json_and_builder_roundtrip():
    from pvderx.config import load_scenario
    from pvderx.scenario.events import EventBuilder, make_exog
    ev, sched = load_scenario("unbalanced_sag", dtype=np.float64)
    u = make_exog(sched, jnp.asarray(5.1), jnp.asarray(1.0), jnp.asarray(0.0),
                  jnp.asarray(1.0), jnp.asarray(0.0))
    assert float(u.v_g) == pytest.approx(0.7)
    assert float(u.v_g2) == pytest.approx(0.15)
    # pre-unbalance 4-column grid rows still build (zero-padded)
    ev2 = EventBuilder()
    ev2._grid = [(0.0, 1.0, 0.0, 0.0)]
    sched2 = ev2.build()
    assert sched2.grid.shape[1] == 6
    assert float(sched2.grid[0, 4]) == 0.0


def test_env_unbalanced_sag_episode():
    """Env with p_unb=1: an unbalanced sag appears and v_unb shows in info."""
    from pvderx.env import core, make_env_config
    cfg = make_env_config("50", n_sub=40, horizon=600,
                          scen=core.ScenarioConfig(
                              p_sag=1.0, p_unb=1.0, p_freq=0.0, p_cloud=0.0,
                              p_load=0.0, sag_t_lo=0.1, sag_t_hi=0.2,
                              sag_dur_lo=1.0, sag_dur_hi=1.5))
    st, obs = core.reset(cfg, jax.random.PRNGKey(4))
    assert float(st.sched.grid[1, 4]) > 0.0   # neg-seq component scheduled
    step = jax.jit(lambda s, a: core.step(cfg, s, a))
    seen_unb = 0.0
    for _ in range(30):
        st, obs, rew, done, info = step(st, jnp.zeros((), jnp.int32))
        seen_unb = max(seen_unb, float(info["v_unb"]))
        assert np.isfinite(float(rew))
    assert seen_unb > 0.01, seen_unb


def test_random_unbalanced_scenarios_property():
    """Property sweep over random unbalanced sags (depth, neg-seq fraction,
    angle, timing drawn from the env's ranges): RK4 at the three-phase knee
    (n_sub=88) vs LSODA ≤1e-6 on every draw."""
    rng = np.random.default_rng(7)
    p = make_params("50")
    u = nominal_exog()
    worst = 0.0
    for trial in range(5):
        depth = float(rng.uniform(0.3, 0.9))
        v2 = float(rng.uniform(0.0, 0.5)) * (1.0 - depth)
        phi2 = float(rng.uniform(0.0, 2 * np.pi))
        t1 = int(rng.integers(3, 12))
        dur = int(rng.integers(5, 15))
        u_sag = dataclasses.replace(u, v_g=depth, v_g2=v2, phi_g2=phi2)
        exogs = [u_sag if t1 <= k < t1 + dur else u for k in range(30)]
        traj_o = scipy_ref.run_trajectory(p, exogs)
        traj_j = _jax_rollout(p, exogs, traj_o[0], 88)
        err = np.max(np.abs(traj_j - traj_o))
        worst = max(worst, err)
        assert err < 1e-6, f"trial {trial}: max-abs-err {err:.3e}"
    print(f"worst unbalanced-random error at n_sub=88: {worst:.3e}")
