"""Native C++ runtime tests — pins the C++ numerics to the Python oracle.

The native layer (pvderx/native/) is the host-side equivalent of the
reference's Fortran scipy internals (SURVEY.md §2.2). Its equations must
agree with pvderx/physics/rhs_core.py (the single source of truth) to f64
roundoff, and its integrators with their scipy twins.
"""
import dataclasses

import numpy as np
import pytest

from pvderx import native
from pvderx.oracle import scipy_ref
from pvderx.params import make_params, nominal_exog

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build unavailable: {native.load_error()}")

EVENTFUL = dict(v_g=0.8, s_irr=700.0, q_ref=0.1, g_load=0.2, b_load=-0.05,
                v_g2=0.05, phi_g2=0.7, dw_g=0.004, t_g=0.5)


def test_packed_field_order_frozen():
    """The C++ enums index packed arrays by the frozen P/U_ORDER; the live
    dataclass field order (what pack_struct uses) must still match it."""
    from pvderx.ops.window import P_FIELDS, U_FIELDS
    assert tuple(P_FIELDS) == native.P_ORDER
    assert tuple(U_FIELDS) == native.U_ORDER


@pytest.mark.parametrize("preset", ["10", "50", "250"])
def test_rhs_matches_python(preset):
    p = make_params(preset)
    u = dataclasses.replace(nominal_exog(), **EVENTFUL)
    y_ss = scipy_ref.steady_state(p, nominal_exog())
    rng = np.random.default_rng(42)
    for _ in range(25):
        y = y_ss + rng.normal(0.0, 0.05, y_ss.shape)
        d_py = scipy_ref.rhs_np(y, 0.123, p, u)
        d_c = native.rhs(y, 0.123, p, u)
        np.testing.assert_allclose(d_c, d_py, rtol=1e-12, atol=1e-12)


def test_rhs_tripped_and_const_vdc():
    p = make_params("50", const_vdc=1.0)
    u = dataclasses.replace(nominal_exog(p_ref=0.5), conn=0.0, ces=1.0)
    y = scipy_ref.steady_state(make_params("50"), nominal_exog())
    np.testing.assert_allclose(
        native.rhs(y, 0.0, p, u), scipy_ref.rhs_np(y, 0.0, p, u),
        rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("preset", ["10", "50"])
def test_rk4_window_matches_numpy(preset):
    p = make_params(preset)
    u = dataclasses.replace(nominal_exog(), v_g=0.7)
    y = scipy_ref.steady_state(p, nominal_exog())
    y_py = scipy_ref.rk4_window_np(y, 0.0, 1 / 60, 72, p, u)
    y_c = native.rk4_window(y, 0.0, 1 / 60, 72, p, u)
    np.testing.assert_allclose(y_c, y_py, rtol=0, atol=1e-13)


def test_dp54_matches_lsoda_truth():
    """Native adaptive DP5(4) at truth tolerances vs scipy LSODA truth."""
    p = make_params("10")
    u = nominal_exog()
    u_sag = dataclasses.replace(u, v_g=0.6)
    y = scipy_ref.steady_state(p, u)
    t = 0.0
    for k in range(12):
        uu = u_sag if 4 <= k < 8 else u
        y_l = scipy_ref.integrate_window(y, t, 1 / 60, p, uu)
        y = native.dp54_window(y, t, 1 / 60, p, uu)
        np.testing.assert_allclose(y, y_l, rtol=0, atol=1e-8)
        t += 1 / 60


def test_steady_state_matches_fsolve():
    for preset in ("10", "50"):
        p = make_params(preset)
        u = nominal_exog()
        ss_c = native.steady_state(p, u)
        ss_py = scipy_ref.steady_state(p, u)
        np.testing.assert_allclose(ss_c, ss_py, rtol=0, atol=1e-9)
        assert np.max(np.abs(native.rhs(ss_c, 0.0, p, u))) < 1e-9


def test_batch_matches_sequential():
    p = make_params("10")
    u0 = nominal_exog()
    u1 = dataclasses.replace(u0, v_g=0.75, s_irr=600.0)
    y = scipy_ref.steady_state(p, u0)
    rng = np.random.default_rng(7)
    Y = np.stack([y + rng.normal(0, 0.02, y.shape) for _ in range(8)])
    t0 = np.arange(8, dtype=np.float64) / 60.0
    out = native.rk4_window_batch(Y, t0, 1 / 60, 36, p, [u0, u1] * 4)
    for e in range(8):
        ref = native.rk4_window(Y[e], float(t0[e]), 1 / 60, 36, p,
                                [u0, u1][e % 2])
        np.testing.assert_allclose(out[e], ref, rtol=0, atol=0)


def test_native_trajectory_equivalence():
    """End-to-end: native DP54 trajectory vs scipy LSODA trajectory ≤5e-8
    (two independent adaptive integrators at 1e-10 tolerances accumulate
    ~1e-8 over a 0.5 s eventful horizon — measured 1.2e-8)."""
    p = make_params("10")
    u = nominal_exog()
    exogs = [dataclasses.replace(u, v_g=0.7) if 10 <= k < 20 else u
             for k in range(30)]
    tr_n = native.run_trajectory(p, exogs)
    tr_s = scipy_ref.run_trajectory(p, exogs)
    assert np.max(np.abs(tr_n - tr_s)) < 5e-8
