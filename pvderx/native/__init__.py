"""pvderx native runtime — ctypes bindings to the C++ numerics core.

The reference's native layer is scipy's Fortran (LSODA/ODEPACK integration +
MINPACK fsolve, SURVEY.md §2.2); pvderx's host-side equivalent is
``src/pvderx_native.cpp``: the same SPEC.md §§4-5 equations in C++ with a
fixed-step RK4, an adaptive Dormand-Prince 5(4) truth integrator, a Newton
steady-state solve, and an OpenMP-batched CPU engine. The TPU production
engine stays the Pallas kernel (pvderx/ops/window.py); this module serves

  * a ~200x faster reference/oracle path than scipy for equivalence sweeps
    (tests/test_native.py pins C++ vs Python-oracle agreement to <=1e-12),
  * a native CPU deployment engine (``rk4_window_batch``) for hosts without
    an accelerator,

and is built on first use with g++ (cached by source hash under ``_build/``).
``available()`` gates every consumer: no compiler -> scipy paths only.
"""
from __future__ import annotations

import ctypes
import dataclasses
import hashlib
import os
import subprocess
import tempfile

import numpy as np

from pvderx.params import DERParams, Exog

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "pvderx_native.cpp")

# Frozen packed-field orders (C++ enums P/U in pvderx_native.cpp).
# tests/test_native.py asserts these equal the live dataclass field order
# (i.e. pvderx.ops.window.P_FIELDS / U_FIELDS).
P_ORDER = (
    "rf", "lf", "rg", "xg", "kv", "w_base", "s_rated", "v_base", "i_base",
    "vdc_base", "tau_dc", "vdc_floor", "np_par", "isc_ref", "ki_t", "irs",
    "gamma", "w_f", "kp_gcc", "ki_gcc", "kp_dc", "ki_dc", "kp_q", "ki_q",
    "kp_pll", "ki_pll", "m_max", "i_max", "const_vdc",
)
U_ORDER = (
    "s_irr", "t_cell", "v_g", "phi_g", "dw_g", "t_g", "v_g2", "phi_g2",
    "g_load", "b_load", "vdc_ref", "q_ref", "conn", "ces", "p_ref",
)

_lib = None
_load_error: str | None = None


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    build_dir = os.path.join(_DIR, "_build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, f"libpvderx_native_{tag}.so")
    if os.path.exists(so):
        return so
    # write to a temp name then atomic-rename (concurrent test workers)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=build_dir)
    os.close(fd)
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
           "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, so)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return so


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(_build())
    except (OSError, subprocess.SubprocessError, FileNotFoundError) as e:
        _load_error = f"{type(e).__name__}: {e}"
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.pvdx_np_fields.restype = ctypes.c_int
    lib.pvdx_nu_fields.restype = ctypes.c_int
    lib.pvdx_rhs.argtypes = [ctypes.c_int, dp, ctypes.c_double, dp, dp, dp]
    lib.pvdx_rk4_window.argtypes = [
        ctypes.c_int, dp, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        dp, dp]
    lib.pvdx_dp54_window.restype = ctypes.c_int
    lib.pvdx_dp54_window.argtypes = [
        ctypes.c_int, dp, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, dp, dp]
    lib.pvdx_newton_steady.restype = ctypes.c_int
    lib.pvdx_newton_steady.argtypes = [
        ctypes.c_int, dp, dp, dp, ctypes.c_int, ctypes.c_double]
    lib.pvdx_rk4_window_batch.argtypes = [
        ctypes.c_int, ctypes.c_long, dp, dp, ctypes.c_double, ctypes.c_int,
        dp, ctypes.c_int, dp, ctypes.c_int]
    if lib.pvdx_np_fields() != len(P_ORDER) or \
            lib.pvdx_nu_fields() != len(U_ORDER):
        _load_error = "field-count mismatch between C++ enums and P/U_ORDER"
        return None
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native library compiled/loaded on this host."""
    return _load() is not None


def load_error() -> str | None:
    return _load_error


def _require():
    """The loaded library, or a clear error naming why it is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            f"pvderx native runtime unavailable on this host: {_load_error} "
            "(needs g++; check pvderx.native.available() before calling)")
    return lib


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def pack_params(p: DERParams) -> np.ndarray:
    return np.asarray([float(getattr(p, f)) for f in P_ORDER], np.float64)


def pack_exog(u: Exog) -> np.ndarray:
    return np.asarray([float(getattr(u, f)) for f in U_ORDER], np.float64)


def rhs(y, t: float, p: DERParams, u: Exog) -> np.ndarray:
    lib = _require()
    y = np.ascontiguousarray(y, np.float64)
    dy = np.empty_like(y)
    lib.pvdx_rhs(p.n_ph, _cptr(y), t, _cptr(pack_params(p)),
                 _cptr(pack_exog(u)), _cptr(dy))
    return dy


def rk4_window(y, t0: float, dt: float, n_sub: int, p: DERParams,
               u: Exog) -> np.ndarray:
    lib = _require()
    y = np.array(y, np.float64, copy=True, order="C")
    lib.pvdx_rk4_window(p.n_ph, _cptr(y), t0, dt, n_sub,
                        _cptr(pack_params(p)), _cptr(pack_exog(u)))
    return y


def dp54_window(y, t0: float, dt: float, p: DERParams, u: Exog,
                rtol: float = 1e-10, atol: float = 1e-10) -> np.ndarray:
    """Adaptive DP5(4) over one control window (native truth integrator)."""
    lib = _require()
    y = np.array(y, np.float64, copy=True, order="C")
    n = lib.pvdx_dp54_window(p.n_ph, _cptr(y), t0, dt, rtol, atol,
                             _cptr(pack_params(p)), _cptr(pack_exog(u)))
    if n < 0:
        raise RuntimeError(f"native DP54 failed at t0={t0}")
    return y


def steady_state(p: DERParams, u: Exog, iters: int = 50,
                 tol: float = 1e-11) -> np.ndarray:
    """Newton steady-state init (native fsolve analog, SPEC §7)."""
    from pvderx.physics import rhs_core
    lib = _require()
    y = np.array(rhs_core.steady_state_guess(p, u, np), np.float64,
                 copy=True, order="C")
    r = lib.pvdx_newton_steady(p.n_ph, _cptr(y), _cptr(pack_params(p)),
                               _cptr(pack_exog(u)), iters, tol)
    if r < 0:
        raise RuntimeError("native Newton steady-state did not converge")
    return y


def rk4_window_batch(y, t0, dt: float, n_sub: int, p, u) -> np.ndarray:
    """OpenMP-batched RK4 windows: y [N, n_states] -> y1.

    p: one DERParams (shared) or a list of N; u: one Exog or a list of N.
    """
    lib = _require()
    y = np.array(y, np.float64, copy=True, order="C")
    n_env, _ = y.shape
    t0 = np.ascontiguousarray(np.broadcast_to(np.asarray(t0, np.float64),
                                              (n_env,)))
    p_list = p if isinstance(p, (list, tuple)) else [p]
    u_list = u if isinstance(u, (list, tuple)) else [u]
    if len(p_list) not in (1, n_env):
        raise ValueError(f"params list has {len(p_list)} entries; "
                         f"need 1 (shared) or n_env={n_env}")
    if len(u_list) not in (1, n_env):
        raise ValueError(f"exog list has {len(u_list)} entries; "
                         f"need 1 (shared) or n_env={n_env}")
    n_ph = p_list[0].n_ph
    if any(q.n_ph != n_ph for q in p_list):
        raise ValueError("mixed n_ph across the params list")
    pp = np.ascontiguousarray(np.stack([pack_params(q) for q in p_list]))
    uu = np.ascontiguousarray(np.stack([pack_exog(q) for q in u_list]))
    lib.pvdx_rk4_window_batch(
        n_ph, n_env, _cptr(y), _cptr(t0), dt, n_sub,
        _cptr(pp), int(len(p_list) > 1), _cptr(uu), int(len(u_list) > 1))
    return y


def run_trajectory(p: DERParams, exog_seq, y0=None, dt: float = 1.0 / 60.0,
                   rtol: float = 1e-10, atol: float = 1e-10) -> np.ndarray:
    """Native twin of pvderx.oracle.scipy_ref.run_trajectory (DP54 windows)."""
    if y0 is None:
        y0 = steady_state(p, exog_seq[0])
    ys = [np.asarray(y0, np.float64)]
    for k, u in enumerate(exog_seq):
        ys.append(dp54_window(ys[-1], k * dt, dt, p, u, rtol, atol))
    return np.stack(ys)
