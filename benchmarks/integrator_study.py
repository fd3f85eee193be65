"""Accuracy study: RK4 vs ETDRK4 (exponential integrator) substep counts.

The u-filter mode (w_f = 6283 rad/s) is linear and diagonal — ETDRK4
(Cox-Matthews) integrates it exactly, so the substep count should be set by
the remaining non-stiff dynamics. This script measures max-abs-err vs the
LSODA truth oracle over the hardest scenario (deep 0.45 pu sag entry/exit +
current-limiter engagement) as a function of n_sub for both schemes, f64.

Run: python benchmarks/integrator_study.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

import numpy as np

from pvderx.oracle import scipy_ref
from pvderx.params import make_params, nominal_exog
from pvderx.physics import rhs_core

DT = 1.0 / 60.0


def lin_diag(p):
    """Diagonal linear part L of the RHS: -w_f on the u-filter rows, 0 else."""
    n = p.n_ph
    L = np.zeros(6 * n + 5)
    L[4 * n:6 * n] = -p.w_f
    return L


def phi_coeffs(z):
    """ETDRK4 (Cox-Matthews 2002) coefficients for diagonal z = L*h.

    Returns (E, E2, a_w, f1, f2, f3): all per-component. Taylor blend for
    |z| < 0.25 avoids catastrophic cancellation (z == 0 for most rows).
    """
    z = np.asarray(z, dtype=np.float64)
    small = np.abs(z) < 1e-2   # direct form's z^3 cancellation is < 1e-12 here
    zs = np.where(small, 1.0, z)  # safe divisor
    E = np.exp(z)
    E2 = np.exp(z / 2.0)
    # a_w = 2*phi1(z/2) = 2(e^{z/2}-1)/z  (used as (h/2)*a_w = h*phi1(z/2)/1)
    a_w = np.where(small,
                   1 + z/4 + z**2/24 + z**3/192 + z**4/1920,
                   (E2 - 1.0) / (zs / 2.0))
    f1 = np.where(small,
                  1/6 + z/6 + z**2*(3/40) + z**3/45 + z**4*(5/1008),
                  (-4.0 - z + E * (4.0 - 3.0*z + z*z)) / (zs**3))
    f2 = np.where(small,
                  1/6 + z/12 + z**2/40 + z**3/180 + z**4/1008,
                  (2.0 + z + E * (-2.0 + z)) / (zs**3))
    f3 = np.where(small,
                  1/6 - z**2/120 - z**3/360 - z**4/1680,
                  (-4.0 - 3.0*z - z*z + E * (4.0 - z)) / (zs**3))
    return E, E2, a_w, f1, f2, f3


def etdrk4_window_np(y, t0, dt, n_sub, p, u):
    h = dt / n_sub
    L = lin_diag(p)
    z = L * h
    E, E2, a_w, f1, f2, f3 = phi_coeffs(z)
    y = np.asarray(y, dtype=np.float64)

    def N(yy, t):
        return scipy_ref.rhs_np(yy, t, p, u) - L * yy

    for k in range(n_sub):
        t = t0 + k * h
        Nu = N(y, t)
        a = E2 * y + (0.5 * h) * a_w * Nu
        Na = N(a, t + 0.5 * h)
        b = E2 * y + (0.5 * h) * a_w * Na
        Nb = N(b, t + 0.5 * h)
        c = E2 * a + (0.5 * h) * a_w * (2.0 * Nb - Nu)
        Nc = N(c, t + h)
        y = E * y + h * (f1 * Nu + 2.0 * f2 * (Na + Nb) + f3 * Nc)
    return y


def graded(n_small, frac, n_big):
    """Substep schedule: n_small steps over the first `frac` of the window
    (resolving the ZOH-step w_f transient), n_big over the rest."""
    return ([frac / n_small] * n_small) + ([(1.0 - frac) / n_big] * n_big)


def rk4_sched_np(y, t0, dt, sched, p, u):
    y = np.asarray(y, dtype=np.float64)
    t = t0
    for hf in sched:
        h = hf * dt
        k1 = scipy_ref.rhs_np(y, t, p, u)
        k2 = scipy_ref.rhs_np(y + 0.5 * h * k1, t + 0.5 * h, p, u)
        k3 = scipy_ref.rhs_np(y + 0.5 * h * k2, t + 0.5 * h, p, u)
        k4 = scipy_ref.rhs_np(y + h * k3, t + h, p, u)
        y = y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        t += h
    return y


def etdrk4_sched_np(y, t0, dt, sched, p, u):
    L = lin_diag(p)
    y = np.asarray(y, dtype=np.float64)

    def N(yy, t):
        return scipy_ref.rhs_np(yy, t, p, u) - L * yy

    t = t0
    for hf in sched:
        h = hf * dt
        E, E2, a_w, f1, f2, f3 = phi_coeffs(L * h)
        Nu = N(y, t)
        a = E2 * y + (0.5 * h) * a_w * Nu
        Na = N(a, t + 0.5 * h)
        b = E2 * y + (0.5 * h) * a_w * Na
        Nb = N(b, t + 0.5 * h)
        c = E2 * a + (0.5 * h) * a_w * (2.0 * Nb - Nu)
        Nc = N(c, t + h)
        y = E * y + h * (f1 * Nu + 2.0 * f2 * (Na + Nb) + f3 * Nc)
        t += h
    return y


def phi_coeffs_c(z):
    """Complex-z ETDRK4 coefficients (no small-z branch needed: |z| >> 0)."""
    E = np.exp(z)
    E2 = np.exp(z / 2.0)
    a_w = (E2 - 1.0) / (z / 2.0)
    f1 = (-4.0 - z + E * (4.0 - 3.0 * z + z * z)) / z**3
    f2 = (2.0 + z + E * (-2.0 + z)) / z**3
    f3 = (-4.0 - 3.0 * z - z * z + E * (4.0 - z)) / z**3
    return E, E2, a_w, f1, f2, f3


def xetd_window_np(y, t0, dt, n_sub, p, u):
    """ETDRK4 with L covering BOTH diagonal-linear blocks:
      i-rows (complex): conn*(-wb*rf/lf - j*wb - (wb/lf)*conn/y_tot) + (1-conn)*(-wb)
      u-rows (real):    -w_f
    Everything else (controller integrators, Vdc, PLL) stays in N. Both
    blocks' coefficients are window-invariant under the ZOH exog contract."""
    n = p.n_ph
    h = dt / n_sub
    wb, lf, rf = p.w_base, p.lf, p.rf
    y_g = 1.0 / (p.rg + 1j * p.xg)
    y_tot = y_g + (u.g_load + 1j * u.b_load)
    cn = u.conn
    c_i = cn * (-wb * rf / lf - 1j * wb - (wb / lf) * cn / y_tot) \
        + (1.0 - cn) * (-wb)
    z_i = c_i * h
    Ei, E2i, awi, f1i, f2i, f3i = phi_coeffs_c(np.asarray(z_i, np.complex128))
    z_u = -p.w_f * h
    Eu, E2u, awu, f1u, f2u, f3u = phi_coeffs(np.asarray(z_u))
    # zero rows: exact limits
    c16 = 1.0 / 6.0

    def to_c(yy):
        i = yy[0:n] + 1j * yy[n:2*n]
        x = yy[2*n:3*n] + 1j * yy[3*n:4*n]
        uf = yy[4*n:5*n] + 1j * yy[5*n:6*n]
        return i, x, uf, yy[6*n:]

    def to_r(i, x, uf, tail):
        return np.concatenate([i.real, i.imag, x.real, x.imag,
                               uf.real, uf.imag, tail])

    def N(yy, t):
        d = scipy_ref.rhs_np(yy, t, p, u)
        di, dx, duf, dtail = to_c(d)
        i, x, uf, tail = to_c(yy)
        return (di - c_i * i, dx, duf + p.w_f * uf, dtail)

    def lincomb(yy, E_pair, terms):
        """E∘y + sum(coef∘term): per-block complex/real/zero application."""
        i, x, uf, tail = to_c(yy)
        Ei_, Eu_ = E_pair
        ri = Ei_ * i + sum(c[0] * tN[0] for c, tN in terms)
        rx = x + sum(c[2] * tN[1] for c, tN in terms)
        ruf = Eu_ * uf + sum(c[1] * tN[2] for c, tN in terms)
        rtail = tail + sum(c[2] * tN[3] for c, tN in terms)
        return to_r(ri, rx, ruf, rtail)

    t = t0
    for k in range(n_sub):
        Nu = N(y, t)
        # stage coefficients: (i_coef, u_coef, zero_coef) per phi term
        q = (0.5 * h)
        a = lincomb(y, (E2i, E2u), [((q * awi, q * awu, q * 1.0), Nu)])
        Na = N(a, t + 0.5 * h)
        b = lincomb(y, (E2i, E2u), [((q * awi, q * awu, q * 1.0), Na)])
        Nb = N(b, t + 0.5 * h)
        twoNb_mNu = tuple(2.0 * nb - nu for nb, nu in zip(Nb, Nu))
        c = lincomb(a, (E2i, E2u), [((q * awi, q * awu, q * 1.0), twoNb_mNu)])
        Nc = N(c, t + h)
        y = lincomb(y, (Ei, Eu), [
            ((h * f1i, h * f1u, h * c16), Nu),
            ((2 * h * f2i, 2 * h * f2u, 2 * h * c16),
             tuple(na + nb for na, nb in zip(Na, Nb))),
            ((h * f3i, h * f3u, h * c16), Nc),
        ])
        t += h
    return y


def rollout(window_fn, y0, exogs, n_sub, p):
    y = np.asarray(y0, dtype=np.float64)
    out = [y]
    for k, u in enumerate(exogs):
        y = window_fn(y, k * DT, DT, n_sub, p, u)
        out.append(y)
    return np.stack(out)


def main():
    for preset in ("10", "50"):
        p = make_params(preset)
        u = nominal_exog()
        u_sag = dataclasses.replace(u, v_g=0.45)
        exogs = [u_sag if 30 <= k < 60 else u for k in range(90)]
        truth = scipy_ref.run_trajectory(p, exogs)
        y0 = truth[0]
        print(f"--- preset {preset} (0.45 pu sag, 1.5 s) ---")
        for n_sub in (48, 64, 72):
            tr = rollout(scipy_ref.rk4_window_np, y0, exogs, n_sub, p)
            print(f"RK4    n_sub={n_sub:3d}: max-err {np.max(np.abs(tr - truth)):.2e}")
        for n_sub in (12, 16, 24, 32, 48):
            tr = rollout(etdrk4_window_np, y0, exogs, n_sub, p)
            print(f"ETDRK4 n_sub={n_sub:3d}: max-err {np.max(np.abs(tr - truth)):.2e}")
        for n_sub in (4, 6, 8, 12, 16, 24):
            tr = rollout(xetd_window_np, y0, exogs, n_sub, p)
            print(f"xETD   n_sub={n_sub:3d}: max-err {np.max(np.abs(tr - truth)):.2e}")
        for ns, fr, nb in ((12, 0.08, 12), (16, 0.08, 12), (16, 0.10, 16),
                           (20, 0.12, 20), (24, 0.15, 24)):
            sched = graded(ns, fr, nb)
            for name, fn in (("gETD", etdrk4_sched_np),):
                tr = rollout(lambda y, t0, dt, _n, pp, uu: fn(y, t0, dt, sched, pp, uu),
                             y0, exogs, 0, p)
                print(f"{name} {ns}@{fr}+{nb} (={ns+nb}): "
                      f"max-err {np.max(np.abs(tr - truth)):.2e}")
        for ns, fr, nb in ((12, 0.08, 40), (16, 0.10, 40), (8, 0.05, 44)):
            sched = graded(ns, fr, nb)
            tr = rollout(lambda y, t0, dt, _n, pp, uu: rk4_sched_np(y, t0, dt, sched, pp, uu),
                         y0, exogs, 0, p)
            print(f"gRK4 {ns}@{fr}+{nb} (={ns+nb}): "
                  f"max-err {np.max(np.abs(tr - truth)):.2e}")


if __name__ == "__main__":
    main()
