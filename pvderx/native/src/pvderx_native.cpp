// pvderx native runtime — C++ implementation of the PV-DER ODE numerics.
//
// This is the TPU-framework's host-side native layer: the reference stack's
// only native code is scipy's Fortran (LSODA/ODEPACK for integration, MINPACK
// hybrd for steady-state init — SURVEY.md §2.2); pvderx's equivalent is this
// translation unit. It implements the SAME equations as
// pvderx/physics/rhs_core.py (SPEC.md §§4-5, single source of truth for the
// math; agreement pinned to <=1e-12 by tests/test_native.py):
//
//   * rhs          — dy/dt for the 11-state (1-phase) / 23-state (3-phase)
//                    model, f64, std::complex phasors
//   * rk4 window   — fixed-step classical RK4 over one control window
//                    (mirror of pvderx/ode/rk4.py arithmetic order)
//   * dp54 window  — adaptive Dormand-Prince 5(4) with PI-free step control,
//                    the native analog of scipy's LSODA truth oracle
//   * newton       — full-step Newton with forward-difference Jacobian + partial
//                    -pivot LU, the native analog of MINPACK fsolve
//   * batched rk4  — OpenMP-parallel window integration over N envs (the
//                    native CPU production engine; the TPU engine is the
//                    Pallas kernel in pvderx/ops/window.py)
//
// Field orders of the packed parameter/exog arrays are FROZEN to the Python
// dataclass field order (pvderx/params.py DERParams minus n_ph, Exog);
// tests/test_native.py asserts the Python side still matches these enums.

#include <cmath>
#include <complex>
#include <cstring>
#include <algorithm>

using std::complex;
using cd = complex<double>;

extern "C" {

// ---- packed field indices (must match pvderx.ops.window.P_FIELDS/U_FIELDS)
enum P {
  RF, LF, RG, XG, KV, W_BASE, S_RATED, V_BASE, I_BASE, VDC_BASE,
  TAU_DC, VDC_FLOOR, NP_PAR, ISC_REF, KI_T, IRS, GAMMA,
  W_F, KP_GCC, KI_GCC, KP_DC, KI_DC, KP_Q, KI_Q, KP_PLL, KI_PLL,
  M_MAX, I_MAX, CONST_VDC, NP_FIELDS
};
enum U {
  S_IRR, T_CELL, V_G, PHI_G, DW_G, T_G, V_G2, PHI_G2, G_LOAD, B_LOAD,
  VDC_REF, Q_REF, CONN, CES, P_REF, NU_FIELDS
};

int pvdx_np_fields(void) { return NP_FIELDS; }
int pvdx_nu_fields(void) { return NU_FIELDS; }

}  // extern "C" (reopened below for the API)

static const double TWO_PI_3 = 2.0 * M_PI / 3.0;
static const double SAT_K = 16.0;      // SPEC.md §4 soft-limit p-norm
static const double AW_KAPPA = 40.0;   // anti-windup sigmoid sharpness
static const double VDC_PIN_RATE = 1000.0;  // const-Vdc variant pin [1/s]
static const double T_REF_K = 298.15;
static const int MAX_NS = 23;          // 3-phase state count

// soft radial limiter (rhs_core.soft_limit_scale; r^16 by repeated squaring)
static inline double soft_limit(double mag, double lim) {
  double r = std::min(mag / lim, 8.0);
  double r2 = r * r, r4 = r2 * r2, r8 = r4 * r4;
  return std::pow(1.0 + r8 * r8, -1.0 / SAT_K);
}

static inline double aw_gate(double mag, double lim) {
  double z = AW_KAPPA * (1.0 - mag / lim);
  return 1.0 / (1.0 + std::exp(-std::min(z, 40.0)));
}

// dy/dt per SPEC.md §5 — mirrors rhs_core.rhs (n_ph = 1 or 3).
static void rhs(int n_ph, const double* y, double t, const double* p,
                const double* u, double* dy) {
  const int n = n_ph;
  cd i[3], x[3], uf[3];
  for (int k = 0; k < n; ++k) {
    i[k]  = cd(y[0 * n + k], y[1 * n + k]);
    x[k]  = cd(y[2 * n + k], y[3 * n + k]);
    uf[k] = cd(y[4 * n + k], y[5 * n + k]);
  }
  const double vdc = y[6 * n + 0], xdc = y[6 * n + 1], xq = y[6 * n + 2],
               xpll = y[6 * n + 3], theta = y[6 * n + 4];

  // ---- prep invariants (rhs_core.prep_invariants)
  const cd y_g = 1.0 / cd(p[RG], p[XG]);
  const cd y_tot = y_g + cd(u[G_LOAD], u[B_LOAD]);
  const double en = u[CONN] * (1.0 - u[CES]);
  const double iph =
      (p[ISC_REF] + p[KI_T] * (u[T_CELL] - T_REF_K)) * (u[S_IRR] / 1000.0);
  cd a_k[3] = {1.0, 1.0, 1.0};
  if (n == 3) {
    a_k[1] = std::polar(1.0, -TWO_PI_3);
    a_k[2] = std::polar(1.0, TWO_PI_3);
  }

  // ---- PCC voltage (rhs_core.pcc_voltage, SPEC §4.1-4.2)
  const cd rot =
      std::polar(1.0, u[PHI_G] + p[W_BASE] * u[DW_G] * (t - u[T_G]));
  const cd v_gpos = u[V_G] * rot;
  cd v[3];
  for (int k = 0; k < n; ++k) {
    cd v_gk = (n == 1) ? v_gpos
                       : v_gpos * a_k[k] +
                             rot * (u[V_G2] * std::polar(1.0, u[PHI_G2]) *
                                    std::conj(a_k[k]));
    v[k] = (v_gk * y_g + u[CONN] * i[k]) / y_tot;
  }

  // ---- algebra (rhs_core.algebra_given_v, SPEC §4.3-4.8)
  cd v_pos = 0.0, i_pos = 0.0;
  for (int k = 0; k < n; ++k) {
    v_pos += v[k] * std::conj(a_k[k]);
    i_pos += u[CONN] * i[k] * std::conj(a_k[k]);
  }
  v_pos /= n; i_pos /= n;

  cd m[3], vt[3];
  const double vdc_pos = std::max(vdc, p[VDC_FLOOR]);
  for (int k = 0; k < n; ++k) {
    cd m_raw = p[KP_GCC] * uf[k] + x[k];
    double m_mag = std::sqrt(std::norm(m_raw) + 1e-30);
    m[k] = m_raw * soft_limit(m_mag, p[M_MAX]);
    vt[k] = m[k] * (p[KV] * vdc_pos);
  }

  const cd e_th = std::polar(1.0, theta);
  const double v_q = (v_pos * std::conj(e_th)).imag();

  double p_inv = 0.0, p_pcc = 0.0, q_pcc = 0.0;
  for (int k = 0; k < n; ++k) {
    p_inv += (vt[k] * std::conj(i[k])).real();
    cd s_pcc = v[k] * std::conj(u[CONN] * i[k]);
    p_pcc += s_pcc.real();
    q_pcc += s_pcc.imag();
  }
  p_inv /= n; p_pcc /= n; q_pcc /= n;

  const double vdc_v = vdc * p[VDC_BASE];
  double i_arr =
      p[NP_PAR] * (iph - p[IRS] * (std::exp(p[GAMMA] * vdc_v / u[T_CELL]) - 1.0));
  i_arr = std::max(i_arr, 0.0);
  const double p_pv = i_arr * vdc_v / p[S_RATED];

  const double c = p[CONST_VDC];
  const double e_dc = (1.0 - c) * (vdc - u[VDC_REF]) + c * (u[P_REF] - p_pcc);
  const double id_raw = p[KP_DC] * e_dc + xdc;
  const double e_q = u[Q_REF] - q_pcc;
  const double iq_raw = -(p[KP_Q] * e_q + xq);
  const double mag = std::sqrt(id_raw * id_raw + iq_raw * iq_raw + 1e-30);
  const double s_lim = soft_limit(mag, p[I_MAX]);
  const cd i_dq = cd(id_raw * s_lim, iq_raw * s_lim) * e_th;
  const double aw = en * aw_gate(mag, p[I_MAX]);

  // ---- derivatives (rhs_core.rhs_from_algebra, SPEC §5)
  const double wb = p[W_BASE];
  for (int k = 0; k < n; ++k) {
    cd i_ref = en * ((n == 1) ? i_dq : i_dq * a_k[k]);
    cd di_conn = (vt[k] - v[k] - p[RF] * i[k]) * (wb / p[LF]) -
                 cd(0.0, wb) * i[k];
    cd di = u[CONN] * di_conn - (1.0 - u[CONN]) * wb * i[k];
    cd du = p[W_F] * (i_ref - i[k] - uf[k]);
    cd dx = p[KI_GCC] * en * uf[k];
    dy[0 * n + k] = di.real(); dy[1 * n + k] = di.imag();
    dy[2 * n + k] = dx.real(); dy[3 * n + k] = dx.imag();
    dy[4 * n + k] = du.real(); dy[5 * n + k] = du.imag();
  }
  dy[6 * n + 0] = (1.0 - c) * (p_pv - u[CONN] * p_inv) / (p[TAU_DC] * vdc_pos) +
                  c * VDC_PIN_RATE * (u[VDC_REF] - vdc);
  dy[6 * n + 1] = p[KI_DC] * e_dc * aw;
  dy[6 * n + 2] = p[KI_Q] * e_q * aw;
  dy[6 * n + 3] = p[KI_PLL] * v_q;
  dy[6 * n + 4] = wb * (p[KP_PLL] * v_q + xpll);
}

// classical RK4 over one window; arithmetic order mirrors ode/rk4.py,
// including the Kahan-compensated state accumulation (comp[] carries the
// rounding residue — builds without -ffast-math so the cancellation holds).
static void rk4_window(int n_ph, double* y, double t0, double dt, int n_sub,
                       const double* p, const double* u) {
  const int ns = 6 * n_ph + 5;
  const double h = dt / n_sub;
  double k1[MAX_NS], k2[MAX_NS], k3[MAX_NS], k4[MAX_NS], tmp[MAX_NS];
  double comp[MAX_NS] = {0.0};
  for (int s = 0; s < n_sub; ++s) {
    const double t = t0 + s * h;
    rhs(n_ph, y, t, p, u, k1);
    for (int j = 0; j < ns; ++j) tmp[j] = y[j] + 0.5 * h * k1[j];
    rhs(n_ph, tmp, t + 0.5 * h, p, u, k2);
    for (int j = 0; j < ns; ++j) tmp[j] = y[j] + 0.5 * h * k2[j];
    rhs(n_ph, tmp, t + 0.5 * h, p, u, k3);
    for (int j = 0; j < ns; ++j) tmp[j] = y[j] + h * k3[j];
    rhs(n_ph, tmp, t + h, p, u, k4);
    for (int j = 0; j < ns; ++j) {
      const double d =
          ((h / 6.0) * (k1[j] + 2.0 * k2[j] + 2.0 * k3[j] + k4[j])) - comp[j];
      const double sum = y[j] + d;
      comp[j] = (sum - y[j]) - d;
      y[j] = sum;
    }
  }
}

// Dormand-Prince 5(4) adaptive window — native truth-oracle integrator.
// Returns accepted-step count, or -1 on step-size underflow.
static int dp54_window(int n_ph, double* y, double t0, double dt, double rtol,
                       double atol, const double* p, const double* u) {
  const int ns = 6 * n_ph + 5;
  // Butcher tableau (Dormand & Prince 1980, RK5(4)7M)
  static const double c2 = 1.0 / 5, c3 = 3.0 / 10, c4 = 4.0 / 5, c5 = 8.0 / 9;
  static const double a21 = 1.0 / 5;
  static const double a31 = 3.0 / 40, a32 = 9.0 / 40;
  static const double a41 = 44.0 / 45, a42 = -56.0 / 15, a43 = 32.0 / 9;
  static const double a51 = 19372.0 / 6561, a52 = -25360.0 / 2187,
                      a53 = 64448.0 / 6561, a54 = -212.0 / 729;
  static const double a61 = 9017.0 / 3168, a62 = -355.0 / 33,
                      a63 = 46732.0 / 5247, a64 = 49.0 / 176,
                      a65 = -5103.0 / 18656;
  static const double b1 = 35.0 / 384, b3 = 500.0 / 1113, b4 = 125.0 / 192,
                      b5 = -2187.0 / 6784, b6 = 11.0 / 84;
  static const double e1 = 71.0 / 57600, e3 = -71.0 / 16695, e4 = 71.0 / 1920,
                      e5 = -17253.0 / 339200, e6 = 22.0 / 525, e7 = -1.0 / 40;
  double k1[MAX_NS], k2[MAX_NS], k3[MAX_NS], k4[MAX_NS], k5[MAX_NS],
      k6[MAX_NS], k7[MAX_NS], yt[MAX_NS], y5[MAX_NS];
  double t = t0;
  const double tend = t0 + dt;
  double h = dt / 400.0;  // conservative start (stiff w_f mode)
  int accepted = 0;
  rhs(n_ph, y, t, p, u, k1);  // FSAL seed
  for (int guard = 0; guard < 2000000 && t < tend; ++guard) {
    if (t + h > tend) h = tend - t;
    for (int j = 0; j < ns; ++j) yt[j] = y[j] + h * a21 * k1[j];
    rhs(n_ph, yt, t + c2 * h, p, u, k2);
    for (int j = 0; j < ns; ++j)
      yt[j] = y[j] + h * (a31 * k1[j] + a32 * k2[j]);
    rhs(n_ph, yt, t + c3 * h, p, u, k3);
    for (int j = 0; j < ns; ++j)
      yt[j] = y[j] + h * (a41 * k1[j] + a42 * k2[j] + a43 * k3[j]);
    rhs(n_ph, yt, t + c4 * h, p, u, k4);
    for (int j = 0; j < ns; ++j)
      yt[j] = y[j] +
              h * (a51 * k1[j] + a52 * k2[j] + a53 * k3[j] + a54 * k4[j]);
    rhs(n_ph, yt, t + c5 * h, p, u, k5);
    for (int j = 0; j < ns; ++j)
      yt[j] = y[j] + h * (a61 * k1[j] + a62 * k2[j] + a63 * k3[j] +
                          a64 * k4[j] + a65 * k5[j]);
    rhs(n_ph, yt, t + h, p, u, k6);
    for (int j = 0; j < ns; ++j)
      y5[j] = y[j] + h * (b1 * k1[j] + b3 * k3[j] + b4 * k4[j] + b5 * k5[j] +
                          b6 * k6[j]);
    rhs(n_ph, y5, t + h, p, u, k7);
    double err = 0.0;
    for (int j = 0; j < ns; ++j) {
      double e = h * (e1 * k1[j] + e3 * k3[j] + e4 * k4[j] + e5 * k5[j] +
                      e6 * k6[j] + e7 * k7[j]);
      double sc = atol + rtol * std::max(std::fabs(y[j]), std::fabs(y5[j]));
      err = std::max(err, std::fabs(e) / sc);
    }
    if (err <= 1.0) {
      t += h;
      std::memcpy(y, y5, ns * sizeof(double));
      std::memcpy(k1, k7, ns * sizeof(double));  // FSAL
      ++accepted;
      if (t >= tend) break;  // done: don't fail on a tiny post-step h update
    }
    double fac = 0.9 * std::pow(std::max(err, 1e-16), -0.2);
    h *= std::min(5.0, std::max(0.2, fac));
    if (h < 1e-14) return -1;  // step-size underflow mid-window
  }
  return t >= tend ? accepted : -1;
}

// partial-pivot Gaussian elimination: solve A x = b in place (A row-major).
static int lu_solve(int ns, double* A, double* b) {
  for (int col = 0; col < ns; ++col) {
    int piv = col;
    for (int r = col + 1; r < ns; ++r)
      if (std::fabs(A[r * ns + col]) > std::fabs(A[piv * ns + col])) piv = r;
    if (std::fabs(A[piv * ns + col]) < 1e-300) return -1;
    if (piv != col) {
      for (int j = 0; j < ns; ++j) std::swap(A[col * ns + j], A[piv * ns + j]);
      std::swap(b[col], b[piv]);
    }
    const double d = A[col * ns + col];
    for (int r = col + 1; r < ns; ++r) {
      const double f = A[r * ns + col] / d;
      if (f == 0.0) continue;
      for (int j = col; j < ns; ++j) A[r * ns + j] -= f * A[col * ns + j];
      b[r] -= f * b[col];
    }
  }
  for (int r = ns - 1; r >= 0; --r) {
    double s = b[r];
    for (int j = r + 1; j < ns; ++j) s -= A[r * ns + j] * b[j];
    b[r] = s / A[r * ns + r];
  }
  return 0;
}

// Newton steady-state solve of rhs(y, 0) = 0 (SPEC §7) — fsolve analog.
// Returns iterations used (>=0) on convergence, -1 otherwise.
static int newton_steady(int n_ph, double* y, const double* p, const double* u,
                         int max_iters, double tol) {
  const int ns = 6 * n_ph + 5;
  double f0[MAX_NS], f1[MAX_NS], J[MAX_NS * MAX_NS], step[MAX_NS],
      yp[MAX_NS];
  for (int it = 0; it < max_iters; ++it) {
    rhs(n_ph, y, 0.0, p, u, f0);
    double r = 0.0;
    for (int j = 0; j < ns; ++j) r = std::max(r, std::fabs(f0[j]));
    if (r < tol) return it;
    // forward-difference Jacobian
    for (int j = 0; j < ns; ++j) {
      std::memcpy(yp, y, ns * sizeof(double));
      const double d = 1e-8 * std::max(1.0, std::fabs(y[j]));
      yp[j] += d;
      rhs(n_ph, yp, 0.0, p, u, f1);
      for (int r2 = 0; r2 < ns; ++r2) J[r2 * ns + j] = (f1[r2] - f0[r2]) / d;
    }
    for (int j = 0; j < ns; ++j) step[j] = -f0[j];
    if (lu_solve(ns, J, step) != 0) return -1;
    for (int j = 0; j < ns; ++j) y[j] += step[j];
  }
  rhs(n_ph, y, 0.0, p, u, f0);
  double r = 0.0;
  for (int j = 0; j < ns; ++j) r = std::max(r, std::fabs(f0[j]));
  return r < tol ? max_iters : -1;
}

extern "C" {

void pvdx_rhs(int n_ph, const double* y, double t, const double* p,
              const double* u, double* dy) {
  rhs(n_ph, y, t, p, u, dy);
}

void pvdx_rk4_window(int n_ph, double* y, double t0, double dt, int n_sub,
                     const double* p, const double* u) {
  rk4_window(n_ph, y, t0, dt, n_sub, p, u);
}

int pvdx_dp54_window(int n_ph, double* y, double t0, double dt, double rtol,
                     double atol, const double* p, const double* u) {
  return dp54_window(n_ph, y, t0, dt, rtol, atol, p, u);
}

int pvdx_newton_steady(int n_ph, double* y, const double* p, const double* u,
                       int max_iters, double tol) {
  return newton_steady(n_ph, y, p, u, max_iters, tol);
}

// Batched RK4 over n_env independent envs (OpenMP). Layouts:
//   y   [n_env, n_states]   t0 [n_env]
//   p   [n_env, NP_FIELDS] if p_per_env else [NP_FIELDS]
//   u   [n_env, NU_FIELDS] if u_per_env else [NU_FIELDS]
void pvdx_rk4_window_batch(int n_ph, long n_env, double* y, const double* t0,
                           double dt, int n_sub, const double* p,
                           int p_per_env, const double* u, int u_per_env) {
  const int ns = 6 * n_ph + 5;
#pragma omp parallel for schedule(static)
  for (long e = 0; e < n_env; ++e) {
    rk4_window(n_ph, y + e * ns, t0[e], dt, n_sub,
               p + (p_per_env ? e * NP_FIELDS : 0),
               u + (u_per_env ? e * NU_FIELDS : 0));
  }
}

}  // extern "C"
