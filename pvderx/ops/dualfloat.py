"""Double-float (two-float32) arithmetic + the df32 window-kernel variant.

SPEC.md §6's f32 error budget attributes the production path's ~2.2e-6 floor
to f32 RHS arithmetic noise and (until round 5) rejected double-float "at
~3-4x kernel cost" by assertion. This module makes that experiment real
(round-4 verdict #3): a `DF` number type carrying an unevaluated (hi, lo)
float32 pair (~49-bit effective mantissa) with error-free transforms
(Knuth two-sum; Dekker split two-product — no FMA primitive is exposed to
Pallas, so the 17-flop split form is used), plus an `xp`-style namespace
shim (`dfp`) so the UNMODIFIED physics core (`rhs_core.rhs`) evaluates in
double-float — one set of equations, three precisions (f32 / df32 / the f64
oracle).

`rk4_fleet/ window` analog: `rk4_window_batch_df` runs the same fused
VMEM-resident RK4 window as `ops.window.rk4_window_batch`, with the state
carried as a DF pair ACROSS windows (the harness threads y_lo between
calls, so no per-window rounding is reintroduced). Exogenous inputs and
params stay exact f32 (their representation error is the separately-measured
~3.3e-7 input floor, SPEC §6); substep time is computed in DF from an
exactly-split h = dt/n_sub.

Measured on a real v5e (benchmarks/dualfloat_study.py, round 5) — see
BASELINE.md row 3 and SPEC §6 for the shipped three-tier contract decision.
Transcendentals are genuinely DF-grade: range-reduced Taylor/Horner
polynomials evaluated in DF arithmetic (first-order-corrected hardware
sin/cos was measured INSUFFICIENT — its 1.7e-8 trig floor amplified to
1.1e-4/eval through the current-loop gain; see the section comment below),
plus a Newton-refined sqrt and an exact exponent-bitcast 2^k. Supports
n_ph ∈ {1, 3} (the 3-phase path measured 3.2e-7 on the preset-50 gate
scenario — DUALFLOAT.json).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for float32 (24-bit mantissa)


def _two_sum(a, b):
    """Error-free a + b = s + e (Knuth, 6 flops, no branch)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Error-free a + b = s + e assuming |a| >= |b| (3 flops)."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Error-free a * b = p + e (Dekker, ~17 flops without FMA)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _lift(x):
    if isinstance(x, DF):
        return x
    if isinstance(x, (int, float)):
        # split Python-float constants (Taylor coefficients, 1/6, ...) into
        # an exact f32 (hi, lo) pair — an f32-rounded 1/6 alone costs ~6e-10
        # in the sin polynomial (measured round 5). Host numpy on purpose:
        # this must never trace.
        import numpy as _np
        hi = _np.float32(x)
        return DF(jnp.asarray(hi), jnp.asarray(_np.float32(float(x) - float(hi))))
    return DF(x, 0.0)


class DF:
    """A double-float32: value = hi + lo, |lo| <= ulp(hi)/2. Closed under
    the arithmetic the physics core uses; comparisons act on hi (lo is below
    any decision threshold in the RHS)."""

    __slots__ = ("hi", "lo")
    __array_priority__ = 200  # DF ops win over numpy/jnp array dunders

    def __init__(self, hi, lo=0.0):
        self.hi = hi
        self.lo = lo * jnp.ones_like(hi) if isinstance(lo, float) else lo

    # -- pytree --
    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def ndim(self):
        return jnp.ndim(self.hi)

    @property
    def shape(self):
        return jnp.shape(self.hi)

    @property
    def dtype(self):
        return jnp.asarray(self.hi).dtype

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return DF(jnp.reshape(self.hi, *shape), jnp.reshape(self.lo, *shape))

    def astype(self, dtype):
        # rhs_core._shift_angles calls .astype on the angle table; DF is
        # f32-pair by construction, so this is the identity
        return self

    def to_f32(self):
        return self.hi + self.lo

    # -- arithmetic (error-free transform based) --
    def __add__(self, other):
        o = _lift(other)
        s, e = _two_sum(self.hi, o.hi)
        e = e + (self.lo + o.lo)
        return DF(*_quick_two_sum(s, e))

    __radd__ = __add__

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __sub__(self, other):
        return self + (-_lift(other))

    def __rsub__(self, other):
        return _lift(other) + (-self)

    def __mul__(self, other):
        o = _lift(other)
        p, e = _two_prod(self.hi, o.hi)
        e = e + (self.hi * o.lo + self.lo * o.hi)
        return DF(*_quick_two_sum(p, e))

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = _lift(other)
        q1 = self.hi / o.hi
        r = self - o * q1          # exact-ish remainder in DF
        q2 = (r.hi + r.lo) / o.hi
        return DF(*_quick_two_sum(q1, q2))

    def __rtruediv__(self, other):
        return _lift(other) / self

    def __pow__(self, c):
        if c == 2:
            return self * self
        if abs(c + 1.0 / 16.0) < 1e-12:
            # x^(-1/16) = 1 / sqrt(sqrt(sqrt(sqrt(x)))) — the soft-limiter
            # exponent (rhs_core.soft_limit_scale); 4 Newton-refined sqrts
            r = self
            for _ in range(4):
                r = _sqrt(r)
            return _lift(1.0) / r
        raise NotImplementedError(f"DF ** {c}")

    # -- comparisons on hi --
    def __lt__(self, o):
        return self.hi < (o.hi if isinstance(o, DF) else o)

    def __le__(self, o):
        return self.hi <= (o.hi if isinstance(o, DF) else o)

    def __gt__(self, o):
        return self.hi > (o.hi if isinstance(o, DF) else o)

    def __ge__(self, o):
        return self.hi >= (o.hi if isinstance(o, DF) else o)


jax.tree_util.register_pytree_node(
    DF, lambda d: d.tree_flatten(), DF.tree_unflatten)


def _sqrt(a: DF) -> DF:
    s = jnp.sqrt(a.hi)
    # one Newton step in DF: e = (a - s^2) / (2 s)
    r = a - DF(s) * s
    e = (r.hi + r.lo) / (2.0 * s)
    return DF(*_quick_two_sum(s, e))


# -- double-float transcendentals ------------------------------------------
# A hardware sin/cos/exp of `hi` is only f32-accurate (~6e-8 relative) — the
# first DF prototype corrected only the ARGUMENT's lo term and measured a
# 1.7e-8 trig floor that the w_f ≈ 6.6e3 rad/s current-loop gain amplified
# to 1.1e-4 in the RHS (bisected round 5). Full DF accuracy needs range
# reduction + a Taylor/Horner polynomial evaluated IN DF arithmetic.

_PI2_HI = float(jnp.float32(1.5707963267948966))
_PI2_LO = 1.5707963267948966 - _PI2_HI            # pi/2 = hi + lo exactly
_LN2_HI = float(jnp.float32(0.6931471805599453))
_LN2_LO = 0.6931471805599453 - _LN2_HI

# 1/k! for sin/cos Taylor through x^13 / x^12 (|r| <= pi/4 after reduction:
# truncation ~ (pi/4)^14/14! ≈ 4e-13 relative — below the df32 mantissa)
_INV_FACT = [1.0 / 6.0, 1.0 / 120.0, 1.0 / 5040.0, 1.0 / 362880.0,
             1.0 / 39916800.0, 1.0 / 6227020800.0]
_INV_FACT_COS = [1.0 / 2.0, 1.0 / 24.0, 1.0 / 720.0, 1.0 / 40320.0,
                 1.0 / 3628800.0, 1.0 / 479001600.0]


def _sin_poly(r: DF) -> DF:
    # sin(r) = r - r^3/3! + r^5/5! - ... (Horner in r^2, DF arithmetic)
    r2 = r * r
    acc = _lift(0.0)
    for i, c in enumerate(reversed(_INV_FACT)):
        sign = -1.0 if (len(_INV_FACT) - i) % 2 == 1 else 1.0
        acc = (acc + sign * c) * r2
    return r * (1.0 + acc)


def _cos_poly(r: DF) -> DF:
    r2 = r * r
    acc = _lift(0.0)
    for i, c in enumerate(reversed(_INV_FACT_COS)):
        sign = -1.0 if (len(_INV_FACT_COS) - i) % 2 == 1 else 1.0
        acc = (acc + sign * c) * r2
    return 1.0 + acc


def _sincos(a: DF):
    """(sin, cos) of a DF via pi/2 range reduction + quadrant recombination.
    Valid for |a| up to ~2^11 rad (the reduction multiple k stays exactly
    representable; RHS phases are O(1-10 rad))."""
    k = jnp.round(a.hi * (2.0 / jnp.pi))
    r = a - DF(jnp.float32(_PI2_HI), jnp.zeros_like(a.hi)) * k
    r = r - DF(jnp.float32(_PI2_LO), jnp.zeros_like(a.hi)) * k
    s, c = _sin_poly(r), _cos_poly(r)
    q = jnp.mod(k, 4.0)  # quadrant: sin/cos swap + sign flips
    sel = lambda w, x, y: DF(jnp.where(w, x.hi, y.hi), jnp.where(w, x.lo, y.lo))
    swap = (q == 1.0) | (q == 3.0)
    sin_o = sel(swap, c, s)
    cos_o = sel(swap, s, c)
    sin_o = sel((q == 2.0) | (q == 3.0), -sin_o, sin_o)
    cos_o = sel((q == 1.0) | (q == 2.0), -cos_o, cos_o)
    return sin_o, cos_o


def _exp_df(a: DF) -> DF:
    """DF exp via ln2 reduction: exp(a) = 2^k · exp(r), |r| <= ln2/2.
    Taylor through r^9 (truncation ~ 3e-13 rel); 2^k is exact in f32.
    The argument is clamped to ±80 (e^80 ≈ 5.5e34, still finite in f32):
    the RHS only exponentiates the anti-windup gate (whose sigmoid saturates
    far before ±80) and the diode model (x ≈ 17), and an unclamped overflow
    would poison the downstream DF division with inf·0 = nan (the plain-f32
    path survives because 1/(1+inf) = 0 without a refinement step)."""
    a = DF(jnp.clip(a.hi, -80.0, 80.0),
           jnp.where(jnp.abs(a.hi) > 80.0, jnp.zeros_like(a.lo), a.lo))
    k = jnp.round(a.hi * (1.0 / 0.6931471805599453))
    r = a - DF(jnp.float32(_LN2_HI), jnp.zeros_like(a.hi)) * k
    r = r - DF(jnp.float32(_LN2_LO), jnp.zeros_like(a.hi)) * k
    acc = _lift(1.0 / 362880.0)
    for c in (1.0 / 40320.0, 1.0 / 5040.0, 1.0 / 720.0, 1.0 / 120.0,
              1.0 / 24.0, 1.0 / 6.0, 0.5, 1.0, 1.0):
        acc = acc * r + c
    # 2^k EXACTLY via the f32 exponent field — jnp.exp2 is an approximation
    # on this backend (measured: exp2(25.0) = 33554448 != 2^25, rel 4.9e-7,
    # which would dominate the whole df32 budget); k in [-116, 116] after
    # the ±80 clamp, safely inside the normal exponent range
    ki = k.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        (ki + 127) << 23, jnp.float32)
    return DF(acc.hi * scale, acc.lo * scale)


class _DFNamespace:
    """The `xp` shim: enough of the numpy surface for `rhs_core.rhs`."""

    __name__ = "pvderx.dualfloat"

    @staticmethod
    def sqrt(a):
        return _sqrt(_lift(a))

    @staticmethod
    def exp(a):
        return _exp_df(_lift(a))

    @staticmethod
    def sin(a):
        return _sincos(_lift(a))[0]

    @staticmethod
    def cos(a):
        return _sincos(_lift(a))[1]

    @staticmethod
    def maximum(a, b):
        a, b = _lift(a), _lift(b)
        take_a = a.hi >= b.hi
        return DF(jnp.where(take_a, a.hi, b.hi), jnp.where(take_a, a.lo, b.lo))

    @staticmethod
    def minimum(a, b):
        a, b = _lift(a), _lift(b)
        take_a = a.hi <= b.hi
        return DF(jnp.where(take_a, a.hi, b.hi), jnp.where(take_a, a.lo, b.lo))

    @staticmethod
    def where(c, a, b):
        a, b = _lift(a), _lift(b)
        return DF(jnp.where(c, a.hi, b.hi), jnp.where(c, a.lo, b.lo))

    @staticmethod
    def mean(a, axis=None):
        if axis != 0:
            # sum() below supports only the leading (phase/unit) axis; fail
            # here with the right name instead of from inside sum()
            raise NotImplementedError("DF mean: axis=0 only (phase axis)")
        a = _lift(a)
        n = a.shape[0]
        s = _DFNamespace.sum(a, axis=0)
        return s * (1.0 / n) if (n & (n - 1)) == 0 else s / float(n)

    @staticmethod
    def sum(a, axis=None):
        a = _lift(a)
        if axis != 0:
            raise NotImplementedError("DF sum: axis=0 only (phase axis)")
        out = a[0]
        for i in range(1, a.shape[0]):
            out = out + a[i]
        # keep the reduced axis semantics of jnp.mean(axis=0)
        return out

    @staticmethod
    def stack(xs):
        xs = [_lift(x) for x in xs]
        return DF(jnp.stack([x.hi for x in xs]), jnp.stack([x.lo for x in xs]))

    @staticmethod
    def concatenate(xs):
        xs = [_lift(x) for x in xs]
        return DF(jnp.concatenate([x.hi for x in xs]),
                  jnp.concatenate([x.lo for x in xs]))

    @staticmethod
    def zeros(shape, dtype=None):
        z = jnp.zeros(shape, jnp.float32)
        return DF(z, z)

    @staticmethod
    def asarray(a, dtype=None):
        if isinstance(a, (list, tuple)):
            # constant tables (e.g. rhs_core._shift_angles' phase angles):
            # split each Python float exactly into an (hi, lo) pair
            his = [_lift(x) for x in a]
            return DF(jnp.stack([h.hi for h in his]),
                      jnp.stack([h.lo for h in his]))
        return _lift(a)


dfp = _DFNamespace()


# ---------------------------------------------------------------------------
# the df32 fused window kernel (experiment twin of ops.window._window_kernel)
# ---------------------------------------------------------------------------
def _window_kernel_df(t_ref, y_ref, ylo_ref, p_ref, u_ref, out_hi, out_lo, *,
                      n_ph, n_sub, h_hi, h_lo):
    from pvderx.ops.window import P_FIELDS, U_FIELDS, unpack_struct
    from pvderx.params import DERParams, Exog
    from pvderx.physics import rhs_core

    y = DF(y_ref[:], ylo_ref[:])
    # params/exog exact f32 inputs, lifted with lo = 0
    p = unpack_struct(DERParams, DF(p_ref[:], jnp.zeros_like(p_ref[:])),
                      P_FIELDS, n_ph=n_ph)
    u = unpack_struct(Exog, DF(u_ref[:], jnp.zeros_like(u_ref[:])), U_FIELDS)
    t0 = DF(t_ref[0], jnp.zeros_like(t_ref[0]))
    h = DF(jnp.full_like(t_ref[0], h_hi), jnp.full_like(t_ref[0], h_lo))
    prep = rhs_core.prep_invariants(p, u, dfp, bdims=2)

    def body(k, carry):
        y, r1 = carry
        t = t0 + h * k.astype(jnp.float32)
        rh = rhs_core.grid_rot(t + 0.5 * h, p, u, dfp)
        r4 = rhs_core.grid_rot(t + h, p, u, dfp)
        k1 = rhs_core.rhs(y, t, p, u, dfp, prep, r1)
        k2 = rhs_core.rhs(y + (0.5 * h) * k1, t + 0.5 * h, p, u, dfp, prep, rh)
        k3 = rhs_core.rhs(y + (0.5 * h) * k2, t + 0.5 * h, p, u, dfp, prep, rh)
        k4 = rhs_core.rhs(y + h * k3, t + h, p, u, dfp, prep, r4)
        # DF accumulation is inherently compensated (no Kahan needed)
        y1 = y + (h * (1.0 / 6.0)) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        return y1, r4

    y1, _ = lax.fori_loop(
        0, n_sub, body, (y, rhs_core.grid_rot(t0, p, u, dfp)))
    out_hi[:] = y1.hi
    out_lo[:] = y1.lo


@partial(jax.jit, static_argnames=("n_ph", "n_sub", "dt", "block",
                                   "interpret"))
def rk4_window_batch_df(y_hi, y_lo, t0, p_pack, u_pack, *, n_ph: int,
                        n_sub: int, dt: float, block: int = 1024,
                        interpret: bool = False):
    """df32 twin of `ops.window.rk4_window_batch`: state carried as a
    (hi, lo) float32 pair across the window AND across calls. Returns
    (y1_hi, y1_lo), each [N, n_states]."""
    import numpy as np

    from pvderx.ops.window import LANE, P_FIELDS, U_FIELDS, _to_tiles

    n, n_s = y_hi.shape
    block = min(block, n)
    if (block % (8 * LANE) and block != n) or n % block:
        raise ValueError(f"N={n} must tile by block={block}")
    h64 = np.float64(dt) / n_sub
    h_hi = np.float32(h64)
    h_lo = np.float32(h64 - np.float64(h_hi))
    rows = block // LANE
    grid = (n // block,)
    kernel = partial(_window_kernel_df, n_ph=n_ph, n_sub=n_sub,
                     h_hi=float(h_hi), h_lo=float(h_lo))

    def spec(n_rows):
        return pl.BlockSpec((n_rows, rows, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((n_s, n // LANE, LANE), y_hi.dtype)
    hi, lo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(1), spec(n_s), spec(n_s), spec(len(P_FIELDS)),
                  spec(len(U_FIELDS))],
        out_specs=(spec(n_s), spec(n_s)),
        out_shape=(shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        _to_tiles(t0[None, :], 1, block),
        _to_tiles(y_hi.T, n_s, block),
        _to_tiles(y_lo.T, n_s, block),
        _to_tiles(p_pack, len(P_FIELDS), block),
        _to_tiles(u_pack, len(U_FIELDS), block),
    )
    return hi.reshape(n_s, n).T, lo.reshape(n_s, n).T
