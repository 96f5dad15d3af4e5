"""Double-word float32 ("df64") arithmetic: ~49-bit-mantissa reals built
from pairs of f32, giving float64-grade spectral accuracy on a TPU that has
no f64 execution at all.

Every value is (hi, lo) with hi = fl(hi+lo) and |lo| <= ulp(hi)/2.  The
primitives are the classical error-free transformations (Knuth TwoSum,
Dekker split / TwoProduct — no FMA required, which this VPU does not
expose) and are exact in IEEE f32 arithmetic; XLA does not reassociate
floating-point ops, so the sequences survive compilation.

Used by :mod:`.df64_fft` for the high-precision DFT path (hard part #1 in
SURVEY.md §7: float64/complex128 FFT accuracy on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Dekker splitting constant for f32: 2^12 + 1
_SPLIT = np.float32(4097.0)

# Backend caveat: XLA:TPU (and Mosaic) compile these sequences faithfully —
# the df64 dot product achieves ~2e-14 relative error on the chip.  XLA:CPU
# however lets LLVM contract multiplies into FMAs across use sites
# (duplicating the product into each consumer fusion), which collapses the
# error terms to plain f32; optimization_barrier does not survive this
# XLA version's pipeline and Mosaic cannot lower it, so there is no
# portable guard.  df64 precision is therefore a TPU-only contract;
# CPU tests assert the algorithm shape at relaxed (f32) tolerance and the
# strict 1e-12 bound is pinned on-chip (tests/test_df64_fft.py,
# scripts/chip_checks.py).
_ob = lambda x: x


def two_sum(a, b):
    """Error-free a+b: returns (s, e) with s+e == a+b exactly."""
    s = a + b
    bb = _ob(s - a)
    e = (a - _ob(s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free a+b assuming |a| >= |b|."""
    s = a + b
    e = b - _ob(s - a)
    return s, e


def split(a):
    """Dekker split of f32 into 12+12-bit halves (exact).

    The barrier on ``c`` additionally stops LLVM FMA contraction of the
    (SPLIT*a) product into the following subtract — Dekker requires the
    *rounded* product.
    """
    c = _ob(_SPLIT * a)
    t = _ob(c - a)
    hi = c - t
    return hi, a - _ob(hi)


def two_prod(a, b):
    """Error-free a*b: returns (p, e) with p+e == a*b exactly.

    ``p`` is barriered so later uses (p+e, s-p) see the rounded product
    rather than an FMA-contracted exact one.
    """
    p = _ob(a * b)
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(xh, xl, yh, yl):
    """df64 + df64."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return quick_two_sum(s, e)


def mul(xh, xl, yh, yl):
    """df64 * df64."""
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def mul_f32(xh, xl, y):
    """df64 * f32."""
    p, e = two_prod(xh, y)
    e = e + xl * y
    return quick_two_sum(p, e)


def neg(xh, xl):
    return -xh, -xl


# -- complex df64: (re_hi, re_lo, im_hi, im_lo) -----------------------------


def cmul(a, b):
    """Complex df64 multiply of 4-tuples."""
    arh, arl, aih, ail = a
    brh, brl, bih, bil = b
    rr = add(*mul(arh, arl, brh, brl), *neg(*mul(aih, ail, bih, bil)))
    ii = add(*mul(arh, arl, bih, bil), *mul(aih, ail, brh, brl))
    return (*rr, *ii)


def cadd(a, b):
    arh, arl, aih, ail = a
    brh, brl, bih, bil = b
    return (*add(arh, arl, brh, brl), *add(aih, ail, bih, bil))


# -- host conversion --------------------------------------------------------


def split_f64_np(x64: np.ndarray):
    """Split host float64 into (hi, lo) float32 numpy pair."""
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def join_np(hi, lo) -> np.ndarray:
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
