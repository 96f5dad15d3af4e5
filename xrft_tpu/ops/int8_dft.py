"""High-precision DFT from exact int8 MXU matmuls (Ozaki-style limb scheme).

The df64 path (:mod:`.df64_fft`) reaches ~2e-14 but runs on the VPU at
~1000x the cost of a matmul.  This module gets comparable accuracy out of
the MXU itself, using the one operation this TPU performs *exactly*:
int8 x int8 matmuls accumulated in int32 (verified exact on-chip; products
<= 2^14, so sums stay exact for K <= 2^17).

Scheme (classical multi-word / Ozaki splitting):

  * W (DFT matrix, |entries| <= 1): rounded on host to 7*LW-bit fixed
    point and decomposed into LW balanced base-2^7 int8 limbs — exact by
    construction.
  * X: two-level on-device quantization against a power-of-two row-block
    scale: X ~= (X1 + 2^-21 X2) * S with X1, X2 21-bit integers, the
    level-2 residual extracted error-free (two_prod) so together they
    carry ~42 significant bits of each input element.  Each level splits
    into 3 int8 limbs.
  * Y = sum over limb pairs (p, q) of (X_p @ W_q) * 2^(-7(p+q)) — int8
    matmuls, combined in df64 (each int32 partial converts to an exact
    f32 hi/lo pair).  Pairs below the target precision are truncated.

Accuracy measured on-chip: 6e-15 (n=256) / 8e-14 (n=1024) relative — at or
beyond the VPU df64 path — at MXU matmul speed.  Spike status: direct DFT
only (n <= ~2000 for the K-exactness bound with margin); four-step
composition to larger sizes and rfft/c-input variants are future work
(ROADMAP.md #6).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import df64
from .matmul_fft import _dft_matrix_np

__all__ = ["int8_dft_last"]

LW = 7   # W limbs (7 bits each)
LX = 3   # int8 limbs per X quantization level
# one bit of headroom everywhere: balanced base-2^7 digits only cover
# ~+-0.496 * 128^L, so quantize to (7L - 2) bits
W_Q = 7 * LW - 2
X_Q = 7 * LX - 2


@lru_cache(maxsize=None)
def _w_limbs_np(n: int, sign: int, part: str):
    """Balanced base-2^7 int8 limb decomposition of the DFT matrix part.

    Returns (limbs[LW][n,n] int8, scale) with
    W ~= scale * sum_q limbs[q] * 2^(7*(LW-1-q)), scale = 2^-W_Q.
    """
    w = _dft_matrix_np(n, sign)
    m = w.real if part == "re" else w.imag
    fixed = np.rint(m * float(2 ** W_Q)).astype(object)  # exact ints
    limbs = []
    v = fixed
    for _ in range(LW):
        d = ((v + 64) % 128) - 64          # balanced digit in [-64, 63]
        limbs.append(np.asarray(d, dtype=np.int8))
        v = (v - d) // 128
    assert not np.any(v.astype(np.int64)), "W limb decomposition overflow"
    # limbs[0] is least significant; reverse to most-significant-first
    limbs = limbs[::-1]
    scale = 2.0 ** -W_Q
    return limbs, scale


def _x_limbs(x, rows_shape):
    """Two-level quantization + int8 limb split of a real f32 array
    against a per-row power-of-two scale.  Returns (limb list (int8),
    per-limb scales (f32 (...,1) arrays))."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    # power-of-two scale so divisions are exact
    e = jnp.ceil(jnp.log2(absmax))
    S = jnp.exp2(e)
    u = x / S  # exact (power-of-two divide), |u| <= 1
    q1f = jnp.rint(u * (2.0 ** X_Q))
    q1 = q1f.astype(jnp.int32)
    # error-free residual: r = u - q1 * 2^-X_Q (power-of-two product is
    # exact; nearby subtraction is exact by Sterbenz)
    r = u - q1f * jnp.float32(2.0 ** -X_Q)
    q2 = jnp.rint(r * (2.0 ** (2 * X_Q))).astype(jnp.int32)

    limbs = []
    scales = []
    for lvl, q in enumerate((q1, q2)):
        v = q
        lvl_limbs = []
        for _ in range(LX):
            d = ((v + 64) % 128) - 64
            lvl_limbs.append(d.astype(jnp.int8))
            v = (v - d) // 128
        lvl_limbs = lvl_limbs[::-1]  # most significant first
        for p, lb in enumerate(lvl_limbs):
            limbs.append(lb)
            # limb p of level lvl weighs 2^(7*(LX-1-p)) * 2^-((lvl+1)*X_Q)
            scales.append(2.0 ** (7 * (LX - 1 - p) - (lvl + 1) * X_Q))
    return limbs, scales, S


def int8_dft_last(x, sign: int = -1):
    """Direct high-precision DFT along the last axis via int8 MXU matmuls.

    x: real f32 array (..., n) with n <= 2000.
    Returns a df64 4-tuple (re_hi, re_lo, im_hi, im_lo); combine with
    :func:`xrft_tpu.ops.df64_fft.df64_to_numpy`.
    """
    n = x.shape[-1]
    if n > 2000:
        raise ValueError("int8 DFT spike supports n <= 2000 (int32 "
                         "accumulation exactness bound with margin)")
    x = jnp.asarray(x).astype(jnp.float32)
    xl, xs, S = _x_limbs(x, x.shape[:-1])

    out = {}
    for part in ("re", "im"):
        wl, wscale = _w_limbs_np(n, sign, part)
        wl = [jnp.asarray(w) for w in wl]
        acc_h = jnp.zeros(x.shape, jnp.float32)
        acc_l = jnp.zeros(x.shape, jnp.float32)
        for p, (xlimb, xsc) in enumerate(zip(xl, xs)):
            for q, wlimb in enumerate(wl):
                wsc = 2.0 ** (7 * (LW - 1 - q))
                scale = xsc * wsc * wscale
                # significance truncation: xsc and wsc*wscale are both
                # relative scales <= ~1; pairs below ~2^-52 cannot move
                # the ~49-bit result
                if abs(scale) < 2.0 ** -52:
                    continue
                prod = jax.lax.dot_general(
                    xlimb, wlimb, (((xlimb.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # int32 -> exact f32 hi/lo pair
                ph = prod.astype(jnp.float32)
                pl = (prod - ph.astype(jnp.int32)).astype(jnp.float32)
                sh, sl = df64.mul_f32(ph, pl, jnp.float32(scale))
                acc_h, acc_l = df64.add(acc_h, acc_l, sh, sl)
        out[part] = (acc_h, acc_l)

    # restore the per-row scale S (power of two -> exact multiplies)
    rh = out["re"][0] * S
    rl = out["re"][1] * S
    ih = out["im"][0] * S
    il = out["im"][1] * S
    return (rh, rl, ih, il)
