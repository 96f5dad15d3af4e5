"""Fused four-step FFT as a single Pallas TPU kernel.

The XLA-composed four-step path materializes each stage (first-factor
matmul, twiddle, second-factor matmul, output permutation) in HBM — ~4
round trips of the full split-complex array per transformed axis.  The
engine is memory-bound on the v5e (precision sweeps barely move wall time,
see config.direct_dft_max), so this kernel performs the whole
N = n1*n2 transform tile-by-tile in VMEM:

    load rows -> (transpose, W1 matmul on MXU, twiddle on VPU,
    transpose, W2 matmul, output permutation) -> store rows

i.e. exactly ONE HBM read of the input and ONE write of the output per
axis.  DFT/twiddle matrices are host-precomputed constants resident in
VMEM across the whole grid.

Applies to f32 data with N factorable into n1*n2 (n1, n2 <= 256, covering
N <= 65536); other cases fall back to the composed path in
:mod:`.matmul_fft`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from .carray import ComplexPair, is_pair
from .matmul_fft import _dft_matrix_np, _twiddle_np

__all__ = ["pallas_fft_last", "can_use_pallas"]

_HIGHEST = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _balanced_factors(n: int, cap: int = 256):
    """Most-balanced divisor pair (n1, n2 <= cap) with n = n1*n2, or None."""
    best = None
    d = 1
    while d * d <= n:
        if n % d == 0:
            q = n // d
            if d <= cap and q <= cap:
                best = (q, d)  # n1 >= n2 keeps stage-1 contraction large
        d += 1
    return best


def can_use_pallas(n: int, rows: int, rdtype) -> bool:
    mode = config.pallas_fft
    if mode == "never":
        return False
    if np.dtype(rdtype) != np.dtype(np.float32):
        return False
    if _balanced_factors(n) is None or n < 256:
        return False
    blk = _row_block(rows)
    if blk is None:
        return False
    if mode == "auto":
        return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    return True  # "always" (tests run with interpret on CPU)


def _row_block(rows: int):
    for blk in (128, 64, 32, 16, 8):
        if rows % blk == 0:
            return blk
    return None


def _kernel(complex_in, R, n1, n2,
            *refs):
    if complex_in:
        (xr_ref, xi_ref, w1r, w1i, w2r, w2i, tr, ti, or_ref, oi_ref) = refs
    else:
        (xr_ref, w1r, w1i, w2r, w2i, tr, ti, or_ref, oi_ref) = refs
        xi_ref = None
    n = n1 * n2

    def mm(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32,
                       precision=_HIGHEST)

    # stage 1: contract n1 (strided axis): bring it last, one big matmul
    def stage1(ref):
        a = ref[:].reshape(R, n1, n2)
        a = jnp.transpose(a, (0, 2, 1)).reshape(R * n2, n1)
        return a

    ar = stage1(xr_ref)
    if xi_ref is None:
        br = mm(ar, w1r[:])
        bi = mm(ar, w1i[:])
    else:
        ai = stage1(xi_ref)
        br = mm(ar, w1r[:]) - mm(ai, w1i[:])
        bi = mm(ar, w1i[:]) + mm(ai, w1r[:])

    # stage 2: twiddle in (R, n2, n1) layout (T is (n2, n1))
    br = br.reshape(R, n2, n1)
    bi = bi.reshape(R, n2, n1)
    t_r, t_i = tr[:], ti[:]
    cr = br * t_r - bi * t_i
    ci = br * t_i + bi * t_r

    # stage 3: contract n2: transpose to (R, n1, n2), matmul W2
    cr = jnp.transpose(cr, (0, 2, 1)).reshape(R * n1, n2)
    ci = jnp.transpose(ci, (0, 2, 1)).reshape(R * n1, n2)
    dr = mm(cr, w2r[:]) - mm(ci, w2i[:])
    di = mm(cr, w2i[:]) + mm(ci, w2r[:])

    # stage 4: output index k = k1 + n1*k2 -> flatten (R, k2, k1)
    dr = jnp.transpose(dr.reshape(R, n1, n2), (0, 2, 1)).reshape(R, n)
    di = jnp.transpose(di.reshape(R, n1, n2), (0, 2, 1)).reshape(R, n)
    or_ref[:] = dr
    oi_ref[:] = di


def _rowtile_kernel(complex_in, n1, n2, *refs):
    """Strictly-2-D four-step over one row tile (Mosaic-compatible).

    Measured on the v5e: compiles and is accurate (2.7e-8), but at ~64 ms
    per 32768x4096 axis it LOSES to the XLA-composed path (~30 ms): per-row
    64x64 matmuls run the MXU at ~2.6 TFLOP/s (vs ~15 at K=128 with full
    row batching), and the 2-D-only constraint of this Mosaic build rules
    out batching multiple rows into one matmul.  Kept as a documented
    negative result and a base for future toolchains; the composed path
    stays the default.

    Works in the transposed layout so the output permutation vanishes:
    with At = A^T (n2, n1),   B = At @ W1   (m2, k1)
         C = B * T^T          (twiddle, (n2, n1) constant)
         D' = W2^T @ C        (k2, k1)
    and flattening D' row-major gives X[k2*n1 + k1] = X[k] directly.
    """
    if complex_in:
        (xr, xi, w1r, w1i, w2tr, w2ti, ttr, tti, orr, oii) = refs
    else:
        (xr, w1r, w1i, w2tr, w2ti, ttr, tti, orr, oii) = refs
        xi = None

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=_HIGHEST)

    at = xr[0].T  # (n2, n1)
    if xi is None:
        br = mm(at, w1r[:])
        bi = mm(at, w1i[:])
    else:
        ait = xi[0].T
        br = mm(at, w1r[:]) - mm(ait, w1i[:])
        bi = mm(at, w1i[:]) + mm(ait, w1r[:])
    t_r, t_i = ttr[:], tti[:]
    cr = br * t_r - bi * t_i
    ci = br * t_i + bi * t_r
    orr[0] = mm(w2tr[:], cr) - mm(w2ti[:], ci)
    oii[0] = mm(w2tr[:], ci) + mm(w2ti[:], cr)


def pallas_fft_rowtile(x, sign: int = -1, interpret: bool | None = None
                       ) -> ComplexPair:
    """Fused four-step FFT, one row tile per grid step; 2-D ops only.

    One HBM read + one write per transformed axis; the factor transposes
    happen on 16-64 KB VMEM tiles.
    """
    complex_in = is_pair(x)
    shape = x.shape
    n = shape[-1]
    rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    n1, n2 = _balanced_factors(n)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    w1 = _dft_matrix_np(n1, sign)
    w2t = _dft_matrix_np(n2, sign).T
    tt = _twiddle_np(n1, n2, sign).T  # (n2, n1)
    f32 = np.float32
    consts = [
        jnp.asarray(np.ascontiguousarray(m).astype(f32))
        for m in (w1.real, w1.imag, w2t.real, w2t.imag, tt.real, tt.imag)
    ]

    in_spec = pl.BlockSpec((1, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n2, n1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_data = 2 if complex_in else 1

    call = pl.pallas_call(
        partial(_rowtile_kernel, complex_in, n1, n2),
        grid=(rows,),
        in_specs=[in_spec] * n_data + [const_spec] * 6,
        out_specs=(out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, n2, n1), jnp.float32)
            for _ in range(2)
        ),
        interpret=interpret,
    )
    if complex_in:
        args = (x.re.reshape(rows, n1, n2), x.im.reshape(rows, n1, n2))
    else:
        args = (x.reshape(rows, n1, n2).astype(jnp.float32),)
    o_re, o_im = call(*args, *consts)
    return ComplexPair(o_re.reshape(shape), o_im.reshape(shape))


def pallas_fft_last(x, sign: int = -1, interpret: bool | None = None
                    ) -> ComplexPair:
    """Fused DFT along the last axis of a real f32 array or f32 ComplexPair.

    Caller must have checked :func:`can_use_pallas`.
    """
    complex_in = is_pair(x)
    shape = x.shape
    n = shape[-1]
    rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    n1, n2 = _balanced_factors(n)
    R = _row_block(rows)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    w1 = _dft_matrix_np(n1, sign)
    w2 = _dft_matrix_np(n2, sign)
    tw = _twiddle_np(n1, n2, sign).T  # (n2, n1)
    f32 = np.float32
    consts = [
        jnp.asarray(np.ascontiguousarray(m).astype(f32))
        for m in (w1.real, w1.imag, w2.real, w2.imag, tw.real, tw.imag)
    ]

    grid = (rows // R,)
    data_spec = pl.BlockSpec((R, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    n_data_in = 2 if complex_in else 1
    in_specs = [data_spec] * n_data_in + [const_spec] * 6
    out_specs = (data_spec, data_spec)
    out_shape = (
        jax.ShapeDtypeStruct((rows, n), jnp.float32),
        jax.ShapeDtypeStruct((rows, n), jnp.float32),
    )

    kern = partial(_kernel, complex_in, R, n1, n2)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    if complex_in:
        args = (x.re.reshape(rows, n), x.im.reshape(rows, n))
    else:
        args = (x.reshape(rows, n).astype(jnp.float32),)
    o_re, o_im = call(*args, *consts)
    return ComplexPair(o_re.reshape(shape), o_im.reshape(shape))
