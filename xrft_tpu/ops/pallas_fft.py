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

Mosaic-compatibility (round-4 reformulation): this toolchain's Mosaic
rejects in-kernel LANE splits/merges such as ``(R, n) -> (R, n1, n2)``
unless the 3-D minor dim is 128 ("infer-vector-layout: unsupported shape
cast").  The kernel therefore never reshapes the lane dim: the caller
bitcasts ``(rows, n) <-> (rows, n1, n2)`` OUTSIDE the kernel (a free
row-major metadata reshape in XLA), the block refs are 3-D, and every
in-kernel reshape merges/splits MAJOR dims only (layout-preserving); the
digit reorderings are plain 3-D transposes, which this Mosaic build
compiles.  The output is stored pre-merge as ``(R, n2, n1)`` — row-major
flattening of (k2, k1) is exactly frequency order k = k1 + n1*k2.

Applies to f32 data with N factorable into n1*n2 (n1, n2 <= 256, covering
N <= 65536); other cases fall back to the composed path in
:mod:`.matmul_fft`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
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


@lru_cache(maxsize=None)
def _default_factors(n: int, cap: int = 256):
    """Kernel-default (n1, n2): the most-balanced pair.  The round-4
    on-chip sweep (scripts/perf_pallas_fftfuse.py, BASELINE.md) measured
    balanced (64, 64) at n=4096 fastest (34.8 ms flagship) vs (128, 32)
    at 41.7 ms — the full-K stage-1 contraction does not pay for the
    narrower stage-2 minor dim."""
    return _balanced_factors(n, cap)


def can_use_pallas(n: int, rows: int, rdtype) -> bool:
    mode = config.pallas_fft
    if mode == "never":
        return False
    if np.dtype(rdtype) != np.dtype(np.float32):
        return False
    if _balanced_factors(n) is None or n < 256:
        return False
    blk = _row_block(rows, n)
    if blk is None:
        return False
    if mode == "auto":
        return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    return True  # "always" (tests run with interpret on CPU)


def _row_block(rows: int, n: int = 4096):
    # ~14 live f32 planes of (R, n) per grid step (2x-pipelined in/out
    # blocks + stage intermediates) must fit comfortably in 16 MB VMEM.
    for blk in (128, 64, 32, 16, 8):
        if rows % blk == 0 and blk * n <= 220_000:
            return blk
    return None


def _kernel(complex_in, R, n1, n2,
            *refs):
    """One grid step: x block (R, n1, n2) [digits (j1, j2), j = j1*n2+j2]
    -> out block (R, n2, n1) [(k2, k1); caller's row-major merge gives
    k = k1 + n1*k2].  Lane dims are never reshaped (see module docstring).
    """
    if complex_in:
        (xr_ref, xi_ref, w1r, w1i, w2r, w2i, tr, ti, or_ref, oi_ref) = refs
    else:
        (xr_ref, w1r, w1i, w2r, w2i, tr, ti, or_ref, oi_ref) = refs
        xi_ref = None

    def mm(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32,
                       precision=_HIGHEST)

    # stage 1: contract j1 (the major digit): bring it last (3-D
    # transpose), merge MAJOR dims, one big (R*n2, n1) @ (n1, n1) matmul
    def stage1(ref):
        a = jnp.transpose(ref[:], (0, 2, 1)).reshape(R * n2, n1)
        return a

    ar = stage1(xr_ref)
    if xi_ref is None:
        br = mm(ar, w1r[:])
        bi = mm(ar, w1i[:])
    else:
        ai = stage1(xi_ref)
        br = mm(ar, w1r[:]) - mm(ai, w1i[:])
        bi = mm(ar, w1i[:]) + mm(ai, w1r[:])

    # stage 2: twiddle in (R, n2, n1) = (R, j2, k1) layout (T is (n2, n1))
    br = br.reshape(R, n2, n1)
    bi = bi.reshape(R, n2, n1)
    t_r, t_i = tr[:], ti[:]
    cr = br * t_r - bi * t_i
    ci = br * t_i + bi * t_r

    # stage 3: contract j2: transpose to (R, k1, j2), merge major dims,
    # matmul W2 (n2, n2)
    cr = jnp.transpose(cr, (0, 2, 1)).reshape(R * n1, n2)
    ci = jnp.transpose(ci, (0, 2, 1)).reshape(R * n1, n2)
    dr = mm(cr, w2r[:]) - mm(ci, w2i[:])
    di = mm(cr, w2i[:]) + mm(ci, w2r[:])

    # stage 4: (R*n1, n2) = (R, k1, k2) -> store as (R, k2, k1); the
    # frequency-order merge happens in the caller as a free bitcast
    or_ref[:] = jnp.transpose(dr.reshape(R, n1, n2), (0, 2, 1))
    oi_ref[:] = jnp.transpose(di.reshape(R, n1, n2), (0, 2, 1))


def _kernel_dg(complex_in, R, n1, n2, precision, *refs):
    """dot_general formulation: contract the digit dims in place (the
    matmuls absorb stage 1's and stage 3's transposes), leaving ONE 3-D
    transpose before the store.  Same math as :func:`_kernel`."""
    if complex_in:
        (xr_ref, xi_ref, w1r, w1i, w2r, w2i, tr, ti, or_ref, oi_ref) = refs
    else:
        (xr_ref, w1r, w1i, w2r, w2i, tr, ti, or_ref, oi_ref) = refs
        xi_ref = None

    def dg1(a, w):  # (R, j1, j2) x (j1, k1) -> (R, j2, k1)
        return lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)

    def dg2(a, w):  # (R, j2, k1) x (j2, k2) -> (R, k1, k2)
        return lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)

    xr = xr_ref[:]
    if xi_ref is None:
        br = dg1(xr, w1r[:])
        bi = dg1(xr, w1i[:])
    else:
        xi = xi_ref[:]
        br = dg1(xr, w1r[:]) - dg1(xi, w1i[:])
        bi = dg1(xr, w1i[:]) + dg1(xi, w1r[:])

    t_r, t_i = tr[:], ti[:]           # (n2, n1) = (j2, k1)
    cr = br * t_r - bi * t_i
    ci = br * t_i + bi * t_r

    dr = dg2(cr, w2r[:]) - dg2(ci, w2i[:])   # (R, k1, k2)
    di = dg2(cr, w2i[:]) + dg2(ci, w2r[:])
    or_ref[:] = jnp.transpose(dr, (0, 2, 1))
    oi_ref[:] = jnp.transpose(di, (0, 2, 1))


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


def pallas_fft_last(x, sign: int = -1, interpret: bool | None = None,
                    factors: tuple[int, int] | None = None,
                    row_block: int | None = None,
                    variant: str = "transpose",
                    precision=None,
                    dimension_semantics: tuple | None = None,
                    vmem_limit_bytes: int | None = None) -> ComplexPair:
    """Fused DFT along the last axis of a real f32 array or f32 ComplexPair.

    Caller must have checked :func:`can_use_pallas`.  ``factors`` and
    ``row_block`` override the (n1, n2) radix pair and the per-grid-step
    row count (perf sweeps; defaults: :func:`_default_factors` and the
    largest VMEM-safe block).  ``variant``: "transpose" (explicit 3-D
    transposes around plain 2-D matmuls) or "dg" (dot_general contracts
    the digit dims in place — one transpose total).  ``precision``
    defaults to HIGHEST (the engine's f32 grade); DEFAULT is a perf
    probe only (bf16 1-pass, ~4e-3 relative error).
    """
    complex_in = is_pair(x)
    shape = x.shape
    n = shape[-1]
    rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    n1, n2 = factors if factors is not None else _default_factors(n)
    assert n1 * n2 == n
    R = row_block if row_block is not None else _row_block(rows, n)
    if R is None:  # beyond the VMEM heuristic (interpret-mode tests)
        R = next(b for b in (128, 64, 32, 16, 8, 4, 2, 1) if rows % b == 0)
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
    in_spec = pl.BlockSpec((R, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((R, n2, n1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    n_data_in = 2 if complex_in else 1
    in_specs = [in_spec] * n_data_in + [const_spec] * 6
    out_specs = (out_spec, out_spec)
    out_shape = (
        jax.ShapeDtypeStruct((rows, n2, n1), jnp.float32),
        jax.ShapeDtypeStruct((rows, n2, n1), jnp.float32),
    )

    if variant == "dg":
        kern = partial(_kernel_dg, complex_in, R, n1, n2,
                       precision if precision is not None else _HIGHEST)
    else:
        kern = partial(_kernel, complex_in, R, n1, n2)
    cparams = None
    if not interpret:
        if vmem_limit_bytes is None:
            # the toolchain's default VMEM cap rejects row blocks >= 32
            # at n = 4096 (measured: raising it is required and free —
            # scripts/perf_pallas_fftfuse.py round 2)
            vmem_limit_bytes = 100 * 1024 * 1024
        cparams = pltpu.CompilerParams(
            dimension_semantics=dimension_semantics,
            vmem_limit_bytes=vmem_limit_bytes)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **({"compiler_params": cparams} if cparams is not None else {}),
    )
    # the (rows, n) <-> (rows, n1, n2)/(rows, n2, n1) digit reshapes are
    # row-major bitcasts OUTSIDE the kernel (free in XLA; Mosaic-hostile
    # inside — see module docstring)
    if complex_in:
        args = (x.re.reshape(rows, n1, n2), x.im.reshape(rows, n1, n2))
    else:
        args = (x.reshape(rows, n1, n2).astype(jnp.float32),)
    o_re, o_im = call(*args, *consts)
    return ComplexPair(o_re.reshape(shape), o_im.reshape(shape))
