"""Float64-emulated FFT on TPU: double-word (two-float32) DFT.

Why: the MXU accumulates matmuls in f32, so no matmul formulation can beat
~1e-7 relative error; reaching the 1e-10 accuracy contract (BASELINE.md) on
a chip with no f64/complex support requires compensated arithmetic on the
VPU.  This module implements the DFT in complex df64 (see :mod:`.df64`):

  * a 2-D-only Pallas kernel (`_df64_dft_kernel`) that contracts the last
    axis against a df64 DFT matrix with error-free rank-1 updates, keeping
    the running df64 accumulator in VMEM (the deployment Mosaic toolchain
    supports exactly this op set: 2-D tiles, dynamic row/col slices,
    fori_loop);
  * a four-step recursion (`df64_fft_nd`) with df64 twiddle multiplies at
    the XLA level, so any factorable size composes from kernel-sized
    stages.

This is an opt-in precision mode (~10-40x the flops of the f32 matmul
engine, all on the VPU); the standard pipeline stays on the MXU path.
Accuracy: ~1e-12 relative vs numpy complex128 (pinned in
tests/test_df64_fft.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64
from .carray import ComplexPair, is_pair
from .matmul_fft import _dft_matrix_np, _largest_small_divisor, _twiddle_np

__all__ = ["df64_fft_nd", "df64_to_numpy", "as_df64"]

_KERNEL_MAX = 256  # largest direct df64 DFT (VMEM: 8 const + 12 data tiles)


# -- representation ---------------------------------------------------------


def as_df64(x):
    """Promote real array / complex array / ComplexPair / df64 4-tuple to a
    df64 4-tuple.  Host float64/complex128 numpy inputs are split exactly
    into hi/lo halves (no precision loss)."""
    if isinstance(x, tuple) and len(x) == 4:
        return x
    if is_pair(x):
        z = jnp.zeros_like(x.re)
        return (x.re, jnp.zeros_like(x.re), x.im, z)
    if isinstance(x, np.ndarray) and x.dtype == np.complex128:
        re_h, re_l = df64.split_f64_np(np.ascontiguousarray(x.real))
        im_h, im_l = df64.split_f64_np(np.ascontiguousarray(x.imag))
        return tuple(jnp.asarray(v) for v in (re_h, re_l, im_h, im_l))
    if isinstance(x, np.ndarray) and x.dtype == np.float64:
        hi, lo = df64.split_f64_np(x)
        z = np.zeros_like(hi)
        return tuple(jnp.asarray(v) for v in (hi, lo, z, z))
    x = jnp.asarray(x)
    if np.dtype(x.dtype).kind == "c":
        re = jnp.real(x).astype(jnp.float32)
        im = jnp.imag(x).astype(jnp.float32)
        return (re, jnp.zeros_like(re), im, jnp.zeros_like(im))
    x = x.astype(jnp.float32)
    z = jnp.zeros_like(x)
    return (x, z, jnp.zeros_like(x), z)


def df64_to_numpy(x4) -> np.ndarray:
    """Combine a df64 4-tuple into a host complex128 array."""
    rh, rl, ih, il = (np.asarray(v) for v in x4)
    return (df64.join_np(rh, rl) + 1j * df64.join_np(ih, il))


@lru_cache(maxsize=None)
def _w_consts(n: int, sign: int):
    w = _dft_matrix_np(n, sign)
    return tuple(
        np.ascontiguousarray(v)
        for v in (*df64.split_f64_np(w.real), *df64.split_f64_np(w.imag))
    )


@lru_cache(maxsize=None)
def _tw_consts(n1: int, n2: int, sign: int):
    t = _twiddle_np(n1, n2, sign)
    return tuple(
        np.ascontiguousarray(v)
        for v in (*df64.split_f64_np(t.real), *df64.split_f64_np(t.imag))
    )


# -- Pallas kernel ----------------------------------------------------------


def _df64_dft_kernel(n, *refs):
    (xrh, xrl, xih, xil, wrh, wrl, wih, wil,
     orh, orl, oih, oil) = refs
    zero = jnp.zeros(orh.shape, jnp.float32)
    orh[:] = zero
    orl[:] = zero
    oih[:] = zero
    oil[:] = zero
    xr_h, xr_l, xi_h, xi_l = xrh[:], xrl[:], xih[:], xil[:]
    # Mosaic cannot dynamically slice the lane (last) dimension, so the
    # j-th input column is extracted with a masked lane reduction instead.
    lane = jax.lax.broadcasted_iota(jnp.int32, xr_h.shape, 1)

    def col(v, j):
        return jnp.sum(jnp.where(lane == j, v, 0.0), axis=1, keepdims=True)

    def step(j, _):
        xcol = (col(xr_h, j), col(xr_l, j), col(xi_h, j), col(xi_l, j))
        wrow = (
            wrh[pl.ds(j, 1), :], wrl[pl.ds(j, 1), :],
            wih[pl.ds(j, 1), :], wil[pl.ds(j, 1), :],
        )
        prod = df64.cmul(xcol, wrow)
        res = df64.cadd((orh[:], orl[:], oih[:], oil[:]), prod)
        orh[:], orl[:], oih[:], oil[:] = res
        return 0

    jax.lax.fori_loop(0, n, step, 0)


def _df64_dft_last(x4, n, sign, interpret):
    """Direct df64 DFT over the last axis via the Pallas kernel."""
    shape = x4[0].shape
    rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    flat = tuple(v.reshape(rows, n) for v in x4)

    blk = None
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):
        if rows % cand == 0:
            blk = cand
            break
    consts = tuple(jnp.asarray(c) for c in _w_consts(n, sign))

    data_spec = pl.BlockSpec((blk, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_df64_dft_kernel, n),
        grid=(rows // blk,),
        in_specs=[data_spec] * 4 + [const_spec] * 4,
        out_specs=(data_spec,) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, n), jnp.float32) for _ in range(4)
        ),
        interpret=interpret,
    )(*flat, *consts)
    return tuple(v.reshape(shape) for v in out)


# -- recursion --------------------------------------------------------------


def _moveaxis4(x4, src, dst):
    return tuple(jnp.moveaxis(v, src, dst) for v in x4)


def _reshape4(x4, shape):
    return tuple(v.reshape(shape) for v in x4)


def _df64_fft_last(x4, n, sign, interpret):
    if n <= _KERNEL_MAX:
        return _df64_dft_last(x4, n, sign, interpret)
    n1 = _largest_small_divisor(n, _KERNEL_MAX)
    if n1 == 1:
        raise NotImplementedError(
            f"df64 FFT of prime size {n} (Bluestein in df64) is not "
            f"implemented; pad to a composite size."
        )
    n2 = n // n1
    shape = x4[0].shape
    a = _reshape4(x4, shape[:-1] + (n1, n2))
    # stage 1: DFT over n1 (bring it last, recurse)
    a = _moveaxis4(a, -2, -1)
    a = _df64_fft_last(a, n1, sign, interpret)      # (..., n2, k1)
    a = _moveaxis4(a, -1, -2)                       # (..., k1, n2)
    # twiddle T[k1, m2] in df64 at the XLA level
    trh, trl, tih, til = (jnp.asarray(c) for c in _tw_consts(n1, n2, sign))
    a = df64.cmul(a, (trh, trl, tih, til))
    # stage 2: DFT over n2 (last axis)
    a = _df64_fft_last(a, n2, sign, interpret)      # (..., k1, k2)
    # output index k = k1 + n1*k2
    a = tuple(jnp.swapaxes(v, -1, -2) for v in a)
    return _reshape4(a, shape[:-1] + (n,))


def df64_fft_nd(x, axes, kind: str = "fft", interpret: bool | None = None):
    """N-D FFT in emulated float64; returns a df64 4-tuple
    (re_hi, re_lo, im_hi, im_lo).

    kind: 'fft' | 'ifft'.  Use :func:`df64_to_numpy` to read results back
    as complex128.
    """
    x4 = as_df64(x)
    ndim = x4[0].ndim
    axes = [a % ndim for a in axes]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    sign = -1 if kind == "fft" else +1
    out = x4
    scale = 1.0
    for a in axes:
        n = out[0].shape[a]
        if a != ndim - 1:
            out = _moveaxis4(out, a, -1)
            out = _df64_fft_last(out, n, sign, interpret)
            out = _moveaxis4(out, -1, a)
        else:
            out = _df64_fft_last(out, n, sign, interpret)
        scale *= n
    if kind == "ifft":
        inv = np.float64(1.0 / scale)
        ih = np.float32(inv)
        il = np.float32(inv - np.float64(ih))
        rr = df64.mul(out[0], out[1], ih, il)
        ii = df64.mul(out[2], out[3], ih, il)
        out = (*rr, *ii)
    return out
