"""Analytic signal (Hilbert transform) and amplitude envelope.

Beyond the reference (xrft has no time-domain signal tools; its surface
stops at forward spectral estimates, ``/root/reference/xrft/xrft.py:17-29``)
— matching ``scipy.signal.hilbert`` semantics: the analytic signal

    xa[n] = x[n] + i * H(x)[n] = ifft(fft(x) * h),
    h = [1, 2, ..., 2, 1, 0, ..., 0]   (even N; the lone 1 at Nyquist)
        [1, 2, ..., 2,    0, ..., 0]   (odd N)

TPU-first shape: the one-sided doubling mask ``h`` is a host constant
baked into the jaxpr, the transform pair rides the engine dispatch in
:mod:`.ops.fft_core` (split-complex MXU matmul FFT on TPU, native c64/
c128 XLA FFT on CPU/GPU), and the whole analytic signal is one XLA
program.  No frequency coordinates are ever built: the Hilbert
transformer is index-based (like scipy's), so the input's dims/coords
pass through untouched and no spacing validation applies.
"""

from __future__ import annotations

import numpy as np

from .labeled import LabeledArray
from .ops import carray, fft_core
from .spectra import _norm_1d_dim

__all__ = ["hilbert", "hilbert2", "envelope"]


def _analytic_mask(n: int) -> np.ndarray:
    h = np.zeros(n)
    h[0] = 1.0
    if n % 2 == 0:
        h[1:n // 2] = 2.0
        h[n // 2] = 1.0
    else:
        h[1:(n + 1) // 2] = 2.0
    return h


def hilbert(da, dim=None, engine=None) -> LabeledArray:
    """Analytic signal ``x + i*H(x)`` along ``dim`` (default: last dim) —
    ``scipy.signal.hilbert``.  Input must be real (float or integer),
    like scipy's; the output is complex (a split ``ComplexPair`` on TPU)
    with the input's dims/coords/attrs unchanged.  The imaginary part is
    the Hilbert transform; :func:`envelope` is its magnitude.  Unlike
    scipy there is no ``N=``: zero-pad explicitly with
    :func:`xrft_tpu.pad`.
    """
    dim = _norm_1d_dim(da, dim, "hilbert")
    if carray.is_complex(da.data):
        raise ValueError("hilbert: input must be real (scipy convention)")
    ax = da.dims.index(dim)
    n = da.sizes[dim]
    ft = fft_core.fftn(da.data, [ax], engine=engine)
    bshape = [1] * len(da.dims)
    bshape[ax] = n
    rdt = ft.re.dtype if carray.is_pair(ft) else carray._float_of(ft.dtype)
    h = _analytic_mask(n).astype(rdt).reshape(bshape)
    if carray.is_pair(ft):
        ft = carray.ComplexPair(ft.re * h, ft.im * h)
    else:
        ft = ft * h
    xa = fft_core.ifftn(ft, [ax], engine=engine)
    out = da.copy(data=xa)
    out.name = f"{da.name}_analytic" if da.name else None
    return out


def hilbert2(da, dim=None, engine=None) -> LabeledArray:
    """2-D analytic signal along two dims — ``scipy.signal.hilbert2``:
    ``ifft2(fft2(x) * (h1 ⊗ h2))`` with the same one-sided doubling mask
    on each axis, so only the (+,+) frequency quadrant survives (doubled
    four-fold in the interior).  ``dim`` defaults to the last two dims.
    Input must be real; output is complex (a split pair on TPU) with
    dims/coords/attrs unchanged (index-based, like scipy's).
    """
    if dim is None:
        if da.ndim < 2:
            raise ValueError("hilbert2: input must have at least 2 dims")
        dims = list(da.dims[-2:])
    elif isinstance(dim, str):
        raise ValueError("hilbert2: dim must name exactly 2 dims "
                         f"(got {dim!r})")
    else:
        dims = list(dim)
    if len(dims) != 2:
        raise ValueError(f"hilbert2: dim must name exactly 2 dims "
                         f"(got {dims!r})")
    bad = [d for d in dims if d not in da.dims]
    if bad:
        raise ValueError(f"hilbert2: dims {bad} not found in {da.dims}")
    if carray.is_complex(da.data):
        raise ValueError("hilbert2: input must be real (scipy convention)")
    axes = [da.dims.index(d) for d in dims]
    ft = fft_core.fftn(da.data, axes, engine=engine)
    rdt = ft.re.dtype if carray.is_pair(ft) else carray._float_of(ft.dtype)
    # scipy's 2-D single-orthant mask differs from the 1-D hilbert mask:
    # for even N the unpaired Nyquist bin is ZEROED (1 + s_N(p) with
    # s_N(N/2) = -1 via the "elsewhere" branch), not kept at 1.
    def _mask2(n):
        h = np.zeros(n)
        h[0] = 1.0
        h[1:(n + 1) // 2] = 2.0
        return h

    h = np.ones([1] * len(da.dims))
    for ax in axes:
        bshape = [1] * len(da.dims)
        bshape[ax] = da.shape[ax]
        h = h * _mask2(da.shape[ax]).reshape(bshape)
    h = h.astype(rdt)
    if carray.is_pair(ft):
        ft = carray.ComplexPair(ft.re * h, ft.im * h)
    else:
        ft = ft * h
    xa = fft_core.ifftn(ft, axes, engine=engine)
    out = da.copy(data=xa)
    out.name = f"{da.name}_analytic2" if da.name else None
    return out


def envelope(da, dim=None, engine=None) -> LabeledArray:
    """Amplitude envelope ``|hilbert(da)|`` — the instantaneous amplitude
    of the analytic signal (``np.abs(scipy.signal.hilbert(x))``)."""
    xa = hilbert(da, dim=dim, engine=engine)
    out = xa.copy(data=carray.absolute(xa.data))
    out.name = f"{da.name}_envelope" if da.name else None
    return out
