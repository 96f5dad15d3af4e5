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

__all__ = ["hilbert", "envelope"]


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


def envelope(da, dim=None, engine=None) -> LabeledArray:
    """Amplitude envelope ``|hilbert(da)|`` — the instantaneous amplitude
    of the analytic signal (``np.abs(scipy.signal.hilbert(x))``)."""
    xa = hilbert(da, dim=dim, engine=engine)
    out = xa.copy(data=carray.absolute(xa.data))
    out.name = f"{da.name}_envelope" if da.name else None
    return out
