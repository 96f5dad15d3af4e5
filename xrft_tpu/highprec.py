"""High-precision (emulated float64) transforms on TPU.

Public wrappers over the df64 engine (:mod:`.ops.df64_fft`): the transform
runs on the TPU in double-word float32 arithmetic (~2e-14 relative accuracy
— validated on-chip; see tests/test_df64_fft.py and docs/precision.md) and
the result returns as host complex128.  This meets the 1e-10 numpy-parity
contract (BASELINE.md) on hardware with no native float64/complex support.

These functions execute eagerly (the result is materialized to host) and
support the coordinate-aware phase/amplitude semantics of
:func:`xrft_tpu.fft`; preprocessing (detrend/window) is applied in float32
before the transform — pass pre-processed data for full control.
"""

from __future__ import annotations

import jax
import numpy as np

from . import coords as ce
from .labeled import Coord, LabeledArray
from .ops import df64
from .ops.df64_fft import as_df64, df64_fft_nd, df64_to_numpy
from .transform import _dim_coord, _norm_dim

__all__ = ["fft64", "ifft64"]


def fft64(
    da: LabeledArray,
    spacing_tol: float = 1e-3,
    dim=None,
    shift: bool = True,
    true_phase: bool = True,
    true_amplitude: bool = True,
    prefix: str = "freq_",
) -> LabeledArray:
    """:func:`xrft_tpu.fft` at emulated-float64 precision.

    Returns a LabeledArray with host complex128 data.  Eager (not
    jittable); complex and real inputs supported; detrend/window are not
    applied here (preprocess first).
    """
    dim = _norm_dim(da, dim)
    ce.check_valid_fft_coords(da, dim)
    axis_num = [da.get_axis_num(d) for d in dim]
    N = [da.shape[n] for n in axis_num]

    delta_x = [
        ce.get_coordinate_spacing(_dim_coord(da, d), spacing_tol) for d in dim
    ]
    lag_x = [ce.lag_coord(_dim_coord(da, d)) for d in dim]

    x4 = as_df64(da.data)
    if true_phase:
        rev = [
            da.get_axis_num(d)
            for d in dim
            if d in da.coords and da.coords[d].values[-1] < da.coords[d].values[0]
        ]
        if rev:
            import jax.numpy as jnp

            x4 = tuple(jnp.flip(v, axis=rev) for v in x4)
        import jax.numpy as jnp

        x4 = tuple(jnp.fft.ifftshift(v, axes=axis_num) for v in x4)

    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        # these backends have native float64: use the host/XLA c128 FFT
        z = df64_to_numpy(x4)
        f = np.fft.fftn(z, axes=axis_num)
    else:
        out4 = df64_fft_nd(x4, axis_num, "fft")
        f = df64_to_numpy(out4)  # host complex128 from here on

    if shift:
        f = np.fft.fftshift(f, axes=axis_num)

    k = ce.freq_grids(N, delta_x, False, shift)

    swap = {d: ce.freq_dim_name(d, prefix) for d in dim}
    out_dims = [swap.get(d, d) for d in da.dims]
    out_coords = {
        c: da.coords[c].copy() for c in da.coords if c not in dim
    }
    for d, kk in zip(dim, k):
        out_coords[swap[d]] = Coord((swap[d],), kk,
                                    {"spacing": kk[1] - kk[0]}, swap[d])

    if true_phase:
        for d, lag in zip(dim, lag_x):
            fd = swap[d]
            ax = out_dims.index(fd)
            phase = np.exp(-2j * np.pi * out_coords[fd].values * lag)
            shape = [1] * len(out_dims)
            shape[ax] = phase.size
            f = f * phase.reshape(shape)
            out_coords[fd].attrs["direct_lag"] = lag

    if true_amplitude:
        f = f * np.prod([np.float64(d) for d in delta_x])

    return LabeledArray(f, dims=out_dims, coords=out_coords, name=da.name)


def ifft64(
    daft: LabeledArray,
    spacing_tol: float = 1e-3,
    dim=None,
    shift: bool = True,
    true_phase: bool = True,
    true_amplitude: bool = True,
    prefix: str = "freq_",
    lag=None,
) -> LabeledArray:
    """:func:`xrft_tpu.ifft` at emulated-float64 precision (host c128 out)."""
    dim = _norm_dim(daft, dim)
    ce.check_valid_fft_coords(daft, dim)

    if lag is None:
        lag = [
            (daft.coords[d].attrs.get("direct_lag", 0.0)
             if d in daft.coords else 0.0)
            for d in dim
        ]
    else:
        if isinstance(lag, (int, float)):
            lag = [lag]
        if len(lag) != len(dim):
            raise ValueError("dim and lag must have the same length.")

    # phase pre-multiply and sorting happen on host (metadata-sized work)
    f = np.asarray(daft.values, dtype=np.complex128)
    work = LabeledArray(f, dims=daft.dims, coords=daft.coords)
    if true_phase:
        for d, l in zip(dim, lag):
            c = _dim_coord(work, d)
            ax = work.get_axis_num(d)
            shape = [1] * work.ndim
            shape[ax] = c.size
            f = f * np.exp(2j * np.pi * c.values * float(l)).reshape(shape)
            work = LabeledArray(f, dims=daft.dims, coords=daft.coords)
    sortable = [d for d in dim if d in work.coords]
    if sortable:
        work = work.sortby(sortable)
        f = np.asarray(work.values, dtype=np.complex128)

    axis_num = [work.get_axis_num(d) for d in dim]
    N = [work.shape[n] for n in axis_num]
    delta_x = [
        ce.get_coordinate_spacing(_dim_coord(work, d), spacing_tol)
        for d in dim
    ]
    for d in dim:
        c = _dim_coord(work, d)
        l = ce.lag_coord(c)
        if np.abs(l) > spacing_tol:
            raise ValueError(
                "Inverse Fourier Transform can not be computed because "
                f"coordinate {d} is not centered on zero frequency"
            )

    f = np.fft.ifftshift(f, axes=axis_num)
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        out = np.fft.ifftn(f, axes=axis_num)
    else:
        re_h, re_l = df64.split_f64_np(np.ascontiguousarray(f.real))
        im_h, im_l = df64.split_f64_np(np.ascontiguousarray(f.imag))
        out4 = df64_fft_nd((re_h, re_l, im_h, im_l), axis_num, "ifft")
        out = df64_to_numpy(out4)

    if not true_phase:
        out = np.fft.ifftshift(out, axes=axis_num)
    if shift:
        out = np.fft.fftshift(out, axes=axis_num)

    k = ce.ifreq_grids(N, delta_x, False, shift)
    swap = {d: ce.freq_dim_name(d, prefix) for d in dim}
    out_dims = [swap.get(d, d) for d in work.dims]
    out_coords = {c: work.coords[c].copy() for c in work.coords if c not in dim}
    out_spacing = []
    for d, kk, l in zip(dim, k, lag):
        sp = kk[1] - kk[0]
        out_spacing.append(sp)
        out_coords[swap[d]] = Coord((swap[d],), kk + l, {"spacing": sp},
                                    swap[d])
    if true_amplitude:
        out = out / np.prod(out_spacing)

    return LabeledArray(out, dims=out_dims, coords=out_coords,
                        name=daft.name)
