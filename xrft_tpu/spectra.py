"""Spectral estimators: power/cross spectra, cross phase, scaling rules.

Re-implements the estimator layer of the reference
(``/root/reference/xrft/xrft.py:649-874``) on top of the jit-traceable
transform core.  The |F|^2 / F1*conj(F2) kernels, the one-sided real-dim
doubling, the window corrections, and the density/spectrum scalings all
fuse into the same XLA program as the transform itself.

Complex math is representation-generic (native complex on CPU/GPU, split
pairs on TPU) via :mod:`.ops.carray`.
"""

from __future__ import annotations

import warnings

import numpy as np

from .labeled import Coord, LabeledArray
from .ops import carray
from .transform import fft, _real_flag_warning

__all__ = ["power_spectrum", "cross_spectrum", "cross_phase"]


def _window_correction_factor(da, dim, scaling, window):
    """density -> mean(window^2); spectrum -> mean(window)^2
    (reference ``/root/reference/xrft/xrft.py:649-660``)."""
    if window is None:
        raise ValueError(
            "window_correction can only be applied when windowing is "
            "turned on."
        )
    from .ops.window import apply_window

    windows, _ = apply_window(da, dim, window_type=window)
    if scaling == "density":
        return (windows**2).mean()
    elif scaling == "spectrum":
        return windows.mean() ** 2
    raise ValueError(f"Unknown {scaling} scaling flag")


def _psd_scaling_factor(ps, dims, scaling):
    """density -> prod(freq spacing); spectrum -> prod(freq spacing)^2
    (reference ``/root/reference/xrft/xrft.py:663-670``)."""
    fs = np.prod([float(ps.coords[d].attrs["spacing"]) for d in dims])
    if scaling == "density":
        return fs
    elif scaling == "spectrum":
        return fs**2
    raise ValueError(f"Unknown {scaling} scaling flag")


def _psd_real_dim_scaling(da, ps, real_dim, updated_dims):
    """One-sided spectrum doubling on the real freq axis, except DC (and
    Nyquist when N even) (reference ``/root/reference/xrft/xrft.py:673-682``)."""
    real = next(d for d in updated_dims if d.endswith(real_dim))
    f = np.full(ps.sizes[real], 2.0)
    if da.sizes[real_dim] % 2 == 0:
        f[0], f[-1] = 1.0, 1.0
    else:
        f[0] = 1.0
    return LabeledArray(f, dims=(real,), coords={real: ps.coords[real]})


def _pop_density(kwargs, fname, scaling):
    if "density" in kwargs:
        density = kwargs.pop("density")
        warnings.warn(
            f"density flag will be deprecated in future version of "
            f"xrft_tpu.{fname} and replaced by scaling flag. "
            'density=True should be replaced by scaling="density" and '
            "density=False will not be maintained.\nscaling flag is ignored !",
            FutureWarning,
        )
        scaling = "density" if density else "false_density"
    return kwargs, scaling


def power_spectrum(
    da: LabeledArray,
    dim=None,
    real_dim=None,
    scaling="density",
    window_correction=False,
    **kwargs,
) -> LabeledArray:
    """Power spectrum of `da`: |F(da)|^2 with amplitude-true scaling.

    scaling: 'density' normalizes to power spectral density, 'spectrum' to
    power spectrum (peak amplitudes).  window_correction=True divides by the
    window's energy (density) or squared mean (spectrum), matching
    scipy.signal.welch/periodogram conventions.  Reference:
    ``/root/reference/xrft/xrft.py:685-750``.
    """
    kwargs, scaling = _pop_density(kwargs, "power_spectrum", scaling)

    if "real" in kwargs:
        real_dim = kwargs.get("real")
        warnings.warn(_real_flag_warning, FutureWarning)

    # true_phase does not matter for |F|^2; forced off to skip phase work
    kwargs.update({"true_amplitude": True, "true_phase": False})

    daft = fft(da, dim=dim, real_dim=real_dim, **kwargs)
    updated_dims = [
        d for d in daft.dims if (d not in da.dims and "segment" not in d)
    ]
    ps = daft.copy(data=carray.abs2(daft.data))
    ps.attrs = {}

    if real_dim is not None:
        ps = ps * _psd_real_dim_scaling(da, ps, real_dim, updated_dims)

    if scaling != "false_density":
        if window_correction:
            ps = ps / _window_correction_factor(
                da, dim, scaling, kwargs.get("window")
            )
        ps = ps * _psd_scaling_factor(ps, updated_dims, scaling)

    return ps


def cross_spectrum(
    da1: LabeledArray,
    da2: LabeledArray,
    dim=None,
    real_dim=None,
    scaling="density",
    window_correction=False,
    true_phase=True,
    **kwargs,
) -> LabeledArray:
    """Cross spectrum F(da1) * conj(F(da2)) with the same scaling machinery
    as :func:`power_spectrum`; true_phase defaults True here (reference
    ``/root/reference/xrft/xrft.py:753-835``)."""
    if "real" in kwargs:
        real_dim = kwargs.get("real")
        warnings.warn(_real_flag_warning, FutureWarning)

    kwargs, scaling = _pop_density(kwargs, "cross_spectrum", scaling)
    kwargs.update({"true_amplitude": True})

    daft1 = fft(da1, dim=dim, real_dim=real_dim, true_phase=true_phase, **kwargs)
    daft2 = fft(da2, dim=dim, real_dim=real_dim, true_phase=true_phase, **kwargs)

    if daft1.dims != daft2.dims:
        raise ValueError("The two datasets have different dimensions")

    updated_dims = [
        d for d in daft1.dims if (d not in da1.dims and "segment" not in d)
    ]
    cs = daft1 * daft2.conj()

    if real_dim is not None:
        cs = cs * _psd_real_dim_scaling(da1, cs, real_dim, updated_dims)

    if scaling != "false_density":
        if window_correction:
            cs = cs / _window_correction_factor(
                da1, dim, scaling, kwargs.get("window")
            )
        cs = cs * _psd_scaling_factor(cs, updated_dims, scaling)

    return cs


def cross_phase(da1, da2, dim=None, true_phase=True, **kwargs) -> LabeledArray:
    """Phase of the cross spectrum, in [-pi, pi]
    (reference ``/root/reference/xrft/xrft.py:838-874``)."""
    cs = cross_spectrum(da1, da2, dim=dim, true_phase=true_phase, **kwargs)
    cp = cs.copy(data=carray.angle(cs.data))
    if da1.name and da2.name:
        cp.name = f"{da1.name}_{da2.name}_phase"
    return cp
