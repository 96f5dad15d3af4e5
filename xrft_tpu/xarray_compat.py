"""Optional xarray interop.

When xarray is installed, :func:`from_xarray` / :func:`to_xarray` convert
between ``xarray.DataArray`` and :class:`~xrft_tpu.labeled.LabeledArray`
losslessly (dims, 1-D and multi-dim coords, attrs, name), so existing
xrft-based analysis code can move to the TPU pipelines by converting at the
boundary.  xarray is not a dependency of this package (it is absent from
the TPU image this framework targets); both functions raise a clear
ImportError without it.
"""

from __future__ import annotations

import numpy as np

from .labeled import Coord, LabeledArray

__all__ = ["from_xarray", "to_xarray"]


def _require_xarray():
    try:
        import xarray
    except ImportError as e:  # pragma: no cover - xarray absent in CI image
        raise ImportError(
            "xarray is required for from_xarray/to_xarray; install it or "
            "construct LabeledArray directly."
        ) from e
    return xarray


def from_xarray(da) -> LabeledArray:
    """Convert an ``xarray.DataArray`` to a :class:`LabeledArray`."""
    _require_xarray()
    coords = {
        name: Coord(tuple(c.dims), np.asarray(c.values), dict(c.attrs), name)
        for name, c in da.coords.items()
    }
    return LabeledArray(
        np.asarray(da.values),
        dims=tuple(da.dims),
        coords=coords,
        attrs=dict(da.attrs),
        name=da.name,
    )


def to_xarray(la: LabeledArray):
    """Convert a :class:`LabeledArray` to an ``xarray.DataArray``."""
    xr = _require_xarray()
    coords = {}
    for name, c in la.coords.items():
        coords[name] = xr.DataArray(
            c.values, dims=c.dims, attrs=dict(c.attrs), name=name
        )
    return xr.DataArray(
        la.values,
        dims=la.dims,
        coords=coords,
        attrs=dict(la.attrs),
        name=la.name,
    )
