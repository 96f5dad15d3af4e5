"""Pad / unpad an N-dimensional regular grid with coordinate extrapolation.

Re-implements the reference padding layer
(``/root/reference/xrft/padding.py``): data is padded with the full family
of numpy pad modes (on device via ``jnp.pad`` where supported, with a host
fallback for modes XLA lacks), while the evenly spaced coordinates are
extrapolated host-side with the same spacing; the ``pad_width`` used is
recorded in each coordinate's attrs so :func:`unpad` can invert the
operation by static slicing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .labeled import Coord, LabeledArray
from .ops import carray
from .utils import get_spacing

__all__ = ["pad", "unpad"]

# modes jnp.pad implements; others fall back to host numpy.pad
_JNP_MODES = {
    "constant", "edge", "linear_ramp", "maximum", "mean", "median",
    "minimum", "reflect", "symmetric", "wrap", "empty",
}


def _either_dict_or_kwargs(pos, kw, fname):
    if pos is not None:
        if kw:
            raise ValueError(
                f"cannot specify both keyword and positional arguments to "
                f"{fname}"
            )
        return dict(pos)
    return dict(kw)


def pad(
    da: LabeledArray,
    pad_width=None,
    mode="constant",
    stat_length=None,
    constant_values=0,
    end_values=None,
    reflect_type=None,
    **pad_width_kwargs,
) -> LabeledArray:
    """Pad array and extrapolate its evenly spaced coordinates.

    ``pad_width``: mapping {dim: pad} or {dim: (before, after)}.  Supports
    the numpy pad modes (constant/edge/linear_ramp/maximum/mean/median/
    minimum/reflect/symmetric/wrap).  The pad_width used for each coordinate
    is stored in its attrs for :func:`unpad` to invert.
    Reference: ``/root/reference/xrft/padding.py:11-181``.
    """
    pad_width = _either_dict_or_kwargs(pad_width, pad_width_kwargs, "pad")
    _check_bad_coords(da, pad_width.keys())

    norm = {}
    for d, w in pad_width.items():
        if d not in da.dims:
            raise ValueError(f"pad dim {d!r} not in array dims {da.dims}")
        norm[d] = (w, w) if isinstance(w, int) else tuple(w)

    widths = [norm.get(d, (0, 0)) for d in da.dims]

    def _per_axis(value, defaults):
        """Normalize a per-dim mapping {dim: v | (before, after)} into
        numpy's per-axis tuple form, matching how the reference forwards
        these through xarray.DataArray.pad
        (/root/reference/xrft/padding.py:73-112: mapping, tuple, and
        scalar spellings)."""
        if not isinstance(value, dict):
            return value
        unknown = set(value) - set(da.dims)
        if unknown:
            raise ValueError(
                f"per-dim pad argument has unknown dims {sorted(unknown)}"
            )
        out = []
        for d, dflt in zip(da.dims, defaults):
            v = value.get(d, dflt)
            out.append(tuple(v) if isinstance(v, (tuple, list)) else (v, v))
        return tuple(out)

    kw = {}
    if mode == "constant":
        kw["constant_values"] = _per_axis(
            constant_values, [0] * len(da.dims))
    elif mode == "linear_ramp":
        kw["end_values"] = _per_axis(
            end_values if end_values is not None else 0, [0] * len(da.dims))
    elif mode in ("maximum", "mean", "median", "minimum"):
        if stat_length is not None:
            # a missing dim uses the whole axis (numpy's None semantics)
            kw["stat_length"] = _per_axis(
                stat_length, [da.sizes[d] for d in da.dims])
    elif mode in ("reflect", "symmetric"):
        if reflect_type is not None:
            kw["reflect_type"] = reflect_type

    data = da.data
    if mode in _JNP_MODES:
        try:
            padded = carray.pad(data if not isinstance(data, np.ndarray)
                                else jnp.asarray(data), widths, mode=mode, **kw)
        except (NotImplementedError, ValueError):
            padded = _host_pad(data, widths, mode, kw)
    else:
        padded = _host_pad(data, widths, mode, kw)

    new_coords = {}
    for cname, c in da.coords.items():
        if cname in norm:
            spacing = get_spacing(c)
            before, after = norm[cname]
            vals = c.values.astype(np.result_type(c.values.dtype, np.float64)) \
                if before or after else c.values
            ext = np.concatenate([
                vals[0] - spacing * np.arange(before, 0, -1),
                vals,
                vals[-1] + spacing * np.arange(1, after + 1),
            ])
            attrs = dict(c.attrs)
            attrs["pad_width"] = pad_width[cname]
            new_coords[cname] = Coord(c.dims, ext, attrs, cname)
        else:
            new_coords[cname] = c.copy()

    return LabeledArray(padded, dims=da.dims, coords=new_coords,
                        attrs=da.attrs, name=da.name)


def _host_pad(data, widths, mode, kw):
    host = carray.to_numpy(data)
    return np.pad(host, widths, mode=mode, **kw)


def _check_bad_coords(da: LabeledArray, padding_dims):
    """Reject extra coordinates sharing a padded dim
    (reference ``/root/reference/xrft/padding.py:184-215``)."""
    bad_coords = []
    for coord in padding_dims:
        if coord not in da.coords:
            continue
        d = da.coords[coord].dims[0]
        bad_coords += [
            c for c in da.coords if d in da.coords[c].dims and c != coord
        ]
    if bad_coords:
        listed = "'" + "', '".join(sorted(set(bad_coords))) + "'"
        raise ValueError(
            "Please, drop the following coordinates from the passed "
            f"DataArray before trying to pad it: {listed}."
        )


def unpad(da: LabeledArray, pad_width=None, **pad_width_kwargs) -> LabeledArray:
    """Undo :func:`pad` by slicing the array and its coordinates.

    With no arguments, the pad_width is read from each coordinate's
    ``pad_width`` attr.  Reference: ``/root/reference/xrft/padding.py:321-446``.
    """
    if pad_width is None and not pad_width_kwargs:
        pad_width = {
            d: c.attrs["pad_width"]
            for d, c in da.coords.items()
            if "pad_width" in c.attrs
        }
        if not pad_width:
            raise ValueError(
                "The passed array doesn't seem to be a padded one: the "
                "'pad_width' attribute was missing on every one of its "
                "coordinates. "
            )
    else:
        pad_width = _either_dict_or_kwargs(pad_width, pad_width_kwargs, "pad")

    slices = {}
    for d, w in pad_width.items():
        w = (w, w) if isinstance(w, int) else tuple(w)
        slices[d] = slice(w[0], da.sizes[d] - w[1])
    out = da.isel(slices)
    for d in pad_width:
        if d in out.coords:
            out.coords[d].attrs.pop("pad_width", None)
    return out
