"""Binned aggregation over static frequency grids.

The reference performs azimuthal binning with a host ``pd.cut`` plus a
``numpy_groupies`` scatter-add per block
(``/root/reference/xrft/xrft.py:877-945``).  On TPU, scatters are slow and
the bin *indices* depend only on the static frequency grid — so the
aggregation becomes a dense matmul against a host-built one-hot
``(n_points, n_bins)`` matrix, which runs on the MXU at full rate and
batches over all non-core dims for free.  Out-of-range points (pd.cut code
-1) get an all-zero one-hot row and drop out of the sum naturally.

``pd.cut`` right-closed equal-width bin semantics are reproduced exactly by
calling pandas itself on the host grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from . import carray

__all__ = ["cut_codes", "binned_sum", "binned_mean_np"]

_HIGHEST = jax.lax.Precision.HIGHEST


def cut_codes(values: np.ndarray, nbins: int):
    """pd.cut equal-width right-closed bin codes for a flattened host array.

    Returns (codes, n_bins) with codes == -1 for out-of-range/NaN.
    """
    binned = pd.cut(np.ravel(values), nbins)
    return np.asarray(binned.codes), binned.categories.size


def binned_mean_np(values: np.ndarray, codes: np.ndarray, nbins: int) -> np.ndarray:
    """Host-side per-bin mean (used for static quantities like the radial
    coordinate); empty bins give 0 (reference fill_value=0)."""
    flat = np.ravel(values)
    mask = codes >= 0
    sums = np.bincount(codes[mask], weights=flat[mask], minlength=nbins)
    counts = np.bincount(codes[mask], minlength=nbins)
    out = np.zeros(nbins, dtype=np.float64)
    nz = counts > 0
    out[nz] = sums[nz] / counts[nz]
    return out


def _onehot(codes: np.ndarray, nbins: int, rdtype) -> np.ndarray:
    oh = np.zeros((codes.size, nbins), dtype=rdtype)
    mask = codes >= 0
    oh[np.nonzero(mask)[0], codes[mask]] = 1.0
    return oh


def binned_sum(data, codes: np.ndarray, nbins: int):
    """Per-bin sum over the trailing (flattened-core) axis of `data` via a
    one-hot MXU matmul; supports real arrays, native complex, and
    ComplexPairs.  data shape (..., n_points) -> (..., nbins)."""

    def mm(x):
        rdtype = np.float64 if np.dtype(x.dtype) in (
            np.dtype(np.float64),
        ) else np.float32
        oh = jnp.asarray(_onehot(codes, nbins, rdtype))
        return jnp.einsum("...p,pb->...b", x, oh, precision=_HIGHEST)

    if carray.is_pair(data):
        return carray.ComplexPair(mm(data.re), mm(data.im))
    if np.dtype(data.dtype).kind == "c":
        return jax.lax.complex(mm(jnp.real(data)), mm(jnp.imag(data)))
    return mm(data)
