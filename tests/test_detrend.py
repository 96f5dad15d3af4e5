"""Detrend tests: trend injection -> detrend -> recovery, parametrized over
dims/shapes/amplitudes (port of /root/reference/xrft/tests/test_detrend.py).
The closed-form implementation must match the reference's least-squares
fits (scipy.signal.detrend in 1-D; plane/hyperplane fits in 2-D/3-D).
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.signal as sps

from xrft_tpu import LabeledArray, detrend


def make(shape, dims):
    rng = np.random.RandomState(sum(shape))
    coords = {d: np.arange(n) for d, n in zip(dims, shape)}
    return LabeledArray(rng.randn(*shape), dims=dims, coords=coords)


@pytest.mark.parametrize("shape,dims,dim", [
    ((32,), ["x"], ["x"]),
    ((8, 32), ["y", "x"], ["x"]),
    ((8, 32), ["y", "x"], ["y"]),
    ((4, 8, 32), ["z", "y", "x"], ["x"]),
])
def test_detrend_1d_matches_scipy(shape, dims, dim):
    da = make(shape, dims)
    axis = dims.index(dim[0])
    expected = sps.detrend(da.values, axis=axis)
    got = detrend(da, dim, "linear").values
    npt.assert_allclose(got, expected, atol=1e-10)


@pytest.mark.parametrize("amp", [1.0, 100.0])
@pytest.mark.parametrize("ndim_extra", [0, 1])
def test_detrend_2d_recovers_signal(amp, ndim_extra):
    """Inject a 2-D linear trend; detrend must recover the original."""
    N, M = 16, 24
    rng = np.random.RandomState(0)
    sig = rng.randn(N, M)
    sig -= _plane_fit_2d(sig)  # make signal trend-free
    i, j = np.meshgrid(np.arange(N), np.arange(M), indexing="ij")
    trend = amp * (1.5 + 0.5 * i - 0.2 * j)
    total = sig + trend
    if ndim_extra:
        total = np.broadcast_to(total, (3, N, M))
        da = LabeledArray(np.ascontiguousarray(total), dims=["t", "y", "x"])
        got = detrend(da, ["y", "x"], "linear").values
        for t in range(3):
            npt.assert_allclose(got[t], sig, atol=amp * 1e-10)
    else:
        da = LabeledArray(total, dims=["y", "x"])
        got = detrend(da, ["y", "x"], "linear").values
        npt.assert_allclose(got, sig, atol=amp * 1e-10)


def _plane_fit_2d(arr):
    """Reference-style normal-equation plane fit (oracle)."""
    N = arr.shape
    col0 = np.ones(N[0] * N[1])
    col1 = np.repeat(np.arange(N[0]), N[1]) + 1
    col2 = np.tile(np.arange(N[1]), N[0]) + 1
    G = np.stack([col0, col1, col2]).transpose()
    d_obs = np.reshape(arr, (N[0] * N[1], 1))
    m_est = np.linalg.lstsq(G, d_obs, rcond=None)[0]
    return (G @ m_est).reshape(N)


def test_detrend_2d_matches_reference_plane_fit():
    """Closed-form fit == the reference's normal-equation solution."""
    rng = np.random.RandomState(1)
    arr = rng.randn(12, 20) + np.arange(20) * 0.7 + np.arange(12)[:, None] * 1.3
    da = LabeledArray(arr, dims=["y", "x"])
    got = detrend(da, ["y", "x"], "linear").values
    expected = arr - _plane_fit_2d(arr)
    npt.assert_allclose(got, expected, atol=1e-10)


def test_detrend_3d_recovers_signal():
    N0, N1, N2 = 8, 12, 16
    rng = np.random.RandomState(2)
    i, j, k = np.meshgrid(np.arange(N0), np.arange(N1), np.arange(N2),
                          indexing="ij")
    trend = 2.0 + 0.3 * i - 0.7 * j + 1.1 * k
    sig = rng.randn(N0, N1, N2)
    da = LabeledArray(sig + trend, dims=["z", "y", "x"])
    got = detrend(da, ["z", "y", "x"], "linear").values
    # residual must contain no linear component: regressing it on the
    # centered coordinates gives ~zero slopes
    for axis, c in [(0, i), (1, j), (2, k)]:
        cc = c - c.mean()
        slope = (got * cc).sum() / (cc**2).sum()
        npt.assert_allclose(slope, 0.0, atol=1e-12)


def test_detrend_constant():
    da = make((8, 8), ["y", "x"])
    got = detrend(da, ["y", "x"], "constant").values
    npt.assert_allclose(got, da.values - da.values.mean(), atol=1e-14)
    got = detrend(da, ["x"], "constant").values
    npt.assert_allclose(got, da.values - da.values.mean(axis=1, keepdims=True),
                        atol=1e-14)


def test_detrend_invalid_type_raises():
    da = make((8,), ["x"])
    with pytest.raises(NotImplementedError):
        detrend(da, ["x"], "cubic")


def test_detrend_none_passthrough():
    da = make((8,), ["x"])
    npt.assert_array_equal(detrend(da, ["x"], None).values, da.values)


def test_detrend_4d_linear():
    """Beyond the reference: 4-D hyperplane detrend (the closed form has no
    dimensionality limit)."""
    shape = (4, 5, 6, 7)
    rng = np.random.RandomState(3)
    grids = np.meshgrid(*[np.arange(n) for n in shape], indexing="ij")
    trend = 1.0 + sum((m + 1) * 0.1 * g for m, g in enumerate(grids))
    da = LabeledArray(rng.randn(*shape) + trend, dims=["a", "b", "c", "d"])
    got = detrend(da, None, "linear").values
    for g in grids:
        cc = g - g.mean()
        slope = (got * cc).sum() / (cc**2).sum()
        npt.assert_allclose(slope, 0.0, atol=1e-12)
