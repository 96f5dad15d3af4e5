"""Pad/unpad tests (port of /root/reference/xrft/tests/test_padding.py):
coordinate extrapolation, attr bookkeeping, mode coverage, inversion, and
the pad -> fft -> ifft -> unpad round trip.
"""

import numpy as np
import numpy.testing as npt
import pytest

import xrft_tpu
from xrft_tpu import LabeledArray, pad, unpad


def sample():
    return LabeledArray(
        np.arange(1, 10, dtype=float).reshape(3, 3),
        dims=("y", "x"),
        coords={"x": [0, 1, 2], "y": [-5, -4, -3]},
    )


def test_pad_coords_extrapolated():
    da = sample()
    p = pad(da, x=2, y=1)
    assert p.shape == (5, 7)
    npt.assert_array_equal(p["x"].values, [-2, -1, 0, 1, 2, 3, 4])
    npt.assert_array_equal(p["y"].values, [-6, -5, -4, -3, -2])
    assert p["x"].attrs["pad_width"] == 2
    assert p["y"].attrs["pad_width"] == 1
    # default constant padding with zeros
    npt.assert_array_equal(p.values[0], np.zeros(7))
    npt.assert_array_equal(p.values[1, 2:5], [1, 2, 3])


def test_pad_asymmetric():
    da = sample()
    p = pad(da, x=(1, 4))
    assert p.shape == (3, 8)
    npt.assert_array_equal(p["x"].values, [-1, 0, 1, 2, 3, 4, 5, 6])
    assert p["x"].attrs["pad_width"] == (1, 4)
    npt.assert_array_equal(p.values[0], [0, 1, 2, 3, 0, 0, 0, 0])


@pytest.mark.parametrize("mode", [
    "constant", "edge", "linear_ramp", "maximum", "mean", "median",
    "minimum", "reflect", "symmetric", "wrap",
])
def test_pad_modes_match_numpy(mode):
    da = sample()
    p = pad(da, {"x": 2}, mode=mode)
    expected = np.pad(da.values, [(0, 0), (2, 2)], mode=mode)
    npt.assert_allclose(p.values, expected)


def test_pad_constant_values():
    da = sample()
    p = pad(da, {"x": 1}, constant_values=7.5)
    npt.assert_array_equal(p.values[:, 0], [7.5, 7.5, 7.5])


def test_pad_coord_attrs_kept():
    da = sample()
    da.coords["x"].attrs["units"] = "m"
    p = pad(da, x=1)
    assert p["x"].attrs["units"] == "m"
    assert p["x"].attrs["pad_width"] == 1


def test_pad_bad_coords_raise():
    da = sample().assign_coords(x2=(("x",), [10.0, 11.0, 12.0]))
    with pytest.raises(ValueError, match="drop"):
        pad(da, x=1)


def test_pad_uneven_coords_raise():
    da = LabeledArray(np.arange(4.0), dims=["x"],
                      coords={"x": [0.0, 1.0, 2.5, 3.0]})
    with pytest.raises(ValueError, match="evenly spaced"):
        pad(da, x=1)


def test_unpad_roundtrip():
    da = sample()
    p = pad(da, x=2, y=1)
    u = unpad(p)
    npt.assert_array_equal(u.values, da.values)
    npt.assert_array_equal(u["x"].values, da["x"].values)
    npt.assert_array_equal(u["y"].values, da["y"].values)
    assert "pad_width" not in u["x"].attrs


def test_unpad_explicit_width():
    da = sample()
    p = pad(da, x=2, y=1)
    u = unpad(p, x=1, y=1)
    assert u.shape == (3, 5)
    npt.assert_array_equal(u["x"].values, [-1, 0, 1, 2, 3])


def test_unpad_without_attrs_raises():
    da = sample()
    with pytest.raises(ValueError, match="padded"):
        unpad(da)


def test_pad_fft_ifft_unpad_roundtrip():
    """Port of /root/reference/xrft/tests/test_padding.py:222-234."""
    N = 16
    x = np.linspace(0, 1, N, endpoint=False)
    rng = np.random.RandomState(0)
    da = LabeledArray(rng.randn(N), dims=["x"], coords={"x": x})
    padded = pad(da, x=4)
    F = xrft_tpu.fft(padded, true_phase=True, true_amplitude=True)
    lag = F["freq_x"].attrs["direct_lag"]
    back = xrft_tpu.ifft(F, true_phase=True, true_amplitude=True, lag=lag)
    unpadded = unpad(
        LabeledArray(back.values.real, dims=["x"],
                     coords={"x": back["x"].copy(
                         attrs={**back["x"].attrs,
                                "pad_width": padded["x"].attrs["pad_width"]})}),
    )
    npt.assert_allclose(unpadded.values, da.values, atol=1e-11)
    npt.assert_allclose(unpadded["x"].values, x, atol=1e-11)


def test_pad_per_dim_mapping_kwargs():
    """Dict-valued per-dim constant_values / end_values / stat_length,
    matching the reference's xarray.DataArray.pad forwarding
    (/root/reference/xrft/padding.py:73-112)."""
    rng = np.random.RandomState(0)
    da = LabeledArray(rng.rand(4, 6), dims=["y", "x"],
                      coords={"y": np.arange(4.0), "x": np.arange(6.0)})

    p = xrft_tpu.pad(da, {"y": 1, "x": 2}, mode="constant",
                     constant_values={"y": 7.0, "x": (1.0, 2.0)})
    ref = np.pad(da.values, ((1, 1), (2, 2)), mode="constant",
                 constant_values=((7.0, 7.0), (1.0, 2.0)))
    npt.assert_allclose(p.values, ref)

    # missing dim falls back to the default (0)
    p = xrft_tpu.pad(da, {"y": 1, "x": 1}, mode="constant",
                     constant_values={"x": 3.0})
    ref = np.pad(da.values, 1, mode="constant",
                 constant_values=((0.0, 0.0), (3.0, 3.0)))
    npt.assert_allclose(p.values, ref)

    p = xrft_tpu.pad(da, {"x": 2}, mode="linear_ramp",
                     end_values={"x": (5.0, -1.0)})
    ref = np.pad(da.values, ((0, 0), (2, 2)), mode="linear_ramp",
                 end_values=((0, 0), (5.0, -1.0)))
    npt.assert_allclose(p.values, ref)

    p = xrft_tpu.pad(da, {"x": 2}, mode="maximum",
                     stat_length={"x": 2})
    ref = np.pad(da.values, ((0, 0), (2, 2)), mode="maximum",
                 stat_length=((4, 4), (2, 2)))
    npt.assert_allclose(p.values, ref)

    with pytest.raises(ValueError, match="unknown dims"):
        xrft_tpu.pad(da, {"x": 1}, mode="constant",
                     constant_values={"z": 1.0})
