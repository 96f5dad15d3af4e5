"""Fourier resampling tests: scipy.signal.resample parity (up/down/same,
even/odd lengths, real/complex input, windows, domain='freq'), the
coordinate rebuild, engines/modes, jit staging, and error contracts.
Beyond the reference (no resampling in /root/reference)."""

import jax
import numpy as np
import numpy.testing as npt
import pytest
import scipy.signal as sps

import xrft_tpu
from xrft_tpu import LabeledArray
from xrft_tpu.config import complex_mode, fft_engine


def make_1d(n, seed=0, complex=False, dx=0.5):
    rng = np.random.RandomState(seed)
    x = rng.randn(n) + (1j * rng.randn(n) if complex else 0)
    return x, LabeledArray(x, dims=["t"],
                           coords={"t": np.arange(n) * dx}, name="u")


@pytest.mark.parametrize("complex_input", [False, True])
@pytest.mark.parametrize("n,num", [
    (16, 24), (16, 25), (15, 24), (15, 25),   # upsampling
    (16, 8), (16, 9), (15, 8), (15, 9),       # downsampling
    (16, 16), (15, 15),                       # identity
    (2, 5), (2, 3), (4, 2),                   # tiny/edge Nyquist cases
])
def test_resample_scipy_parity(n, num, complex_input):
    x, da = make_1d(n, seed=1, complex=complex_input)
    got = np.asarray(xrft_tpu.resample(da, num).values)
    want = sps.resample(x, num)
    npt.assert_allclose(got, want, atol=1e-12 * max(1.0, np.abs(want).max()))
    assert got.shape == (num,)
    assert (got.dtype.kind == "c") == complex_input


def test_resample_bandlimited_exact():
    """Band-limited signals resample exactly (the defining property)."""
    n, num = 32, 96
    t = np.arange(n) / n
    x = np.sin(2 * np.pi * 3 * t) + 0.5 * np.cos(2 * np.pi * 5 * t)
    da = LabeledArray(x, dims=["t"], coords={"t": t})
    got = np.asarray(xrft_tpu.resample(da, num).values)
    t_up = np.arange(num) / num
    want = np.sin(2 * np.pi * 3 * t_up) + 0.5 * np.cos(2 * np.pi * 5 * t_up)
    npt.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("window", [
    "hann", ("kaiser", 5.0), ("tukey", 0.25),
])
@pytest.mark.parametrize("n", [16, 15])
def test_resample_window_string_parity(n, window):
    x, da = make_1d(n, seed=2)
    got = np.asarray(xrft_tpu.resample(da, 11, window=window).values)
    want = sps.resample(x, 11, window=window)
    npt.assert_allclose(got, want, atol=1e-12 * max(1.0, np.abs(want).max()))


def test_resample_window_callable_and_array():
    x, da = make_1d(20, seed=3, complex=True)
    f = lambda freqs: np.exp(-(freqs / 0.25) ** 2)  # noqa: E731
    got = np.asarray(xrft_tpu.resample(da, 30, window=f).values)
    want = sps.resample(x, 30, window=f)
    npt.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())

    w = np.random.RandomState(4).rand(20)
    got = np.asarray(xrft_tpu.resample(da, 12, window=w).values)
    want = sps.resample(x, 12, window=w)
    npt.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())


def test_resample_domain_freq():
    x, _ = make_1d(24, seed=5, complex=True)
    X = np.fft.fft(x)
    da = LabeledArray(X, dims=["t"], coords={"t": np.arange(24.0)})
    got = np.asarray(xrft_tpu.resample(da, 15, domain="freq").values)
    want = sps.resample(X, 15, domain="freq")
    npt.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())


def test_resample_coordinate_rebuild_matches_scipy_t():
    x, da = make_1d(16, seed=6, dx=0.5)
    out = xrft_tpu.resample(da, 24)
    _, new_t = sps.resample(x, 24, t=np.arange(16) * 0.5)
    npt.assert_allclose(out.coords["t"].values, new_t, atol=1e-14)
    # decreasing coordinate: signed spacing preserved
    dd = LabeledArray(x, dims=["t"],
                      coords={"t": np.arange(16)[::-1] * 2.0})
    o2 = xrft_tpu.resample(dd, 8)
    npt.assert_allclose(o2.coords["t"].values,
                        30.0 + np.arange(8) * (-2.0 * 16 / 8), atol=1e-12)


def test_resample_batch_dims_and_other_coords():
    rng = np.random.RandomState(7)
    x = rng.randn(3, 20)
    da = LabeledArray(x, dims=["z", "t"],
                      coords={"z": np.arange(3.0), "t": np.arange(20.0)})
    out = xrft_tpu.resample(da, 30, dim="t")
    npt.assert_allclose(np.asarray(out.values),
                        sps.resample(x, 30, axis=-1), atol=1e-12)
    npt.assert_allclose(out.coords["z"].values, da.coords["z"].values)
    assert out.sizes["t"] == 30


@pytest.mark.parametrize("mode", ["native", "split"])
@pytest.mark.parametrize("engine", ["xla", "matmul"])
def test_resample_engines_and_modes(mode, engine):
    x, da = make_1d(32, seed=8)
    with complex_mode(mode), fft_engine(engine):
        got = np.asarray(xrft_tpu.resample(da, 48).values)
    npt.assert_allclose(got, sps.resample(x, 48), atol=1e-10)


def test_resample_is_jit_traceable():
    x, da = make_1d(32, seed=9)

    @jax.jit
    def f(la):
        return xrft_tpu.resample(la, 20).data

    from xrft_tpu.ops.carray import to_numpy
    got = to_numpy(f(da))
    npt.assert_allclose(np.real(got), sps.resample(x, 20), atol=1e-12)


def test_resample_error_contracts():
    _, da = make_1d(16)
    with pytest.raises(ValueError, match="domain must be"):
        xrft_tpu.resample(da, 8, domain="nope")
    with pytest.raises(ValueError, match="num must be a positive"):
        xrft_tpu.resample(da, 0)
    with pytest.raises(ValueError, match="window array must have shape"):
        xrft_tpu.resample(da, 8, window=np.ones(7))
