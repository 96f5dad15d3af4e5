"""Acceptance tests mirroring the reference's doc notebooks (the de-facto
end-to-end suite, SURVEY.md §6): DFT-iDFT phase-preservation example,
Parseval example, chunk (Welch-segment) example, and a MITgcm-style
batched analysis.
"""

import numpy as np
import numpy.testing as npt
import pytest

import xrft_tpu
from xrft_tpu import LabeledArray
from xrft_tpu.config import complex_mode

MODES = ["native", "split"]


@pytest.mark.parametrize("mode", MODES)
def test_theoretical_sinc_matching(mode):
    """Truncated-cosine transform matches the analytic sinc pair on an
    uncentered fine grid (doc/DFT-iDFT_example.ipynb; accuracy pinned by the
    reference test at test_xrft.py:1209-1228, rtol=1e-8 atol=1e-3)."""
    f0 = 2.0
    T = 4.0
    dx = 1e-4
    x = np.arange(-6 * T, 5 * T, dx)
    y = np.cos(2.0 * np.pi * f0 * x)
    y[np.abs(x) >= (T / 2.0)] = 0.0
    with complex_mode(mode):
        da = LabeledArray(y, dims=("x",), coords={"x": x})
        S = xrft_tpu.fft(da, dim="x", true_phase=True, true_amplitude=True)
        k = S["freq_x"].values
        TF_s = T / 2 * (np.sinc(T * (k - f0)) + np.sinc(T * (k + f0)))
        npt.assert_allclose(S.values, TF_s.astype(complex), rtol=1e-8,
                            atol=1e-3)


@pytest.mark.parametrize("mode", MODES)
def test_true_phase_uncentered_odd(mode):
    """true_phase on an uncentered, odd-length grid equals
    fft(ifftshift(y)) * exp(-2i pi f lag) (port of test_xrft.py:1190-1207)."""
    f0 = 2.0
    T = 4.0
    dx = 0.02
    x = np.arange(-8 * T, 5 * T + dx, dx)
    y = np.cos(2 * np.pi * f0 * x)
    y[np.abs(x) >= (T / 2.0)] = 0.0
    lag = x[len(x) // 2]
    f = np.fft.fftfreq(len(x), dx)
    expected = np.fft.fft(np.fft.ifftshift(y)) * np.exp(
        -1j * 2.0 * np.pi * f * lag
    )
    with complex_mode(mode):
        da = LabeledArray(y, dims=("x",), coords={"x": x})
        out = xrft_tpu.fft(da, dim="x", true_phase=True,
                           true_amplitude=False, shift=False)
        npt.assert_allclose(out.values, expected, atol=1e-10)
        npt.assert_allclose(out["freq_x"].values, f)
        # inverse with phase preservation restores signal and coordinates
        ida = xrft_tpu.ifft(out, true_phase=True, true_amplitude=False,
                            lag=lag, shift=True)
        npt.assert_allclose(ida.values.real, y, atol=1e-10)
        npt.assert_allclose(ida["x"].values, x, atol=1e-9)


def test_parseval_example():
    """doc/Parseval_example.ipynb: amplitude-true Parseval in 1-D/2-D with
    random spacings and origins (same math as tests/test_spectra.py, here at
    the notebook's exact shapes)."""
    rng = np.random.RandomState(42)
    Nx, Ny = 40, 60
    dx, dy = rng.rand(), rng.rand()
    xc = dx * (np.arange(-Nx // 2, -Nx // 2 + Nx) + rng.randint(-Nx // 2, Nx // 2))
    yc = dy * (np.arange(-Ny // 2, -Ny // 2 + Ny) + rng.randint(-Ny // 2, Ny // 2))
    sig = rng.rand(Nx, Ny) + 1j * rng.rand(Nx, Ny)
    da2 = LabeledArray(sig, dims=["x", "y"], coords={"x": xc, "y": yc})
    FT2 = xrft_tpu.fft(da2, dim=["x", "y"], true_phase=True,
                       true_amplitude=True)
    npt.assert_allclose(
        (np.abs(FT2.values) ** 2).sum()
        * FT2["freq_x"].attrs["spacing"] * FT2["freq_y"].attrs["spacing"],
        (np.abs(sig) ** 2).sum() * dx * dy,
        rtol=1e-10,
    )


def test_chunk_example_segments():
    """doc/chunk_example.ipynb: chunks_to_segments reshape + per-segment FFT
    equals the hand-reshaped oracle; segment-averaged PSD shape."""
    n = 2**8
    rng = np.random.RandomState(0)
    vals = rng.rand(n, n // 2, n // 2)
    da = LabeledArray(vals, dims=["time", "y", "x"])
    daft = xrft_tpu.fft(
        da.chunk({"time": n // 4}), dim=["time"], shift=False,
        chunks_to_segments=True, true_phase=False, true_amplitude=False,
    )
    assert daft.dims == ("time_segment", "freq_time", "y", "x")
    data_rs = vals.reshape(4, n // 4, n // 2, n // 2)
    npt.assert_allclose(daft.values, np.fft.fftn(data_rs, axes=[1]),
                        atol=1e-8)

    ps = xrft_tpu.power_spectrum(
        da.chunk({"time": n // 4}), dim=["time"], chunks_to_segments=True
    )
    ps_m = ps.mean(["time_segment", "y", "x"])
    assert ps_m.dims == ("freq_time",)
    assert ps_m.sizes["freq_time"] == n // 4


def test_mitgcm_style_batched_analysis():
    """MITgcm-example analogue: batched (time, z) fields, 2-D linear-detrend
    + hann windowed spectra, cross spectra, and isotropic spectra — checked
    per-slice against independently computed single-field results
    (doc/MITgcm_example.ipynb cells 4-16)."""
    T, Z, N = 3, 2, 64
    rng = np.random.RandomState(7)
    w = rng.randn(T, Z, N, N)
    b = rng.randn(T, Z, N, N)
    coords = {"YC": np.arange(N) * 20e3, "XC": np.arange(N) * 20e3}
    wa = LabeledArray(w, dims=["time", "Zl", "YC", "XC"], coords=coords)
    ba = LabeledArray(b, dims=["time", "Zl", "YC", "XC"], coords=coords)

    what = xrft_tpu.fft(wa, dim=["XC", "YC"], detrend="linear", window="hann",
                        true_phase=False, true_amplitude=False)
    ps = xrft_tpu.power_spectrum(wa, dim=["XC", "YC"], detrend="linear",
                                 window="hann")
    cs = xrft_tpu.cross_spectrum(wa, ba, dim=["XC", "YC"], detrend="linear",
                                 window="hann", true_phase=False)
    iso = xrft_tpu.isotropic_power_spectrum(
        wa.isel(time=0, Zl=0), dim=["YC", "XC"], detrend="linear",
        window="hann",
    )
    assert what.dims == ("time", "Zl", "freq_YC", "freq_XC")
    assert iso.dims == ("freq_r",)

    # per-slice oracle for one (time, z)
    sub = LabeledArray(w[1, 1], dims=["YC", "XC"], coords=coords)
    ps_sub = xrft_tpu.power_spectrum(sub, dim=["XC", "YC"], detrend="linear",
                                     window="hann")
    got = ps.isel(time=1, Zl=1)
    npt.assert_allclose(got.values, ps_sub.values, rtol=1e-8, atol=1e-12)

    cs_sub = xrft_tpu.cross_spectrum(
        LabeledArray(w[0, 0], dims=["YC", "XC"], coords=coords),
        LabeledArray(b[0, 0], dims=["YC", "XC"], coords=coords),
        dim=["XC", "YC"], detrend="linear", window="hann", true_phase=False,
    )
    npt.assert_allclose(cs.isel(time=0, Zl=0).values, cs_sub.values,
                        rtol=1e-8, atol=1e-12)


def test_window_true_legacy():
    """window=True maps to 'hann' with a FutureWarning (MITgcm notebook uses
    window=True; reference shim at xrft.py:42-47)."""
    da = LabeledArray(np.random.rand(16), dims=["x"],
                      coords={"x": np.arange(16.0)})
    with pytest.warns(FutureWarning, match="boolean"):
        a = xrft_tpu.fft(da, window=True, true_phase=False,
                         true_amplitude=False)
    b = xrft_tpu.fft(da, window="hann", true_phase=False,
                     true_amplitude=False)
    npt.assert_allclose(a.values, b.values, rtol=1e-12)
