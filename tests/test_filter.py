"""FIR design / polyphase resampling tests: scipy.signal parity for
firwin/upfirdn/resample_poly/decimate, coordinate rebuild, jit staging,
and error contracts.  Beyond the reference (no filtering in
/root/reference; surface stops at /root/reference/xrft/xrft.py:17-29)."""

import jax
import numpy as np
import numpy.testing as npt
import pytest
import scipy.signal as sps

import xrft_tpu
from xrft_tpu import LabeledArray


def make_1d(n=50, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n)
    return x, LabeledArray(x, dims=["t"],
                           coords={"t": 2.0 + np.arange(n) * 0.25},
                           name="u")


# ---------------------------------------------------------------------------
# firwin
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kwargs", [
    dict(numtaps=31, cutoff=0.3),
    dict(numtaps=64, cutoff=0.2, pass_zero="lowpass"),
    dict(numtaps=33, cutoff=0.4, pass_zero="highpass"),
    dict(numtaps=41, cutoff=[0.2, 0.5], pass_zero="bandpass"),
    dict(numtaps=41, cutoff=[0.2, 0.5], pass_zero="bandstop"),
    dict(numtaps=42, cutoff=[0.1, 0.3, 0.5, 0.8], pass_zero=False),
    dict(numtaps=55, cutoff=0.25, width=0.08),  # kaiser-by-width
    dict(numtaps=21, cutoff=300, fs=2000, window="blackman"),
    dict(numtaps=21, cutoff=0.3, scale=False),
])
def test_firwin_scipy_parity(kwargs):
    """Every band configuration matches scipy.signal.firwin bit-tightly."""
    npt.assert_allclose(xrft_tpu.firwin(**kwargs), sps.firwin(**kwargs),
                        atol=1e-15)


def test_firwin_error_contracts():
    with pytest.raises(ValueError, match="Invalid cutoff frequency"):
        xrft_tpu.firwin(11, 1.5)
    with pytest.raises(ValueError, match="strictly increasing"):
        xrft_tpu.firwin(11, [0.5, 0.2])
    with pytest.raises(ValueError, match="even number of coefficients"):
        xrft_tpu.firwin(10, 0.5, pass_zero=False)  # passes Nyquist
    with pytest.raises(ValueError, match="one element"):
        xrft_tpu.firwin(11, [0.2, 0.4], pass_zero="lowpass")
    with pytest.raises(ValueError, match="at least two"):
        xrft_tpu.firwin(11, 0.2, pass_zero="bandpass")
    with pytest.raises(ValueError, match="not in"):
        xrft_tpu.firwin(11, 0.2, pass_zero="nope")


# ---------------------------------------------------------------------------
# upfirdn
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("up,down,taps", [
    (1, 1, 7), (3, 1, 11), (1, 4, 9), (3, 5, 21), (7, 3, 16), (2, 2, 5),
])
def test_upfirdn_scipy_parity(up, down, taps):
    """Shape and values match scipy.signal.upfirdn for every up/down/taps
    cell, including up == down != 1 (not reduced: scipy doesn't)."""
    x, da = make_1d()
    rng = np.random.RandomState(taps)
    h = rng.randn(taps)
    got = np.asarray(xrft_tpu.upfirdn(h, da, up, down).values)
    want = sps.upfirdn(h, x, up, down)
    assert got.shape == want.shape
    npt.assert_allclose(got, want, atol=1e-12)


def test_upfirdn_complex_and_batch():
    """Complex input and batch dims ride along (scipy applies along one
    axis)."""
    rng = np.random.RandomState(3)
    x = rng.randn(4, 30) + 1j * rng.randn(4, 30)
    da = LabeledArray(x, dims=["b", "t"])
    h = rng.randn(9)
    got = np.asarray(xrft_tpu.upfirdn(h, da, 2, 3, dim="t").values)
    want = sps.upfirdn(h, x, 2, 3, axis=1)
    npt.assert_allclose(got, want, atol=1e-12)


def test_upfirdn_error_contracts():
    x, da = make_1d()
    with pytest.raises(NotImplementedError, match="pre-pad"):
        xrft_tpu.upfirdn(np.ones(3), da, mode="wrap")
    with pytest.raises(ValueError, match="must be >= 1"):
        xrft_tpu.upfirdn(np.ones(3), da, up=0)
    with pytest.raises(ValueError, match="1-D"):
        xrft_tpu.upfirdn(np.ones((3, 3)), da)


# ---------------------------------------------------------------------------
# resample_poly
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("up,down", [(2, 3), (3, 2), (5, 1), (1, 5), (7, 6)])
@pytest.mark.parametrize("padtype", ["constant", "mean", "maximum"])
def test_resample_poly_scipy_parity(up, down, padtype):
    x, da = make_1d()
    got = np.asarray(xrft_tpu.resample_poly(da, up, down,
                                            padtype=padtype).values)
    want = sps.resample_poly(x, up, down, padtype=padtype)
    assert got.shape == want.shape
    npt.assert_allclose(got, want, atol=1e-12)


def test_resample_poly_explicit_window_taps():
    """An explicit taps array is used as-is (scipy's window-as-array)."""
    x, da = make_1d(seed=5)
    h = sps.firwin(33, 0.4)
    got = np.asarray(xrft_tpu.resample_poly(da, 2, 1, window=h).values)
    want = sps.resample_poly(x, 2, 1, window=h)
    npt.assert_allclose(got, want, atol=1e-12)


def test_resample_poly_coordinate_rebuild():
    """The dim coordinate is rebuilt as x0 + arange(n_out)*dx*down/up."""
    x, da = make_1d()
    out = xrft_tpu.resample_poly(da, 3, 2)
    n_out = out.sizes["t"]
    npt.assert_allclose(np.asarray(out.coords["t"].values),
                        2.0 + np.arange(n_out) * (0.25 * 2 / 3), atol=1e-12)
    # identity ratio returns a copy with the coordinate untouched
    same = xrft_tpu.resample_poly(da, 4, 4)
    npt.assert_array_equal(np.asarray(same.coords["t"].values),
                           np.asarray(da.coords["t"].values))


def test_resample_poly_sine_preserved():
    """A band-limited tone survives a 2/3 resample (amplitude within 1%
    away from the edges) — the textbook polyphase invariant."""
    n = 600
    t = np.arange(n) / 100.0
    x = np.sin(2 * np.pi * 3.0 * t)
    da = LabeledArray(x, dims=["t"], coords={"t": t})
    out = xrft_tpu.resample_poly(da, 2, 3)
    t2 = np.asarray(out.coords["t"].values)
    want = np.sin(2 * np.pi * 3.0 * t2)
    core = slice(20, -20)
    npt.assert_allclose(np.asarray(out.values)[core], want[core], atol=1e-2)


def test_resample_poly_is_jit_traceable():
    x, da = make_1d()

    @jax.jit
    def f(la):
        return xrft_tpu.resample_poly(la, 2, 3).data

    npt.assert_allclose(np.asarray(f(da)), sps.resample_poly(x, 2, 3),
                        atol=1e-12)


def test_resample_poly_error_contracts():
    x, da = make_1d()
    with pytest.raises(ValueError, match="no effect"):
        xrft_tpu.resample_poly(da, 2, 3, padtype="mean", cval=1.0)
    with pytest.raises(NotImplementedError, match="pre-pad"):
        xrft_tpu.resample_poly(da, 2, 3, padtype="edge")
    with pytest.raises(ValueError, match=">= 1"):
        xrft_tpu.resample_poly(da, 0, 3)


# ---------------------------------------------------------------------------
# decimate
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("q", [2, 3, 5])
@pytest.mark.parametrize("zero_phase", [True, False])
def test_decimate_scipy_parity(q, zero_phase):
    """decimate == scipy.signal.decimate(..., ftype='fir') for both phase
    conventions."""
    x, da = make_1d()
    got = np.asarray(xrft_tpu.decimate(da, q, zero_phase=zero_phase).values)
    want = sps.decimate(x, q, ftype="fir", zero_phase=zero_phase)
    assert got.shape == want.shape
    npt.assert_allclose(got, want, atol=1e-12)


def test_decimate_custom_order_and_coords():
    x, da = make_1d()
    got = xrft_tpu.decimate(da, 2, n=24)
    want = sps.decimate(x, 2, n=24, ftype="fir")
    npt.assert_allclose(np.asarray(got.values), want, atol=1e-12)
    npt.assert_allclose(np.asarray(got.coords["t"].values),
                        2.0 + np.arange(got.sizes["t"]) * 0.5, atol=1e-12)


def test_decimate_iir_prescriptive_error():
    x, da = make_1d()
    with pytest.raises(NotImplementedError, match="ftype='fir'"):
        xrft_tpu.decimate(da, 2, ftype="iir")
    with pytest.raises(ValueError, match="must be 'fir'"):
        xrft_tpu.decimate(da, 2, ftype="cic")


# ---------------------------------------------------------------------------
# savgol_coeffs / savgol_filter
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kwargs", [
    dict(window_length=5, polyorder=2),
    dict(window_length=7, polyorder=3, deriv=1, delta=0.5),
    dict(window_length=8, polyorder=3),               # even window
    dict(window_length=9, polyorder=4, deriv=2),
    dict(window_length=11, polyorder=2, pos=3),
    dict(window_length=7, polyorder=2, use="dot"),
    dict(window_length=5, polyorder=2, deriv=3),      # deriv > polyorder
])
def test_savgol_coeffs_scipy_parity(kwargs):
    npt.assert_allclose(xrft_tpu.savgol_coeffs(**kwargs),
                        sps.savgol_coeffs(**kwargs), atol=1e-12)


@pytest.mark.parametrize("mode", ["interp", "mirror", "nearest",
                                  "constant", "wrap"])
@pytest.mark.parametrize("window_length,polyorder,deriv", [
    (5, 2, 0), (7, 3, 1), (8, 3, 0), (11, 4, 2),
])
def test_savgol_filter_scipy_parity(mode, window_length, polyorder, deriv):
    """Values match scipy.signal.savgol_filter for every mode, including
    the 'interp' edge polynomials and even window lengths."""
    x, da = make_1d(n=60, seed=7)
    got = np.asarray(xrft_tpu.savgol_filter(
        da, window_length, polyorder, deriv=deriv, delta=0.7, mode=mode,
        cval=1.5).values)
    want = sps.savgol_filter(x, window_length, polyorder, deriv=deriv,
                             delta=0.7, mode=mode, cval=1.5)
    assert got.shape == want.shape
    npt.assert_allclose(got, want, atol=1e-10)


def test_savgol_filter_batch_middle_dim():
    """Filtering a middle dim matches scipy's axis= and leaves coords
    untouched (index-based smoothing; delta carries the spacing)."""
    rng = np.random.RandomState(11)
    x = rng.randn(4, 33, 3)
    da = LabeledArray(x, dims=["b", "y", "c"],
                      coords={"y": 1.0 + 0.5 * np.arange(33)})
    out = xrft_tpu.savgol_filter(da, 9, 3, deriv=1, delta=0.5, dim="y")
    want = sps.savgol_filter(x, 9, 3, deriv=1, delta=0.5, axis=1)
    npt.assert_allclose(np.asarray(out.values), want, atol=1e-10)
    npt.assert_array_equal(np.asarray(out.coords["y"].values),
                           np.asarray(da.coords["y"].values))


def test_savgol_filter_recovers_polynomial():
    """A degree-<=polyorder signal passes through exactly (all modes'
    interiors; 'interp' also at the edges) — the defining property."""
    t = np.linspace(0, 1, 41)
    x = 3.0 - 2.0 * t + 0.5 * t ** 2
    da = LabeledArray(x, dims=["t"], coords={"t": t})
    out = np.asarray(xrft_tpu.savgol_filter(da, 9, 2, mode="interp").values)
    npt.assert_allclose(out, x, atol=1e-10)
    # first derivative of the quadratic, scaled by the sample spacing
    d1 = np.asarray(xrft_tpu.savgol_filter(
        da, 9, 2, deriv=1, delta=t[1] - t[0], mode="interp").values)
    npt.assert_allclose(d1, -2.0 + 1.0 * t, atol=1e-9)


def test_savgol_filter_is_jit_traceable():
    x, da = make_1d(n=40)

    @jax.jit
    def f(la):
        return xrft_tpu.savgol_filter(la, 7, 3, mode="interp").data

    npt.assert_allclose(np.asarray(f(da)),
                        sps.savgol_filter(x, 7, 3, mode="interp"),
                        atol=1e-10)


def test_savgol_error_contracts():
    x, da = make_1d(n=10)
    with pytest.raises(ValueError, match="polyorder must be less"):
        xrft_tpu.savgol_filter(da, 5, 7)
    with pytest.raises(ValueError, match="window_length must be less"):
        xrft_tpu.savgol_filter(da, 15, 2, mode="interp")
    with pytest.raises(ValueError, match="mode must be"):
        xrft_tpu.savgol_filter(da, 5, 2, mode="bogus")
    with pytest.raises(ValueError, match="pos must be nonnegative"):
        xrft_tpu.savgol_coeffs(5, 2, pos=9)
    with pytest.raises(ValueError, match="'conv' or 'dot'"):
        xrft_tpu.savgol_coeffs(5, 2, use="x")
