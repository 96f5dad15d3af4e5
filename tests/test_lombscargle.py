"""Generalized Lomb-Scargle periodogram vs scipy.signal.lombscargle.

The reference has no unevenly-sampled estimator (its spacing validation
raises for uneven grids, /root/reference/xrft/xrft.py:291-304); scipy is
the oracle for every cell here, following the reference's oracle-parity
test genre (SURVEY.md section 4 genre 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

import xrft_tpu
from xrft_tpu.labeled import LabeledArray


def _uneven(n, rng, span=30.0):
    t = np.sort(rng.uniform(0.0, span, n))
    t[0] = 0.0
    return t


@pytest.mark.parametrize("normalize", [False, True, "power", "normalize",
                                       "amplitude"])
@pytest.mark.parametrize("floating_mean", [False, True])
def test_scipy_parity_modes(normalize, floating_mean):
    rng = np.random.RandomState(0)
    t = _uneven(111, rng)
    y = (2.0 * np.cos(1.3 * t + 0.4) + 0.7 + 0.3 * rng.randn(111))
    freqs = np.linspace(0.2, 6.0, 257)
    da = LabeledArray(y, dims=["t"], coords={"t": t})
    got = xrft_tpu.lombscargle(da, freqs, dim="t", normalize=normalize,
                               floating_mean=floating_mean)
    want = sps.lombscargle(t, y, freqs, normalize=normalize,
                           floating_mean=floating_mean)
    np.testing.assert_allclose(np.asarray(got.values), want,
                               rtol=1e-9, atol=1e-12)
    assert got.dims == ("freq_t",)
    np.testing.assert_allclose(
        np.asarray(got.coords["freq_t"].values), freqs)


@pytest.mark.parametrize("floating_mean", [False, True])
def test_scipy_parity_weighted(floating_mean):
    rng = np.random.RandomState(1)
    t = _uneven(90, rng)
    y = np.sin(2.1 * t) + 0.2 * rng.randn(90)
    wts = rng.uniform(0.1, 2.0, 90)
    wts[5] = 0.0  # zero weights are legal
    freqs = np.linspace(0.3, 5.0, 128)
    da = LabeledArray(y, dims=["t"], coords={"t": t})
    for normalize in (False, True, "amplitude"):
        got = xrft_tpu.lombscargle(da, freqs, normalize=normalize,
                                   weights=wts,
                                   floating_mean=floating_mean)
        want = sps.lombscargle(t, y, freqs, normalize=normalize,
                               weights=wts, floating_mean=floating_mean)
        np.testing.assert_allclose(np.asarray(got.values), want,
                                   rtol=1e-9, atol=1e-12)


def test_batched_matches_per_row_scipy():
    rng = np.random.RandomState(2)
    t = _uneven(64, rng)
    y = rng.randn(5, 64)
    freqs = np.linspace(0.5, 4.0, 97)
    da = LabeledArray(y, dims=["batch", "t"],
                      coords={"t": t, "batch": np.arange(5)})
    got = np.asarray(xrft_tpu.lombscargle(da, freqs, dim="t",
                                          floating_mean=True).values)
    want = np.stack([sps.lombscargle(t, row, freqs, floating_mean=True)
                     for row in y])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_transform_dim_not_last():
    rng = np.random.RandomState(3)
    t = _uneven(48, rng)
    y = rng.randn(48, 3)
    freqs = np.linspace(0.5, 4.0, 33)
    da = LabeledArray(y, dims=["t", "z"], coords={"t": t})
    got = xrft_tpu.lombscargle(da, freqs, dim="t")
    assert got.dims == ("freq_t", "z")
    want = np.stack([sps.lombscargle(t, y[:, j], freqs)
                     for j in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(got.values), want,
                               rtol=1e-9, atol=1e-12)


def test_peak_and_amplitude_recovery():
    # A clean sinusoid on an uneven grid: the periodogram peaks at w0 and
    # the 'amplitude' mode recovers A and the phase.
    rng = np.random.RandomState(4)
    t = _uneven(400, rng, span=60.0)
    A, w0, phi, c = 1.7, 2.4, 0.6, 3.0
    y = A * np.cos(w0 * t + phi) + c
    freqs = np.linspace(0.5, 5.0, 2048)
    da = LabeledArray(y, dims=["t"], coords={"t": t})
    p = np.asarray(xrft_tpu.lombscargle(da, freqs,
                                        floating_mean=True).values)
    assert abs(freqs[np.argmax(p)] - w0) < 0.01
    amp = np.asarray(xrft_tpu.lombscargle(
        da, np.array([w0]), normalize="amplitude",
        floating_mean=True).values)[0]
    assert abs(abs(amp) - A) < 1e-3
    # y = A*cos(w t + phi) = Re{A e^{i phi} e^{i w t}} -> a + ib with
    # a = A cos(phi), b = -A sin(phi)
    assert abs(amp.real - A * np.cos(phi)) < 1e-3
    assert abs(amp.imag + A * np.sin(phi)) < 1e-3


def test_even_grid_matches_periodogram_shape():
    # On an even grid the unnormalized LS of a pure tone equals the
    # classic periodogram's N/4-scaled peak.
    n = 256
    t = np.arange(n) / 16.0
    y = np.cos(2 * np.pi * 1.5 * t)
    w = np.array([2 * np.pi * 1.5])
    da = LabeledArray(y, dims=["t"], coords={"t": t})
    got = float(np.asarray(xrft_tpu.lombscargle(da, w).values)[0])
    assert abs(got - n / 4.0) / (n / 4.0) < 1e-6


def test_datetime_coordinate():
    rng = np.random.RandomState(5)
    tsec = np.sort(rng.uniform(0, 3600.0, 80))
    tsec[0] = 0.0
    tns = (np.datetime64("2001-01-01") +
           (tsec * 1e9).astype("timedelta64[ns]"))
    y = np.sin(0.01 * tsec) + 0.1 * rng.randn(80)
    freqs = np.linspace(0.002, 0.05, 64)
    da_dt = LabeledArray(y, dims=["t"], coords={"t": tns})
    da_num = LabeledArray(y, dims=["t"], coords={"t": tsec})
    got = np.asarray(xrft_tpu.lombscargle(da_dt, freqs).values)
    want = np.asarray(xrft_tpu.lombscargle(da_num, freqs).values)
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_jit_traceable():
    rng = np.random.RandomState(6)
    t = _uneven(50, rng)
    freqs = np.linspace(0.5, 3.0, 40)
    da = LabeledArray(rng.randn(50), dims=["t"], coords={"t": t})

    @jax.jit
    def f(d):
        return xrft_tpu.lombscargle(d, freqs, normalize=True,
                                    floating_mean=True)

    got = np.asarray(f(da).values)
    want = sps.lombscargle(np.asarray(t), np.asarray(da.values), freqs,
                           normalize=True, floating_mean=True)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_float32_input_stays_float32():
    rng = np.random.RandomState(7)
    t = _uneven(64, rng)
    da = LabeledArray(rng.randn(64).astype(np.float32), dims=["t"],
                      coords={"t": t})
    out = xrft_tpu.lombscargle(da, np.linspace(0.5, 3.0, 16))
    assert np.asarray(out.values).dtype == np.float32


def test_error_contracts():
    rng = np.random.RandomState(8)
    t = _uneven(32, rng)
    da = LabeledArray(rng.randn(32), dims=["t"], coords={"t": t})
    freqs = np.linspace(0.5, 3.0, 8)
    with pytest.raises(ValueError, match="no coordinate"):
        xrft_tpu.lombscargle(
            LabeledArray(rng.randn(32), dims=["t"]), freqs)
    with pytest.raises(ValueError, match="must be real"):
        xrft_tpu.lombscargle(
            LabeledArray(rng.randn(32) + 1j * rng.randn(32),
                         dims=["t"], coords={"t": t}), freqs)
    with pytest.raises(ValueError, match="freqs must be a 1-D"):
        xrft_tpu.lombscargle(da, np.zeros((2, 2)))
    with pytest.raises(ValueError, match="non-negative entries"):
        xrft_tpu.lombscargle(da, freqs, weights=-np.ones(32))
    with pytest.raises(ValueError, match="equal non-zero length"):
        xrft_tpu.lombscargle(da, freqs, weights=np.ones(5))
    with pytest.raises(ValueError, match="Normalize must be"):
        xrft_tpu.lombscargle(da, freqs, normalize="bogus")
    with pytest.raises(ValueError, match="must be numeric or datetime"):
        xrft_tpu.lombscargle(
            LabeledArray(rng.randn(3), dims=["t"],
                         coords={"t": np.array(["a", "b", "c"])}),
            freqs)


def test_attrs_and_other_coords_pass_through():
    rng = np.random.RandomState(9)
    t = _uneven(40, rng)
    da = LabeledArray(rng.randn(2, 40), dims=["z", "t"],
                      coords={"t": t, "z": np.array([1.5, 2.5])},
                      attrs={"units": "K"}, name="temp")
    out = xrft_tpu.lombscargle(da, np.linspace(0.5, 2.0, 8), dim="t")
    assert out.attrs == {"units": "K"}
    assert out.name == "temp"
    np.testing.assert_allclose(np.asarray(out.coords["z"].values),
                               [1.5, 2.5])
