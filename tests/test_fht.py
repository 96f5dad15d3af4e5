"""Fast Hankel transform (FFTLog) vs scipy.fft.fht/ifht/fhtoffset.

The reference has no Hankel transform (its radial machinery stops at
shell-binned isotropic spectra, /root/reference/xrft/xrft.py:948-1010);
scipy is the oracle, per the reference's oracle-parity test genre
(SURVEY.md section 4 genre 1).
"""

import jax
import numpy as np
import pytest
import scipy.fft as sfft

import xrft_tpu
from xrft_tpu.labeled import LabeledArray


def _loggrid(n, lo=-4.0, hi=2.0):
    r = np.logspace(lo, hi, n)
    return r, float(np.log(r[1] / r[0]))


@pytest.mark.parametrize("n", [64, 128, 63, 97])
@pytest.mark.parametrize("mu", [0.0, 0.5, 2.0, -0.5])
def test_fht_scipy_parity(n, mu):
    r, dln = _loggrid(n)
    a = r ** (mu + 1) * np.exp(-(r ** 2) / 2)
    da = LabeledArray(a, dims=["r"], coords={"r": r})
    got = xrft_tpu.fht(da, dln=dln, mu=mu, dim="r")
    want = sfft.fht(a, dln, mu=mu)
    np.testing.assert_allclose(np.asarray(got.values), want,
                               rtol=1e-9, atol=1e-12)
    assert got.dims == ("freq_r",)
    np.testing.assert_allclose(np.asarray(got.coords["freq_r"].values),
                               1.0 / r[::-1])


@pytest.mark.parametrize("n", [64, 63])
@pytest.mark.parametrize("bias", [0.5, -1.0])
def test_fht_bias_and_offset_parity(n, bias):
    r, dln = _loggrid(n)
    mu = 1.0
    offset = float(xrft_tpu.fhtoffset(dln, mu, initial=0.3, bias=bias))
    assert offset == pytest.approx(
        sfft.fhtoffset(dln, mu, initial=0.3, bias=bias))
    a = r ** 2 * np.exp(-r)
    da = LabeledArray(a, dims=["r"], coords={"r": r})
    got = np.asarray(xrft_tpu.fht(da, dln=dln, mu=mu, offset=offset,
                                  bias=bias, dim="r").values)
    want = sfft.fht(a, dln, mu=mu, offset=offset, bias=bias)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("n", [128, 97])
def test_ifht_scipy_parity_and_roundtrip(n):
    r, dln = _loggrid(n)
    mu = 0.0
    a = r * np.exp(-(r ** 2) / 2)
    da = LabeledArray(a, dims=["r"], coords={"r": r})
    A = xrft_tpu.fht(da, dln=dln, mu=mu, dim="r")
    back = xrft_tpu.ifht(A, dln=dln, mu=mu, dim="freq_r")
    assert back.dims == ("r",)
    np.testing.assert_allclose(np.asarray(back.values), a,
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(back.coords["r"].values), r,
                               rtol=1e-10)
    want = sfft.ifht(np.asarray(A.values), dln, mu=mu)
    np.testing.assert_allclose(np.asarray(back.values), want,
                               rtol=1e-9, atol=1e-12)


def test_analytic_self_transform():
    # Hamilton (2000) fftlogtest: ∫ r^{mu+1} e^{-r²/2} J_mu(kr) k dr =
    # k^{mu+1} e^{-k²/2} — the function is its own Hankel transform.
    mu = 0.0
    r = np.logspace(-7, 1, 128)
    dln = float(np.log(r[1] / r[0]))
    offset = float(xrft_tpu.fhtoffset(dln, mu=mu,
                                      initial=-6 * np.log(10)))
    k = np.exp(offset) / r[::-1]
    a = r ** (mu + 1) * np.exp(-(r ** 2) / 2)
    da = LabeledArray(a, dims=["r"], coords={"r": r})
    out = xrft_tpu.fht(da, mu=mu, offset=offset, dim="r")  # dln from coord
    want = k ** (mu + 1) * np.exp(-(k ** 2) / 2)
    got = np.asarray(out.values)
    # scipy's own example shows relative error growing to ~1e-3 in the
    # tails; assert the analytic match on the well-resolved bins and
    # bit-level parity with scipy everywhere
    sel = want > 1e-4 * want.max()
    np.testing.assert_allclose(got[sel], want[sel], rtol=1e-3)
    np.testing.assert_allclose(got, sfft.fht(a, dln, mu=mu,
                                             offset=offset),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.coords["freq_r"].values), k)


def test_dln_from_coordinate_and_batched():
    rng = np.random.RandomState(0)
    r, dln = _loggrid(96)
    a = rng.randn(4, 96) * np.exp(-((np.log(r) / 3) ** 2))
    da = LabeledArray(a, dims=["z", "r"],
                      coords={"r": r, "z": np.arange(4)})
    got = np.asarray(xrft_tpu.fht(da, mu=1.0, dim="r").values)
    want = sfft.fht(a, dln, mu=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_singular_warnings():
    # mu=-1, bias=-2 makes u_0 = Gamma(-1)/Gamma(1) infinite (singular
    # forward); mu=-1, bias=+2 makes it zero (singular inverse) — the
    # combos scipy warns on.
    r, dln = _loggrid(32)
    da = LabeledArray(np.exp(-r), dims=["r"], coords={"r": r})
    with pytest.warns(UserWarning, match="singular transform"):
        got = np.asarray(xrft_tpu.fht(da, dln=dln, mu=-1.0, bias=-2.0,
                                      dim="r").values)
    with pytest.warns(UserWarning, match="singular transform"):
        want = sfft.fht(np.exp(-r), dln, mu=-1.0, bias=-2.0)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    with pytest.warns(UserWarning, match="singular inverse"):
        goti = np.asarray(xrft_tpu.ifht(da, dln=dln, mu=-1.0, bias=2.0,
                                        dim="r").values)
    with pytest.warns(UserWarning, match="singular inverse"):
        wanti = sfft.ifht(np.exp(-r), dln, mu=-1.0, bias=2.0)
    np.testing.assert_allclose(goti, wanti, rtol=1e-9, atol=1e-9,
                               equal_nan=True)


def test_jit_traceable():
    r, dln = _loggrid(64)
    a = r * np.exp(-r)
    da = LabeledArray(a, dims=["r"], coords={"r": r})

    @jax.jit
    def f(d):
        return xrft_tpu.fht(d, dln=dln, mu=0.5, dim="r")

    np.testing.assert_allclose(np.asarray(f(da).values),
                               sfft.fht(a, dln, mu=0.5),
                               rtol=1e-9, atol=1e-12)


def test_error_contracts():
    r, dln = _loggrid(32)
    da_nocoord = LabeledArray(np.exp(-r), dims=["r"])
    with pytest.raises(ValueError, match="no coordinate"):
        xrft_tpu.fht(da_nocoord, mu=0.0, dim="r")
    lin = LabeledArray(np.exp(-r), dims=["r"],
                       coords={"r": np.linspace(1.0, 2.0, 32)})
    with pytest.raises(ValueError, match="not uniformly logarithmically"):
        xrft_tpu.fht(lin, mu=0.0, dim="r")
    neg = LabeledArray(np.exp(-r), dims=["r"],
                       coords={"r": np.arange(32.0) - 5})
    with pytest.raises(ValueError, match="positive 1-D grid"):
        xrft_tpu.fht(neg, mu=0.0, dim="r")
    cplx = LabeledArray(np.exp(-r) + 1j * r, dims=["r"],
                        coords={"r": r})
    with pytest.raises(ValueError, match="must be real"):
        xrft_tpu.fht(cplx, dln=dln, mu=0.0, dim="r")


def test_explicit_dln_overrides_and_no_coord_grid():
    # with dln= given and no coordinate, the transform still runs and
    # the output simply has no conjugate-grid coordinate
    r, dln = _loggrid(64)
    da = LabeledArray(np.exp(-r), dims=["r"])
    out = xrft_tpu.fht(da, dln=dln, mu=0.0, dim="r")
    assert "freq_r" not in out.coords
    np.testing.assert_allclose(np.asarray(out.values),
                               sfft.fht(np.exp(-r), dln, mu=0.0),
                               rtol=1e-9, atol=1e-12)
