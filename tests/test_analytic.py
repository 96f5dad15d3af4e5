"""Analytic-signal (Hilbert) tests: scipy.signal.hilbert parity across
complex modes/engines, envelope recovery, error contracts.  Beyond the
reference (no counterpart in /root/reference)."""

import jax
import numpy as np
import numpy.testing as npt
import pytest
import scipy.signal as sps

import xrft_tpu
from xrft_tpu import LabeledArray
from xrft_tpu.config import complex_mode, fft_engine

MODES = ["native", "split"]


def make_1d(n, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    x = rng.randn(n).astype(dtype)
    return x, LabeledArray(x, dims=["t"], coords={"t": np.arange(n) * 0.1},
                           name="u")


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("n", [128, 127])
def test_hilbert_scipy_parity(mode, n):
    """hilbert == scipy.signal.hilbert for even and odd lengths."""
    x, da = make_1d(n)
    with complex_mode(mode):
        got = np.asarray(xrft_tpu.hilbert(da).values)
    ref = sps.hilbert(x)
    assert got.dtype.kind == "c"
    npt.assert_allclose(got, ref, atol=1e-10 * np.abs(ref).max())


@pytest.mark.parametrize("engine", ["xla", "matmul"])
def test_hilbert_engine_parity(engine):
    """Both execution engines produce the scipy analytic signal."""
    x, da = make_1d(96, seed=3)
    with fft_engine(engine):
        got = np.asarray(xrft_tpu.hilbert(da).values)
    npt.assert_allclose(got, sps.hilbert(x), atol=1e-9)


def test_hilbert_preserves_coords_and_names():
    x, da = make_1d(64, seed=5)
    out = xrft_tpu.hilbert(da)
    assert out.dims == da.dims
    npt.assert_allclose(out["t"].values, da["t"].values)
    assert out.name == "u_analytic"
    assert xrft_tpu.envelope(da).name == "u_envelope"


def test_hilbert_batch_dim_axis_selection():
    """Batch dims ride along; dim= picks the transform axis."""
    rng = np.random.RandomState(7)
    x = rng.randn(3, 80)
    da = LabeledArray(x, dims=["z", "t"],
                      coords={"z": range(3), "t": np.arange(80.0)})
    got = np.asarray(xrft_tpu.hilbert(da, dim="t").values)
    npt.assert_allclose(got, sps.hilbert(x, axis=-1), atol=1e-10)
    gz = np.asarray(xrft_tpu.hilbert(da, dim="z").values)
    npt.assert_allclose(gz, sps.hilbert(x, axis=0), atol=1e-10)


def test_envelope_recovers_am_modulation():
    """The envelope of a modulated carrier is the modulation."""
    t = np.arange(2048) / 2048.0
    am = 1.0 + 0.5 * np.sin(2 * np.pi * 3 * t)
    x = am * np.cos(2 * np.pi * 200 * t)
    da = LabeledArray(x, dims=["t"], coords={"t": t})
    env = np.asarray(xrft_tpu.envelope(da).values)
    # edges ring (finite carrier), interior tracks the modulation
    npt.assert_allclose(env[100:-100], am[100:-100], rtol=2e-3)


def test_hilbert_integer_input_and_complex_error():
    n = 32
    rng = np.random.RandomState(11)
    di = LabeledArray((5 * rng.randn(n)).astype(np.int32), dims=["t"],
                      coords={"t": np.arange(n)})
    got = np.asarray(xrft_tpu.hilbert(di).values)
    ref = sps.hilbert(np.asarray(di.values, np.float64))
    npt.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())

    dz = LabeledArray(rng.randn(n) + 1j * rng.randn(n), dims=["t"],
                      coords={"t": np.arange(n)})
    with pytest.raises(ValueError, match="must be real"):
        xrft_tpu.hilbert(dz)


def test_hilbert_is_jit_traceable():
    """The whole analytic-signal pipeline stages into one jit program."""
    x, da = make_1d(64, seed=13)

    @jax.jit
    def f(la):
        return xrft_tpu.envelope(la).data

    got = np.asarray(f(da))
    npt.assert_allclose(got, np.abs(sps.hilbert(x)), atol=1e-10)


# ---------------------------------------------------------------------------
# hilbert2 (scipy.signal namesake)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("shape", [(12, 9), (8, 8), (7, 11)])
def test_hilbert2_scipy_parity(mode, shape):
    """hilbert2 == scipy.signal.hilbert2 for every even/odd shape cell —
    including the even-N Nyquist bin, which the 2-D single-orthant mask
    ZEROES (unlike the 1-D hilbert mask)."""
    rng = np.random.RandomState(2)
    x = rng.randn(*shape)
    da = LabeledArray(x, dims=["y", "x"])
    with complex_mode(mode):
        got = np.asarray(xrft_tpu.hilbert2(da).values)
    ref = sps.hilbert2(x)
    npt.assert_allclose(got, ref, atol=1e-10 * np.abs(ref).max())


def test_hilbert2_batch_and_named_dims():
    """Named dims select the transform plane; extra dims are batch."""
    rng = np.random.RandomState(4)
    x = rng.randn(3, 10, 6)
    da = LabeledArray(x, dims=["t", "y", "x"])
    got = np.asarray(xrft_tpu.hilbert2(da, dim=["y", "x"]).values)
    ref = sps.hilbert2(x)  # scipy default axes=(-2, -1)
    npt.assert_allclose(got, ref, atol=1e-10 * np.abs(ref).max())


def test_hilbert2_error_contracts():
    rng = np.random.RandomState(5)
    da1 = LabeledArray(rng.randn(16), dims=["t"])
    with pytest.raises(ValueError, match="at least 2 dims"):
        xrft_tpu.hilbert2(da1)
    da2 = LabeledArray(rng.randn(4, 4), dims=["y", "x"])
    with pytest.raises(ValueError, match="exactly 2"):
        xrft_tpu.hilbert2(da2, dim="y")
    with pytest.raises(ValueError, match="not found"):
        xrft_tpu.hilbert2(da2, dim=["y", "q"])
    dz = LabeledArray(rng.randn(4, 4) + 1j, dims=["y", "x"])
    with pytest.raises(ValueError, match="must be real"):
        xrft_tpu.hilbert2(dz)


def test_hilbert2_is_jit_traceable():
    rng = np.random.RandomState(6)
    x = rng.randn(8, 12)
    da = LabeledArray(x, dims=["y", "x"])

    @jax.jit
    def f(la):
        return xrft_tpu.hilbert2(la).data

    got = np.asarray(f(da))
    npt.assert_allclose(got, sps.hilbert2(x), atol=1e-10)
