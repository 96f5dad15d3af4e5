"""df64 (emulated float64) arithmetic and transforms.

The strict ~1e-14 engine accuracy is a TPU contract (XLA:TPU / Mosaic
compile the error-free transformations faithfully; XLA:CPU lets LLVM
contract FMAs, collapsing them — see xrft_tpu/ops/df64.py).  Here we pin:

  * exactness of the primitives in strict-IEEE numpy simulation,
  * engine correctness at f32-or-better tolerance through the CPU paths,
  * fft64/ifft64 1e-12 parity (on CPU they use the native f64 path; the
    on-chip df64 path is pinned by scripts/chip_checks.py, measured
    2.1e-14 for n=256 and 1.3e-14 for n=1024).
"""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import xrft_tpu
from xrft_tpu import LabeledArray
from xrft_tpu.ops import df64
from xrft_tpu.ops.df64_fft import as_df64, df64_fft_nd, df64_to_numpy


def test_primitive_exactness_numpy_sim():
    """two_sum / two_prod are error-free in strict IEEE f32 (numpy)."""
    rng = np.random.RandomState(0)
    a = rng.randn(1000).astype(np.float32)
    b = rng.randn(1000).astype(np.float32)
    s, e = df64.two_sum(a, b)
    exact = a.astype(np.float64) + b.astype(np.float64)
    npt.assert_array_equal(np.float64(s) + np.float64(e), exact)
    p, e = df64.two_prod(a, b)
    exact = a.astype(np.float64) * b.astype(np.float64)
    npt.assert_array_equal(np.float64(p) + np.float64(e), exact)


def test_df64_dot_accuracy_numpy_sim():
    """Sequential df64 accumulation reaches ~1e-13 in strict IEEE."""
    rng = np.random.RandomState(1)
    K = 256
    x = rng.randn(K).astype(np.float32)
    w64 = np.cos(np.arange(K) * 0.37)
    wh, wl = df64.split_f64_np(w64)
    acc = (np.float32(0), np.float32(0))
    for j in range(K):
        p = df64.mul(x[j], np.float32(0), wh[j], wl[j])
        acc = df64.add(acc[0], acc[1], p[0], p[1])
    ref = np.dot(x.astype(np.float64), w64)
    got = df64.join_np(acc[0], acc[1])
    assert abs(got - ref) / abs(ref) < 1e-12


@pytest.mark.parametrize("n", [64, 256, 1024])
def test_df64_engine_cpu_tolerance(n):
    """Engine correctness through the CPU compile path (f32-grade there)."""
    rng = np.random.RandomState(n)
    x = rng.randn(4, n).astype(np.float32)
    got = df64_to_numpy(df64_fft_nd(x, [-1], "fft"))
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=5e-6)


def test_df64_engine_roundtrip_cpu():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 256).astype(np.float32)
    back = df64_to_numpy(df64_fft_nd(df64_fft_nd(x, [-1], "fft"), [-1],
                                     "ifft"))
    npt.assert_allclose(back.real, x, atol=1e-5)


def test_as_df64_exact_c128_split():
    rng = np.random.RandomState(3)
    z = rng.randn(8) + 1j * rng.randn(8)
    x4 = as_df64(z)
    # hi+lo reconstruction carries ~49-bit mantissa (2^-49 residual)
    npt.assert_allclose(df64_to_numpy(x4), z, rtol=1e-13, atol=1e-14)


def test_fft64_parseval_and_parity():
    """fft64: 1e-12 numpy parity and amplitude-true Parseval."""
    rng = np.random.RandomState(4)
    Nx = 120
    dx = 0.37
    x = dx * (np.arange(Nx) - 17)
    sig = rng.randn(Nx).astype(np.float32)
    da = LabeledArray(sig, dims=["x"], coords={"x": x})
    F = xrft_tpu.fft64(da, dim="x", true_phase=True, true_amplitude=True)
    assert F.values.dtype == np.complex128
    # parity vs an equivalently preprocessed numpy oracle
    lag = x[Nx // 2]
    f = np.fft.fftfreq(Nx, dx)
    ref = np.fft.fft(np.fft.ifftshift(sig.astype(np.float64))) \
        * np.exp(-2j * np.pi * f * lag) * dx
    ref = np.fft.fftshift(ref)
    npt.assert_allclose(F.values, ref, rtol=1e-12, atol=1e-12)
    # Parseval
    npt.assert_allclose(
        (np.abs(F.values) ** 2).sum() * F["freq_x"].attrs["spacing"],
        (np.abs(sig.astype(np.float64)) ** 2).sum() * dx,
        rtol=1e-12,
    )


def test_fft64_ifft64_roundtrip():
    rng = np.random.RandomState(5)
    Nx = 96
    x = np.arange(Nx) * 0.25 - 3.0
    sig = rng.randn(Nx).astype(np.float32)
    da = LabeledArray(sig, dims=["x"], coords={"x": x})
    F = xrft_tpu.fft64(da, dim="x")
    back = xrft_tpu.ifft64(F, lag=F["freq_x"].attrs["direct_lag"])
    npt.assert_allclose(back.values.real, sig, atol=1e-12)
    npt.assert_allclose(back["x"].values, x, atol=1e-10)


def test_fft64_2d_complex_input():
    rng = np.random.RandomState(6)
    z = rng.randn(24, 32) + 1j * rng.randn(24, 32)
    da = LabeledArray(z, dims=["y", "x"],
                      coords={"y": np.arange(24.0), "x": np.arange(32.0)})
    F = xrft_tpu.fft64(da, true_phase=False, true_amplitude=False,
                       shift=False)
    ref = np.fft.fftn(np.asarray(da.values, np.complex128))
    npt.assert_allclose(F.values, ref, rtol=1e-12, atol=1e-12)
