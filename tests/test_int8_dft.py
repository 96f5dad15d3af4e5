"""int8-limb (Ozaki-style) MXU DFT spike.

Exact decompositions are asserted here; end accuracy is a TPU contract
(the df64 combine degrades through XLA:CPU — see ops/df64.py), measured
6e-15 (n=256) / 8e-14 (n=1024) on-chip via scripts/chip_checks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from xrft_tpu.ops.df64_fft import df64_to_numpy
from xrft_tpu.ops.int8_dft import LW, _w_limbs_np, _x_limbs, int8_dft_last


def test_w_limb_reconstruction_exact():
    n = 64
    wl, wscale = _w_limbs_np(n, -1, "re")
    W = sum(l.astype(np.float64) * 2.0 ** (7 * (LW - 1 - q))
            for q, l in enumerate(wl)) * wscale
    ref = np.cos(-2 * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    npt.assert_allclose(W, ref, atol=1e-13)


def test_x_limb_reconstruction_exact():
    x = np.random.RandomState(0).randn(4, 64).astype(np.float32)
    limbs, scales, S = _x_limbs(jnp.asarray(x), None)
    u = sum(np.asarray(l, np.float64) * sc for l, sc in zip(limbs, scales))
    npt.assert_allclose(u * np.asarray(S, np.float64), x, atol=0.0)


def test_int8_dft_cpu_tolerance():
    # f32-grade through the CPU compile path; 1e-14-grade on TPU
    x = np.random.RandomState(1).randn(8, 256).astype(np.float32)
    got = df64_to_numpy(jax.jit(lambda a: int8_dft_last(a, -1))(x))
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=5e-6)


def test_int8_dft_size_guard():
    import pytest

    with pytest.raises(ValueError, match="2000"):
        int8_dft_last(np.zeros((2, 4096), np.float32))


def test_int8_fft_composed_cpu_tolerance():
    from xrft_tpu.ops.int8_dft import int8_fft_last

    x = np.random.RandomState(3).randn(4, 4096).astype(np.float32)
    got = df64_to_numpy(jax.jit(lambda a: int8_fft_last(a, -1))(x))
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=5e-6)


def test_int8_dft_complex_input_cpu_tolerance():
    from xrft_tpu.ops.df64_fft import as_df64
    from xrft_tpu.ops.int8_dft import int8_dft_last

    z = (np.random.RandomState(4).randn(4, 256)
         + 1j * np.random.RandomState(5).randn(4, 256))
    x4 = tuple(np.asarray(v) for v in as_df64(z))
    got = df64_to_numpy(jax.jit(lambda a: int8_dft_last(a, -1))(x4))
    ref = np.fft.fft(z, axis=-1)
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=5e-6)
