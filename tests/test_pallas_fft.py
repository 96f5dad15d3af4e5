"""Fused Pallas four-step FFT kernel: correctness in interpret mode (the
deployment Mosaic toolchain lacks 3-D vector layouts; see config.pallas_fft).
"""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from xrft_tpu.ops.carray import as_pair, to_numpy
from xrft_tpu.ops.pallas_fft import (
    _balanced_factors,
    can_use_pallas,
    pallas_fft_last,
)


@pytest.mark.parametrize("n,rows", [(4096, 16), (1024, 24), (384, 8),
                                    (65536, 8)])
def test_real_input_matches_numpy(n, rows):
    x = np.random.RandomState(n).randn(rows, n).astype(np.float32)
    got = to_numpy(pallas_fft_last(jnp.asarray(x), -1, interpret=True))
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=2e-6)


@pytest.mark.parametrize("sign", [-1, 1])
def test_complex_input_both_signs(sign):
    n, rows = 1024, 16
    rng = np.random.RandomState(1)
    z = (rng.randn(rows, n) + 1j * rng.randn(rows, n)).astype(np.complex64)
    got = to_numpy(pallas_fft_last(as_pair(z), sign, interpret=True))
    ref = np.fft.fft(z.astype(np.complex128), axis=-1) if sign == -1 \
        else np.fft.ifft(z.astype(np.complex128), axis=-1) * n
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=2e-6)


def test_balanced_factors():
    assert _balanced_factors(4096) == (64, 64)
    assert _balanced_factors(1024) == (32, 32)
    assert _balanced_factors(384) == (24, 16)
    assert _balanced_factors(65536) == (256, 256)
    assert _balanced_factors(2 * 65536) is None  # factor exceeds cap
    assert _balanced_factors(9973) is None  # prime


def test_gating():
    # f64 never uses the kernel; f32 depends on config mode
    assert not can_use_pallas(4096, 128, np.float64)
    from xrft_tpu.config import config

    old = config.pallas_fft
    try:
        config.pallas_fft = "always"
        assert can_use_pallas(4096, 128, np.float32)
        assert not can_use_pallas(4096, 3, np.float32)  # no row block
        config.pallas_fft = "never"
        assert not can_use_pallas(4096, 128, np.float32)
    finally:
        config.pallas_fft = old


@pytest.mark.parametrize("n,rows", [(1024, 12), (4096, 8)])
def test_rowtile_kernel_real(n, rows):
    from xrft_tpu.ops.pallas_fft import pallas_fft_rowtile
    x = np.random.RandomState(n).randn(rows, n).astype(np.float32)
    got = to_numpy(pallas_fft_rowtile(jnp.asarray(x), -1, interpret=True))
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=2e-6)


def test_rowtile_kernel_complex_inverse():
    from xrft_tpu.ops.pallas_fft import pallas_fft_rowtile
    rng = np.random.RandomState(2)
    z = (rng.randn(6, 1024) + 1j * rng.randn(6, 1024)).astype(np.complex64)
    got = to_numpy(pallas_fft_rowtile(as_pair(z), +1, interpret=True))
    ref = np.fft.ifft(z.astype(np.complex128), axis=-1) * 1024
    npt.assert_allclose(got / np.abs(ref).max(), ref / np.abs(ref).max(),
                        atol=2e-6)


def test_default_factors_are_balanced():
    """ADVICE r4: the kernel default must be the measured-best balanced
    pair ((64, 64) at n=4096, 34.8 vs 41.7 ms for (128, 32) in the
    round-4 on-chip sweep), not the full-K (128, n//128) split."""
    from xrft_tpu.ops.pallas_fft import _balanced_factors, _default_factors

    assert _default_factors(4096) == (64, 64)
    for n in (256, 1024, 4096, 8192):
        assert _default_factors(n) == _balanced_factors(n)
