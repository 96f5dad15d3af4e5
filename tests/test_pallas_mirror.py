"""Pallas Hermitian-mirror kernel (ops/pallas_mirror.py).

The kernel is an opt-in (config.psd_mirror_impl) — measured a net loss
in-pipeline on the v5e (see the module docstring) — but must stay
bit-exact against the numpy oracle and the default HLO mirror.  Runs in
interpret mode on CPU.
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

import xrft_tpu
from xrft_tpu import LabeledArray
from xrft_tpu.config import config
from xrft_tpu.ops import pallas_mirror as pm


@pytest.mark.parametrize("B,NY,NX,MP,shift", [
    (2, 512, 512, 260, True),
    (2, 512, 512, 260, False),
    (1, 256, 1024, 516, True),
    (3, 512, 512, 257, True),
])
def test_mirror_kernel_exact(B, NY, NX, MP, shift):
    rng = np.random.RandomState(B + NY + NX)
    half = rng.rand(B, NY, MP).astype(np.float32)
    ref = pm.mirror_reference(half, NX, shift)
    got = np.asarray(pm.mirror_two_sided(jnp.asarray(half), NX, shift,
                                         interpret=True))
    npt.assert_array_equal(got, ref)


def test_mirror_applicable_gates():
    assert pm.mirror_applicable((512, 257), 512, np.float32)
    assert not pm.mirror_applicable((500, 257), 512, np.float32)  # NY % 256
    assert not pm.mirror_applicable((512, 255), 512, np.float32)  # MP short
    assert not pm.mirror_applicable((512, 200), 300, np.float32)  # NX % 512
    assert not pm.mirror_applicable((512, 257), 512, np.complex64)


def test_psd_via_mirror_kernel_bit_equal():
    """power_spectrum through the opt-in kernel is bit-identical to the
    default HLO mirror, for every fused-path kwarg combination."""
    rng = np.random.RandomState(0)
    B, NY, NX = 2, 512, 512
    da = LabeledArray(rng.randn(B, NY, NX).astype(np.float32),
                      dims=("t", "y", "x"),
                      coords={"y": np.arange(NY) * 0.5,
                              "x": np.arange(NX) * 0.25})
    for kw in [dict(window="hann", detrend="linear"), dict(window="hann"),
               dict(), dict(shift=False)]:
        ref = xrft_tpu.power_spectrum(da, dim=["y", "x"], **kw)
        old = config.psd_mirror_impl
        config.psd_mirror_impl = "pallas_interpret"
        try:
            got = xrft_tpu.power_spectrum(da, dim=["y", "x"], **kw)
        finally:
            config.psd_mirror_impl = old
        assert got.dims == ref.dims
        npt.assert_array_equal(np.asarray(got.values),
                               np.asarray(ref.values))
        for c in ref.coords:
            npt.assert_array_equal(np.asarray(got.coords[c].values),
                                   np.asarray(ref.coords[c].values))


def test_psd_mirror_kernel_jittable():
    rng = np.random.RandomState(1)
    da = LabeledArray(rng.randn(512, 512).astype(np.float32),
                      dims=("y", "x"),
                      coords={"y": np.arange(512) * 1.0,
                              "x": np.arange(512) * 1.0})
    old = config.psd_mirror_impl
    config.psd_mirror_impl = "pallas_interpret"
    try:
        out = jax.jit(lambda d: xrft_tpu.power_spectrum(
            d, dim=["y", "x"], window="hann"))(da)
    finally:
        config.psd_mirror_impl = old
    ref = xrft_tpu.power_spectrum(da, dim=["y", "x"], window="hann")
    npt.assert_array_equal(np.asarray(out.values), np.asarray(ref.values))
