"""Cross-validation of the stacked-complex pad-free engine
(ops/stacked_fft.py) against numpy.fft, mirroring the oracle-parity genre
of the reference suite (/root/reference/xrft/tests/test_xrft.py:57-97).

Runs in f64 on the CPU backend (exact dots): agreement to ~1e-11.
"""

import numpy as np
import numpy.testing as npt
import pytest

from xrft_tpu.config import config
from xrft_tpu.ops import carray, stacked_fft
from xrft_tpu.ops.carray import ComplexPair


def _run(x, axes, kind, pre=(), post=(), post_kind="fftshift"):
    xin = x
    if np.iscomplexobj(x):
        xin = ComplexPair(np.ascontiguousarray(x.real),
                          np.ascontiguousarray(x.imag))
    assert stacked_fft.stacked_supported(
        xin if carray.is_pair(xin) else np.asarray(xin),
        [a % x.ndim for a in axes], kind,
        {a % x.ndim for a in pre}, {a % x.ndim for a in post})
    out = stacked_fft.fft_nd_stacked(xin, axes, kind, pre, post, post_kind)
    return carray.to_numpy(out)


def _oracle(x, axes, kind, pre=(), post=(), post_kind="fftshift"):
    y = x.astype(np.complex128 if np.iscomplexobj(x) or kind != "rfft"
                 else np.float64)
    if pre:
        y = np.fft.ifftshift(y, axes=tuple(pre))
    if kind == "fft":
        out = np.fft.fftn(y, axes=tuple(axes))
    elif kind == "ifft":
        out = np.fft.ifftn(y, axes=tuple(axes))
    else:
        out = np.fft.rfftn(y, axes=tuple(axes))
    if post:
        f = np.fft.fftshift if post_kind == "fftshift" else np.fft.ifftshift
        out = f(out, axes=tuple(post))
    return out


SIZES_1D = [8, 32, 127, 128, 130, 256, 360, 4096, 2 * 127]


@pytest.mark.parametrize("n", SIZES_1D)
@pytest.mark.parametrize("kind", ["fft", "ifft", "rfft"])
def test_1d_sizes(n, kind):
    rng = np.random.RandomState(n)
    if kind == "ifft":
        x = rng.randn(3, n) + 1j * rng.randn(3, n)
    else:
        x = rng.randn(3, n)
    got = _run(x, [-1], kind)
    ref = _oracle(x, [-1], kind)
    npt.assert_allclose(got, ref, atol=1e-10 * max(1.0, n))


@pytest.mark.parametrize("kind", ["fft", "ifft", "rfft"])
def test_2d(kind):
    rng = np.random.RandomState(7)
    if kind == "ifft":
        x = rng.randn(2, 96, 256) + 1j * rng.randn(2, 96, 256)
    else:
        x = rng.randn(2, 96, 256)
    got = _run(x, [-2, -1], kind)
    ref = _oracle(x, [-2, -1], kind)
    npt.assert_allclose(got, ref, atol=1e-9)


def test_3d_fft_complex():
    rng = np.random.RandomState(9)
    x = rng.randn(24, 32, 48) + 1j * rng.randn(24, 32, 48)
    got = _run(x, [0, 1, 2], "fft")
    npt.assert_allclose(got, _oracle(x, [0, 1, 2], "fft"), atol=1e-9)


def test_multilevel_plan():
    """A size requiring a 3-level radix plan exercises the explicit
    twiddle pass."""
    old = config.direct_dft_max
    config.direct_dft_max = 8
    try:
        assert len(stacked_fft.plan(512, 8)) == 3
        rng = np.random.RandomState(3)
        x = rng.randn(4, 512)
        got = _run(x, [-1], "fft")
        npt.assert_allclose(got, _oracle(x, [-1], "fft"), atol=1e-9)
        x2 = rng.randn(4, 512) + 1j * rng.randn(4, 512)
        got = _run(x2, [-1], "ifft")
        npt.assert_allclose(got, _oracle(x2, [-1], "ifft"), atol=1e-12)
    finally:
        config.direct_dft_max = old
        stacked_fft.plan.cache_clear()


@pytest.mark.parametrize("kind,post_kind", [
    ("fft", "fftshift"), ("ifft", "ifftshift"), ("rfft", "fftshift")])
def test_shift_absorption(kind, post_kind):
    """pre (input ifftshift) and post (output shift) are baked into the
    constants; parity vs explicit numpy shifts (reference true_phase path,
    /root/reference/xrft/xrft.py:435-447)."""
    rng = np.random.RandomState(11)
    if kind == "ifft":
        x = rng.randn(3, 64, 256) + 1j * rng.randn(3, 64, 256)
    else:
        x = rng.randn(3, 64, 256)
    # post shift only on the non-real axis for rfft
    post = (-2,) if kind == "rfft" else (-2, -1)
    got = _run(x, [-2, -1], kind, pre=(-2, -1), post=post,
               post_kind=post_kind)
    ref = _oracle(x, [-2, -1], kind, pre=(-2, -1), post=post,
                  post_kind=post_kind)
    npt.assert_allclose(got, ref, atol=1e-9)


def test_odd_shift_direct_ok():
    """Odd direct sizes absorb shifts as full permutations."""
    rng = np.random.RandomState(13)
    x = rng.randn(5, 31)
    got = _run(x, [-1], "fft", pre=(-1,), post=(-1,))
    npt.assert_allclose(got, _oracle(x, [-1], "fft", pre=(-1,), post=(-1,)),
                        atol=1e-11)


def test_unsupported_falls_back():
    """Sizes with a prime factor > direct_dft_max and odd multi-level
    shifted axes are rejected (pair engine handles them)."""
    x = np.zeros((4, 257))  # 257 prime > 128
    assert not stacked_fft.stacked_supported(x, [1], "fft", set(), set())
    x2 = np.zeros((4, 127 * 3))  # odd multi-level + shift
    assert not stacked_fft.stacked_supported(x2, [1], "fft", {1}, set())
    assert stacked_fft.stacked_supported(x2, [1], "fft", set(), set())
    x3 = np.zeros((4, 64))
    assert not stacked_fft.stacked_supported(x3, [1], "irfft", set(), set())


def test_pair_input_fft():
    rng = np.random.RandomState(17)
    x = rng.randn(2, 200) + 1j * rng.randn(2, 200)
    got = _run(x, [-1], "fft")
    npt.assert_allclose(got, _oracle(x, [-1], "fft"), atol=1e-10)


def test_f32_grade():
    rng = np.random.RandomState(19)
    x = rng.randn(2, 1024).astype(np.float32)
    out = stacked_fft.fft_nd_stacked(x, [-1], "fft")
    got = carray.to_numpy(out)
    ref = np.fft.fft(x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-6


def test_plan_rebalances_degenerate_splits():
    """Tiny (<16) radices pad up to 16x under (8,128) tiling when a digit
    dim lands minor (measured as a 16 GB OOM temp on a segmented 4096^2
    pipeline): the planner must pick balanced factorizations at every
    level count, while keeping the flagship plans."""
    from xrft_tpu.ops.stacked_fft import plan

    assert plan(1024, 128) == (32, 32)
    assert plan(512, 128) == (16, 32)
    assert plan(256, 128) == (16, 16)
    assert plan(32768, 128) == (32, 32, 32)
    assert plan(4096, 128) == (32, 128)   # flagship: unchanged
    assert min(plan(65536, 128)) >= 16
    # non-rebalanceable sizes keep working
    assert plan(96, 128) == (96,)
    assert plan(1000, 128) == (25, 40)


def test_plan_raw_prefers_big_last():
    """Raw-layout consumers get the unrebalanced big-last plan when its
    digits align to the sublane tile (1024: (8,128) — measured 35.1 vs
    66.2 ms on the segmented Welch flagship); the standard epilogue
    keeps the rebalanced plan (OOM guard), and misaligned or
    shift-incompatible naive plans fall back."""
    from xrft_tpu.ops.stacked_fft import plan, plan_raw

    assert plan(1024, 128) == (32, 32)
    assert plan_raw(1024, 128, False, False) == (8, 128)
    # 512's naive split (4, 128) has a sub-sublane digit: falls back
    assert plan_raw(512, 128, False, False) == plan(512, 128)
    # odd-first naive plans cannot absorb a pre-shift: falls back
    n_odd = 1152  # naive (9, 128)
    assert plan_raw(n_odd, 128, True, False) == plan(n_odd, 128)
    assert plan_raw(n_odd, 128, False, False) == (9, 128)


def test_raw_route_parity_rebalance_sizes():
    """The fused raw PSD with a plan_raw-divergent size (1024) matches
    the generic path (the raw layout metadata must stay self-consistent
    across the plan fork)."""
    import numpy.testing as npt

    import xrft_tpu
    from xrft_tpu import LabeledArray

    rng = np.random.RandomState(5)
    da = LabeledArray(rng.randn(1024, 32), dims=("x", "b"),
                      coords={"x": np.arange(1024) * 0.5,
                              "b": np.arange(32) * 1.0})
    ref = xrft_tpu.power_spectrum(da, dim=["x", "b"], engine="xla",
                                  window="hann")
    got = xrft_tpu.power_spectrum(da, dim=["x", "b"], engine="matmul",
                                  window="hann")
    scale = np.abs(np.asarray(ref.values)).max()
    npt.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                        atol=1e-10 * scale)
