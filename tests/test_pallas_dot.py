"""ops/pallas_dot kernels (VERDICT r3 item 1 A/B instruments).

Validated here in interpret mode on CPU; the on-chip A/B against the XLA
dot emitter lives in scripts/perf_pallas_dot.py with results recorded in
BASELINE.md.  On-chip the kernels were verified BIT-IDENTICAL to the XLA
HIGHEST-precision dot on the flagship shapes (same 6-pass bf16
semantics).
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

from xrft_tpu.ops import pallas_dot


@pytest.fixture(scope="module")
def packed():
    rng = np.random.RandomState(0)
    w2 = rng.randn(64, 32).astype(np.float32)
    W = pallas_dot.pack_block_diag(w2, 4)          # (256, 128)
    x = jnp.asarray(rng.randn(128, 8192).astype(np.float32))
    ref = W.astype(np.float64) @ np.asarray(x, np.float64)
    return w2, W, x, ref


def test_pack_block_diag(packed):
    w2, W, _, _ = packed
    assert W.shape == (256, 128)
    npt.assert_array_equal(W[:64, :32], w2)
    npt.assert_array_equal(W[64:128, 32:64], w2)
    assert np.all(W[:64, 32:] == 0)


def test_pipelined_kernel_matches_oracle(packed):
    _, W, x, ref = packed
    f = pallas_dot.make_dot_kernel(W, 8192, tile_cols=2048, interpret=True)
    got = np.asarray(f(x))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


def test_dma_kernel_matches_oracle(packed):
    _, W, x, ref = packed
    f = pallas_dot.make_dot_kernel_dma(W, 8192, tile_cols=2048,
                                       interpret=True)
    got = np.asarray(f(x))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


def test_fold_kernel_matches_oracle(packed):
    _, W, x, ref = packed
    f = pallas_dot.make_dot_fold_kernel(W, 8192, tile_cols=2048,
                                        interpret=True)
    got = np.asarray(f(x))
    want = ref[:128] + 1e-38 * ref[128:]
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-6


def test_tile_divisibility_contract(packed):
    _, W, _, _ = packed
    with pytest.raises(ValueError, match="tile_cols"):
        pallas_dot.make_dot_kernel(W, 8192, tile_cols=3000)
    with pytest.raises(ValueError, match="M == 2K"):
        pallas_dot.make_dot_fold_kernel(W[:200], 8192, tile_cols=2048)


# ---------------------------------------------------------------------------
# config.pallas_level0: the in-engine route for the real-input level-0
# dot (floor_retest follow-through, round 5).  Both variants must be
# numerically identical to the dot_general path and actually fire on the
# flagship-shaped plan.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["unpacked_interpret", "packed_interpret"])
def test_pallas_level0_route_matches_dot_general(mode):
    import jax

    from xrft_tpu.config import config
    from xrft_tpu.ops import stacked_fft

    rng = np.random.RandomState(3)
    # x-axis 2048 > direct_prune_max -> multi-level (16, 128) raw plan,
    # so the level-0 real dot exists (the flagship's hot-dot shape class)
    x = jnp.asarray(rng.randn(16, 2, 2048).astype(np.float32))

    def prog(xx):
        a, layout = stacked_fft.fft_nd_stacked(
            xx, [0, 2], "rfft", (), (0,), raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return re * re + im * im

    base = np.asarray(prog(x))
    config.pallas_level0 = mode
    try:
        jaxpr = str(jax.make_jaxpr(prog)(x))
        got = np.asarray(prog(x))
    finally:
        config.pallas_level0 = "never"
    assert "pallas_call" in jaxpr  # the route FIRED
    assert np.abs(got - base).max() <= 1e-6 * np.abs(base).max()


def test_pallas_level0_ineligible_falls_back():
    import jax

    from xrft_tpu.config import config
    from xrft_tpu.ops import stacked_fft

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(16, 2, 2048).astype(np.float32))

    def prog(xx):
        a, layout = stacked_fft.fft_nd_stacked(
            xx, [0, 2], "rfft", (), (0,), raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return re * re + im * im

    config.pallas_level0 = "unpacked_interpret"
    old_prec = config.matmul_precision
    config.matmul_precision = "default"  # off the kernel's HIGHEST grade
    try:
        jaxpr = str(jax.make_jaxpr(prog)(x))
    finally:
        config.pallas_level0 = "never"
        config.matmul_precision = old_prec
    assert "pallas_call" not in jaxpr  # clean static fallback
