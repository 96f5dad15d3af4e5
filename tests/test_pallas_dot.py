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
