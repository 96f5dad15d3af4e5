"""Hand-scheduled Pallas matmul vs the XLA dot emitter (VERDICT r3 item 1).

The three-round perf argument rests on one unfalsified hypothesis: that
XLA's dot emitter (~448 GB/s effective on the engine's dot fusions, 55%
of the v5e's 819 GB/s HBM spec) is a floor no code in this repo can get
under.  This script tests it directly on the flagship's HOTTEST dot —
the x-axis level-0 dot of the (32,128) plan on the 8x4096^2 one-sided
PSD (see the stablehlo dump in the module docstring of
ops/pallas_dot.py):

    dot1: W(2,32,32) x X(32,128,8,32,128) contract j=32
          -> out(2,32,32,128,8,128)        [~0.54 GB in, ~1.07 GB out]

Legs (all at HIGHEST precision = the engine's 6-pass bf16 f32 grade):

  A. XLA dot, exact in-situ engine shape (the measured baseline).
  B. XLA dot, co-designed 2-D layout: x as (128, N) with FOUR j-tiles
     packed per column and a block-diagonal (256,128) weight — the
     MXU-friendly reformulation (K=128, M=256 vs K=32, M=64).  Separates
     "layout effect" from "hand-scheduling effect".
  C. Pallas kernel on the co-designed layout: one (256,128)@(128,TC) dot
     per grid step, BlockSpec-pipelined (Pallas auto-double-buffers
     HBM->VMEM block streams).
  D. Pallas kernel with EXPLICIT manual double-buffered DMA
     (make_async_copy + two VMEM slots), in case the auto-pipeline's
     scheduling is the limiter.

Decision rule (VERDICT r3 item 1): any leg sustaining >= 600 GB/s of
min-traffic bandwidth on dot1 breaks the floor -> wire it in as an
opt-in engine level; all legs <= ~500 GB/s -> the floor analysis in
BASELINE.md becomes a measured proof and the north star is formally
toolchain-bound.

Usage: python scripts/perf_pallas_dot.py  (on the chip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

SMOKE = bool(os.environ.get("XRFT_SMOKE"))


def timeit(fn, x, iters=6, reps=3):
    """Chained-loop per-iteration time of ``sum(barrier(fn(x)))``.

    The optimization_barrier forces the dot output to MATERIALIZE in
    every leg (XLA would otherwise fuse the consuming reduction into its
    own dot epilogue — an advantage the opaque Pallas call can't get —
    or prune unread output columns entirely).  All legs therefore pay
    the identical +write+read+reduce tail; subtract the standalone
    reduction leg to get dot-only time.
    """
    def loop(k):
        def body(_, carry):
            s, xx = carry
            s2 = jnp.sum(lax.optimization_barrier(fn(xx)))
            return s + s2, xx + s2 * 1e-38

        def run(xx):
            s, _ = lax.fori_loop(0, k, body, (jnp.float32(0.0), xx))
            return s
        return jax.jit(run)

    f1, fk = loop(1), loop(iters)
    float(f1(x)); float(fk(x))

    def wall(f):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    return (wall(fk) - wall(f1)) / (iters - 1)


def main():
    from xrft_tpu.ops.matmul_fft import _dft_matrix_np
    from xrft_tpu.ops import pallas_dot

    # flagship dot1 shapes (SMOKE shrinks the batch only)
    B = 2 if SMOKE else 8
    R1, M1 = 32, 128                       # x-axis plan (32, 128)
    NY, NX = R1 * M1, R1 * M1              # 4096 x 4096
    R = NY * B                             # rows of the (R, 32, 128) view
    rng = np.random.RandomState(0)

    # the true DFT level-0 weight (real input): (2, 32, 32)
    wc = _dft_matrix_np(R1, -1)
    W = np.stack([wc.real, wc.imag]).astype(np.float32)  # (2, r, j)

    gb_in = R * R1 * M1 * 4 / 1e9
    gb_out = 2 * R * R1 * M1 * 4 / 1e9
    gb_dot = gb_in + gb_out                # dot-only min traffic
    print(f"dot1: contract j={R1}, columns={R * M1 / 1e6:.2f}M, "
          f"dot traffic {gb_dot:.2f} GB, bw bound "
          f"{gb_dot / 819e9 * 1e12:.2f} ms")

    # null leg: the harness tail every leg pays (write the barrier'd
    # out-sized array, read it back for the sum, carry-update the input)
    # with a near-zero dot; leg - null ~= dot-only time.  The PRIMARY
    # readout is relative (Pallas vs XLA leg A in the SAME harness).
    xa_carry = jnp.zeros((R1, M1, B, R1, M1), jnp.float32)

    def fn_null(xx):
        return jnp.zeros((2 * R1, R * M1), jnp.float32) + xx[0, 0, 0, 0, 0] * 1e-38

    ms_null = timeit(fn_null, xa_carry)
    print(f"null leg (harness tail)  {ms_null:7.2f} ms")
    del xa_carry

    def report(tag, ms):
        dot_ms = max(ms - ms_null, 1e-3)
        print(f"{tag:28s} {ms:7.2f} ms total | dot-only "
              f"{dot_ms:6.2f} ms  {gb_dot / dot_ms * 1e3:6.1f} GB/s")

    # ---- A. exact engine shape -------------------------------------------
    XA = jnp.asarray(rng.randn(R1, M1, B, R1, M1).astype(np.float32))
    WA = jnp.asarray(W)

    def dot_a(x):
        return lax.dot_general(WA, x, (((2,), (3,)), ((), ())),
                               precision=lax.Precision.HIGHEST)

    ms_a = timeit(dot_a, XA)
    report("A. XLA engine shape", ms_a)
    del XA

    # ---- B. XLA, co-designed 2-D layout ----------------------------------
    G = 4                                   # j-tiles packed per column
    N2 = R // G * M1
    Wbd = np.zeros((G * 2 * R1, G * R1), np.float32)
    for g in range(G):
        Wbd[g * 2 * R1:(g + 1) * 2 * R1, g * R1:(g + 1) * R1] = \
            W.reshape(2 * R1, R1)
    WB = jnp.asarray(Wbd)                   # (256, 128)
    XB = jnp.asarray(rng.randn(G * R1, N2).astype(np.float32))

    def dot_b(x):
        return lax.dot_general(WB, x, (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGHEST)

    ms_b = timeit(dot_b, XB)
    report("B. XLA 2-D block-diag", ms_b)

    # ---- C. Pallas, BlockSpec-pipelined ----------------------------------
    # VMEM budget: (in 128*tc*4)*2 + (out 256*tc*4)*2 bytes -> tc<=4096
    for tc in ([2048] if SMOKE else [1024, 2048, 4096]):
        try:
            f = pallas_dot.make_dot_kernel(WB, N2, tile_cols=tc)
            ms_c = timeit(f, XB)
            report(f"C. Pallas pipelined tc={tc}", ms_c)
        except Exception as e:
            print(f"C. Pallas pipelined tc={tc}: FAILED "
                  f"{type(e).__name__}: {e}"[:200])

    # ---- D. Pallas, manual double-buffered DMA ---------------------------
    for tc in ([2048] if SMOKE else [1024, 2048, 4096]):
        try:
            f = pallas_dot.make_dot_kernel_dma(WB, N2, tile_cols=tc)
            ms_d = timeit(f, XB)
            report(f"D. Pallas manual DMA tc={tc}", ms_d)
        except Exception as e:
            print(f"D. Pallas manual DMA tc={tc}: FAILED "
                  f"{type(e).__name__}: {e}"[:200])

    # ---- self-chained legs -------------------------------------------
    # The barrier+sum harness above turned out to hide the dot under its
    # own 3.2 GB tail (every leg within noise of the null).  This harness
    # is dot-DOMINATED: the dot's output folds back to the input shape
    # (out = y[:K] + 1e-38*y[K:]) and feeds the next iteration, with one
    # full reduction only at the very end.  Columns stay independent
    # through the chain, but the final sum reads them all, so XLA cannot
    # prune; the fold fuses into the dot epilogue in BOTH implementations.
    # Per-iteration minimum traffic: read K*n + write K*n = 1.07 GB.
    def chain(fn, x, iters=12, reps=3):
        def loop(k):
            def body(_, xx):
                return fn(xx)

            def run(xx):
                return jnp.sum(lax.fori_loop(0, k, body, xx))
            return jax.jit(run)

        f1, fk = loop(1), loop(iters)
        float(f1(x)); float(fk(x))

        def wall(f):
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(x))
                best = min(best, time.perf_counter() - t0)
            return best * 1e3
        return (wall(fk) - wall(f1)) / (iters - 1)

    gb_chain = 2 * R * R1 * M1 * 4 / 1e9   # read + write per iteration
    print(f"\nself-chained legs: {gb_chain:.2f} GB/iter, bw bound "
          f"{gb_chain / 819e9 * 1e12:.2f} ms/iter")

    def creport(tag, ms):
        print(f"{tag:34s} {ms:7.2f} ms/iter  "
              f"{gb_chain / ms * 1e3:6.1f} GB/s")

    # null: elementwise read+write roundtrip at the same footprint
    creport("N. elementwise roundtrip",
            chain(lambda xx: xx * (1.0 + 1e-38), XB))

    # A2: the engine's MXU-hostile K=32/M=64 contraction, 2-D layout
    W2 = jnp.asarray(W.reshape(2 * R1, R1))
    XS = jnp.asarray(rng.randn(R1, R * M1).astype(np.float32))

    def fold_a(xx):
        y = lax.dot_general(W2, xx, (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST)
        return y[:R1] + 1e-38 * y[R1:]

    creport("A2. XLA K=32/M=64 fold", chain(fold_a, XS))
    del XS

    # B2: XLA on the packed K=128/M=256 layout
    def fold_b(xx):
        y = lax.dot_general(WB, xx, (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST)
        return y[:G * R1] + 1e-38 * y[G * R1:]

    creport("B2. XLA packed K=128 fold", chain(fold_b, XB))

    # C2: Pallas fold kernel on the packed layout
    for tc in ([2048] if SMOKE else [2048, 4096, 8192]):
        try:
            f = pallas_dot.make_dot_fold_kernel(WB, N2, tile_cols=tc)
            creport(f"C2. Pallas fold tc={tc}", chain(f, XB))
        except Exception as e:
            print(f"C2. Pallas fold tc={tc}: FAILED "
                  f"{type(e).__name__}: {e}"[:160])

    # C2 numerics vs the XLA fold
    try:
        f = pallas_dot.make_dot_fold_kernel(WB, N2,
                                            tile_cols=2048)
        d = np.abs(np.asarray(f(XB)) - np.asarray(fold_b(XB))).max()
        print(f"C2 vs B2 max abs diff {d:.2e}")
    except Exception as e:
        print(f"C2 numerics failed: {e}"[:160])

    # numerics at FULL size: both kernels vs the XLA leg-B result and an
    # f64 oracle slice (the timing numbers are meaningless if wrong)
    ref_b = np.asarray(dot_b(XB)[:, :4096])
    oracle = Wbd.astype(np.float64) @ np.asarray(XB[:, :4096], np.float64)
    sc = np.abs(oracle).max()
    for tag, mk in (("C", pallas_dot.make_dot_kernel),
                    ("D", pallas_dot.make_dot_kernel_dma)):
        try:
            f = mk(WB, N2, tile_cols=2048 if SMOKE else 4096)
            got = np.asarray(f(XB))[:, :4096]
            print(f"{tag}: vs f64 oracle {np.abs(got - oracle).max() / sc:.2e}"
                  f"  vs XLA leg B {np.abs(got - ref_b).max() / sc:.2e}")
        except Exception as e:
            print(f"{tag} numerics check failed: {e}"[:200])


if __name__ == "__main__":
    main()
