"""Fused Pallas four-step FFT vs the stacked/pair engines (ROADMAP #5).

The round-4 Mosaic re-test narrowed the fused-kernel blocker to its final
lane merge; pallas_fft.py now keeps every lane reshape OUTSIDE the kernel
(caller-side bitcasts, 3-D block refs).  This script measures whether the
single-HBM-round-trip kernel actually beats the XLA-composed engines on
the flagship's hot axis:

    complex 4096-point FFT over 32768 rows (the y-axis of the 8x4096^2
    PSD after the pruned rfft x-axis) — the shape where the composed
    path's ~4 inter-stage HBM round trips are the claimed waste.

Legs (self-chained: out = fft(x)/64 feeds the next iteration, so the
transform dominates; per-iter min traffic = read 2 + write 2 planes
= 2.15 GB):

  N.  elementwise roundtrip at the same footprint (streaming ceiling)
  S.  stacked engine (fft_nd_stacked) — the production path
  P.  pair matmul engine (matmul_fft_nd)
  F*. fused Pallas kernel, sweep (n1, n2) x row_block

plus a real-input leg (full FFT of f32 real rows) and numerics checks of
every fused variant against numpy on the full array.

Decision rule: a fused variant beating S by >~15% on the complex axis is
worth integrating as an engine level; parity-or-worse closes ROADMAP #5
with a measured datapoint (the floor analysis already predicts parity:
the dot datapath, not inter-stage traffic, limits the composed path).

Usage: python scripts/perf_pallas_fftfuse.py   (on the chip)
       XRFT_SMOKE=1 ... (tiny shapes, CPU interpret — plumbing check)
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


def chain(fn, x, iters=10, reps=3):
    """Per-iteration wall time of x -> fn(x) self-chained k times."""
    def loop(k):
        def body(_, xx):
            return fn(xx)

        def run(xx):
            out = lax.fori_loop(0, k, body, xx)
            return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))
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
    from xrft_tpu.ops.carray import ComplexPair, to_numpy
    from xrft_tpu.ops.matmul_fft import matmul_fft_nd
    from xrft_tpu.ops.stacked_fft import fft_nd_stacked
    from xrft_tpu.ops import pallas_fft

    rows = 512 if SMOKE else 32768
    n = 1024 if SMOKE else 4096
    interpret = True if SMOKE else None
    inv_scale = np.float32(1.0 / np.sqrt(n))  # keeps chained magnitudes flat
    rng = np.random.RandomState(0)
    zr = jnp.asarray(rng.randn(rows, n).astype(np.float32))
    zi = jnp.asarray(rng.randn(rows, n).astype(np.float32))
    z = ComplexPair(zr, zi)

    gb = 4 * rows * n * 4 / 1e9
    print(f"complex axis: {rows} x {n}, {gb:.2f} GB/iter, "
          f"bw bound {gb / 819e9 * 1e12:.2f} ms/iter")

    def report(tag, ms):
        print(f"{tag:36s} {ms:7.2f} ms/iter  {gb / ms * 1e3:6.1f} GB/s")

    # N. streaming ceiling at this footprint
    report("N. elementwise roundtrip",
           chain(lambda p: ComplexPair(p.re * (1.0 + 1e-38),
                                       p.im * (1.0 + 1e-38)), z))

    def scale(p):
        return ComplexPair(p.re * inv_scale, p.im * inv_scale)

    # S. stacked engine (production path)
    report("S. stacked engine",
           chain(lambda p: scale(fft_nd_stacked(p, [-1], "fft")), z))

    # P. pair matmul engine
    report("P. pair engine",
           chain(lambda p: scale(matmul_fft_nd(p, [-1], "fft", (), (),
                                               "fftshift")), z))

    # F. fused Pallas kernel sweep.  Round-1 results (on-chip, this
    # script): transpose-variant R=16 compiles & runs — the lane-merge
    # blocker is BROKEN — at (128,32) 41.3 / (64,64) 35.4 / (32,128)
    # 48.5 ms vs stacked 21.4; R>=32 crashed the compiler.  Round 2
    # sweeps the dot_general variant (one transpose), explicit VMEM
    # limits / parallel grid semantics, and a DEFAULT-precision probe.
    factor_sets = [(128, n // 128)] if n % 128 == 0 else []
    bal = pallas_fft._balanced_factors(n)
    if bal and bal not in factor_sets:
        factor_sets.append(bal)
    if n % 128 == 0 and (n // 128, 128) not in factor_sets:
        factor_sets.append((n // 128, 128))
    import jax.lax as _lax
    MB = 1024 * 1024
    combos = []
    for fs in factor_sets:
        combos += [
            dict(factors=fs, row_block=8 if SMOKE else 16,
                 variant="transpose"),
            dict(factors=fs, row_block=8 if SMOKE else 16, variant="dg"),
        ]
    if not SMOKE:
        f0 = factor_sets[0]
        combos += [
            dict(factors=f0, row_block=32, variant="transpose",
                 vmem_limit_bytes=100 * MB),
            dict(factors=f0, row_block=32, variant="dg",
                 vmem_limit_bytes=100 * MB),
            dict(factors=f0, row_block=64, variant="dg",
                 vmem_limit_bytes=100 * MB),
            dict(factors=f0, row_block=16, variant="dg",
                 dimension_semantics=("parallel",)),
            dict(factors=f0, row_block=16, variant="dg",
                 precision=_lax.Precision.DEFAULT),
            dict(factors=(64, 64), row_block=32, variant="dg",
                 vmem_limit_bytes=100 * MB),
        ]
    for kw in combos:
        if rows % kw["row_block"]:
            continue
        tag = ("F. " + kw["variant"][:2] + f" {kw['factors']} "
               f"R={kw['row_block']}"
               + (" vmem100" if kw.get("vmem_limit_bytes") else "")
               + (" par" if kw.get("dimension_semantics") else "")
               + (" lowprec" if kw.get("precision") else ""))
        try:
            f = lambda p, kw=kw: scale(pallas_fft.pallas_fft_last(
                p, -1, interpret=interpret, **kw))
            report(tag, chain(f, z))
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}"[:220])

    # real-input leg (full FFT of real rows): pair vs fused
    xr = jnp.asarray(rng.randn(rows, n).astype(np.float32))
    gbr = 3 * rows * n * 4 / 1e9
    print(f"\nreal-input full FFT: {gbr:.2f} GB/iter min traffic")

    def rreport(tag, ms):
        print(f"{tag:36s} {ms:7.2f} ms/iter  {gbr / ms * 1e3:6.1f} GB/s")

    def retake(p):  # chain back to a real array
        return p.re * inv_scale

    rreport("P. pair engine (real in)",
            chain(lambda v: retake(matmul_fft_nd(v, [-1], "fft", (), (),
                                                 "fftshift")), xr))
    for fs in factor_sets[:1]:
        rb = 8 if SMOKE else 16
        if rows % rb:
            continue
        tag = f"F. dg {fs} R={rb} (real)"
        try:
            f = lambda v: retake(pallas_fft.pallas_fft_last(
                v, -1, interpret=interpret, factors=fs, row_block=rb,
                variant="dg"))
            rreport(tag, chain(f, xr))
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}"[:220])

    # numerics: every fused variant vs numpy c128 on the full array
    zs = ComplexPair(zr[:256], zi[:256])
    ref = np.fft.fft(to_numpy(zs).astype(np.complex128), axis=-1)
    sc = np.abs(ref).max()
    for fs in factor_sets:
        for variant in ("transpose", "dg"):
            try:
                got = to_numpy(pallas_fft.pallas_fft_last(
                    zs, -1, interpret=interpret, factors=fs, row_block=8,
                    variant=variant))
                print(f"numerics {variant[:2]} {fs}: "
                      f"{np.abs(got - ref).max() / sc:.2e}")
            except Exception as e:
                print(f"numerics {variant[:2]} {fs}: FAILED "
                      f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
