"""Packed-engine spike, round 2: separate the engine core from the
epilogue, all in one chip session (chip-to-chip variance is ~10%).

 a) current raw rfft2 + |.|^2          (the baseline engine core)
 b) packed complex fft2 + |A|^2 only   (pure core: should be ~half the
                                        dot traffic/FLOPs of (a))
 c) (b) + rev-read combine emitting one full-size output via concat
                                        (realistic epilogue traffic)

Usage: python scripts/perf_packed_spike2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, x, iters=6):
    def loop(k):
        def body(_, carry):
            s, xx = carry
            s2 = jnp.sum(fn(xx))
            return s + s2, xx + s2 * 1e-38

        def run(xx):
            s, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), xx))
            return s
        return jax.jit(run)

    f1, fk = loop(1), loop(iters)
    float(f1(x)); float(fk(x))

    def wall(f):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    return (wall(fk) - wall(f1)) / (iters - 1)


def main():
    from xrft_tpu.ops import carray, stacked_fft

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, B, N).astype(np.float32))  # [y, t, x]

    def current_raw(xx):
        a, layout = stacked_fft.fft_nd_stacked(
            lax.optimization_barrier(xx), [0, 2], "rfft", (), (0,),
            raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return re * re + im * im

    def packed_core(xx):
        z = carray.ComplexPair(xx[0::2], xx[1::2])  # [u, t, x]
        a, layout = stacked_fft.fft_nd_stacked(
            carray.ComplexPair(lax.optimization_barrier(z.re),
                               lax.optimization_barrier(z.im)),
            [2, 0], "fft", (), (), raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return re * re + im * im

    def packed_epilogue(xx):
        z = carray.ComplexPair(xx[0::2], xx[1::2])
        a, layout = stacked_fft.fft_nd_stacked(
            carray.ComplexPair(lax.optimization_barrier(z.re),
                               lax.optimization_barrier(z.im)),
            [2, 0], "fft", (), (), raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        digs = []
        for ax2 in layout.order:
            digs += stacked_fft._axis_dig_positions(layout, ax2)
        rre = lax.rev(re, tuple(digs))
        rim = lax.rev(im, tuple(digs))
        # two half-size pieces -> one full-size output write, four reads
        p_a = re * re + im * im + rre * 0.5
        p_b = re * rre + im * rim + rim * 0.5
        ua = layout.dims.index(("dig", 0, 0)) if ("dig", 0, 0) in \
            layout.dims else 0
        return jnp.concatenate([p_a, p_b], axis=ua)

    ms_a = timeit(current_raw, x)
    print(f"a) current raw rfft2 + |.|^2    {ms_a:7.2f} ms/iter")
    ms_b = timeit(packed_core, x)
    print(f"b) packed fft2 + |A|^2          {ms_b:7.2f} ms/iter")
    ms_c = timeit(packed_epilogue, x)
    print(f"c) packed + rev-combine concat  {ms_c:7.2f} ms/iter")


if __name__ == "__main__":
    main()
