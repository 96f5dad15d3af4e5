"""Feasibility spike: Hermitian y-pair packing for the flagship PSD.

The 2-D rfft of a real field equals a half-size complex 2-D FFT of
row-pairs packed as re/im (z[u,x] = f[2u,x] + i f[2u+1,x]) plus an O(N)
elementwise combine (classic real-FFT packing).  All four engine dots
then operate on arrays of HALF the current total size — the question is
whether the combine/mirror epilogue (which must read A and its
negation-map partner) gives the traffic back.

This spike measures the packed engine core with a STAND-IN epilogue that
has the right traffic pattern (reads raw A twice — once reversed — and
writes the full 537 MB two-sided grid) but placeholder math, against the
current raw engine + |.|^2.  Numbers only; parity comes later.

Usage: python scripts/perf_packed_spike.py
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
    U = N // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, B, N).astype(np.float32))  # [y, t, x]

    def current_raw(xx):
        a, layout = stacked_fft.fft_nd_stacked(
            lax.optimization_barrier(xx), [0, 2], "rfft", (), (0,),
            raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return re * re + im * im

    def packed_raw(xx):
        # pack row pairs along y (major axis): z = f[0::2] + i f[1::2]
        z = carray.ComplexPair(xx[0::2], xx[1::2])  # [u, t, x]
        a, layout = stacked_fft.fft_nd_stacked(
            carray.ComplexPair(lax.optimization_barrier(z.re),
                               lax.optimization_barrier(z.im)),
            [2, 0], "fft", (), (), raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        # stand-in combine: reads A and its digit-reversed partner, emits
        # four half-size planes ~= the full 537 MB two-sided output
        digs = []
        for ax2 in layout.order:
            digs += stacked_fft._axis_dig_positions(layout, ax2)
        rre = lax.rev(re, tuple(digs))
        rim = lax.rev(im, tuple(digs))
        p1 = re * re + im * im + rre
        p2 = re * rre + im * rim
        p3 = re * rim - im * rre
        p4 = rre * rre + rim * rim + im
        return jnp.stack([p1, p2, p3, p4])

    ms_cur = timeit(current_raw, x)
    print(f"current raw rfft2 + |.|^2       {ms_cur:7.2f} ms/iter")
    ms_new = timeit(packed_raw, x)
    print(f"packed fft2 + stand-in combine  {ms_new:7.2f} ms/iter")


if __name__ == "__main__":
    main()
