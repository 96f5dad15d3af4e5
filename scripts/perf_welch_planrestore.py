"""Sweep the 1024 radix plan for the SEGMENTED raw route, timing raw
engine and raw+restore separately: plan (8,128) makes the restore's
contiguous runs 8 elements wide (digit dim), and the measured restore is
~15 ms vs ~1.8 ms for the unsegmented flagship whose digit runs are 32.

Usage: python scripts/perf_welch_planrestore.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


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
    from xrft_tpu.ops import stacked_fft

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    rng = np.random.RandomState(0)
    shape = (1024, 4, 4, 8, 1024)      # new steered segmented layout
    axis_order = (3, 1, 0, 2, 4)       # user order time,yseg,y,xseg,x
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))

    plan_orig = stacked_fft.plan_raw

    def with_plan(p1024):
        def plan2(n, cap, pre, post):
            if n == 1024:
                return p1024
            return plan_orig(n, cap, pre, post)
        return plan2

    def raw_only(xx):
        a, layout = stacked_fft.fft_nd_stacked(xx, (0, 4), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return jnp.sum(re * re + im * im)

    def with_restore(xx):
        a, layout = stacked_fft.fft_nd_stacked(xx, (0, 4), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        ps = re * re + im * im
        out = stacked_fft.raw_to_standard(ps, layout, axis_order=axis_order)
        return jnp.sum(out)

    for p in [(8, 128), (32, 32), (16, 64), (64, 16), (128, 8)]:
        stacked_fft.plan_raw = with_plan(p)
        try:
            m0 = timeit(raw_only, x)
            m1 = timeit(with_restore, x)
            print(f"plan(1024)={str(p):10s} raw {m0:6.2f}  +restore "
                  f"{m1:6.2f}  (delta {m1-m0:5.2f}) ms/iter", flush=True)
        finally:
            stacked_fft.plan_raw = plan_orig


if __name__ == "__main__":
    main()
