"""Can a single-level DIRECT 1024-point DFT (per axis) fix the segmented
restore pathology?  A single digit makes the restored axis fully
contiguous (no interleave), trading more MXU FLOPs — which may be nearly
free if the 2-level engine is bandwidth-bound at this size.

Sweeps {x, y} x {(8,128), (1024,)} on the steered segmented layout, raw
and raw+restore, plus a numerics check vs numpy.

Usage: python scripts/perf_welch_direct.py
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
    shape = (1024, 4, 4, 8, 1024)
    axis_order = (3, 1, 0, 2, 4)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))

    plan_orig = stacked_fft.plan_raw

    def with_plans(px, py):
        # transform order is [prune(4), 0]: first plan_raw call is x,
        # second is y
        state = {"i": 0}

        def plan2(n, cap, pre, post):
            state["i"] += 1
            return px if state["i"] % 2 == 1 else py
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

    cases = [
        ("x(8,128) y(8,128)", (8, 128), (8, 128)),
        ("x(1024,) y(8,128)", (1024,), (8, 128)),
        ("x(8,128) y(1024,)", (8, 128), (1024,)),
        ("x(1024,) y(1024,)", (1024,), (1024,)),
    ]
    for label, px, py in cases:
        stacked_fft.plan_raw = with_plans(px, py)
        try:
            m0 = timeit(raw_only, x)
            m1 = timeit(with_restore, x)
            print(f"{label}: raw {m0:6.2f}  +restore {m1:6.2f}  "
                  f"(delta {m1-m0:5.2f}) ms/iter", flush=True)
        finally:
            stacked_fft.plan_raw = plan_orig

    # numerics: direct-1024 f32 vs numpy f64 on a small batch
    small = np.asarray(x[:, :1, :1, :1, :])[:, 0, 0, 0, :].T  # (8, 1024)? no
    small = rng.randn(4, 1024, 1024).astype(np.float32)
    stacked_fft.plan_raw = with_plans((1024,), (1024,))
    try:
        a, layout = stacked_fft.fft_nd_stacked(
            jnp.asarray(small), (1, 2), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        g = np.asarray(stacked_fft.raw_to_standard(re, layout)) \
            + 1j * np.asarray(stacked_fft.raw_to_standard(im, layout))
        ref = np.fft.rfftn(small.astype(np.float64), axes=(1, 2))
        err = np.abs(g - ref).max() / np.abs(ref).max()
        print(f"direct-1024 f32 max rel err vs f64 numpy: {err:.2e}",
              flush=True)
    finally:
        stacked_fft.plan_raw = plan_orig


if __name__ == "__main__":
    main()
