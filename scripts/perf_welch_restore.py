"""Isolate the segmented raw_to_standard restore cost vs batch-dim
order, and A/B the full library Welch before/after candidate fixes.

Usage: python scripts/perf_welch_restore.py
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

    # axis_order maps the engine's input axes back to the USER order
    # (time, yseg, y, xseg, x).  For steered input (y, b0, b1, b2, x) the
    # user order depends on where time/yseg/xseg sit among b0..b2.
    cases = [
        ("old steer (1024, 8,4,4, 1024)", (1024, 8, 4, 4, 1024),
         (1, 2, 0, 3, 4)),     # user order: time(1), yseg(2), y(0), xseg(3), x(4)
        ("new steer (1024, 4,4,8, 1024)", (1024, 4, 4, 8, 1024),
         (3, 1, 0, 2, 4)),     # user order: time(3), yseg(1), y(0), xseg(2), x(4)
    ]
    for label, shape, axis_order in cases:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))

        def raw_only(xx):
            a, layout = stacked_fft.fft_nd_stacked(xx, (0, 4), "rfft",
                                                   raw=True)
            re, im = stacked_fft.raw_planes(a, layout)
            return jnp.sum(re * re + im * im)

        def with_restore(xx, _ao=axis_order):
            a, layout = stacked_fft.fft_nd_stacked(xx, (0, 4), "rfft",
                                                   raw=True)
            re, im = stacked_fft.raw_planes(a, layout)
            ps = re * re + im * im
            out = stacked_fft.raw_to_standard(ps, layout, axis_order=_ao)
            return jnp.sum(out)

        def with_restore_engine_order(xx):
            a, layout = stacked_fft.fft_nd_stacked(xx, (0, 4), "rfft",
                                                   raw=True)
            re, im = stacked_fft.raw_planes(a, layout)
            ps = re * re + im * im
            out = stacked_fft.raw_to_standard(ps, layout)  # engine order
            return jnp.sum(out)

        m0 = timeit(raw_only, x)
        m1 = timeit(with_restore, x)
        m2 = timeit(with_restore_engine_order, x)
        print(f"{label}: raw {m0:6.2f}  +restore(user) {m1:6.2f}  "
              f"+restore(engine-order) {m2:6.2f} ms/iter", flush=True)
        del x

    # library end-to-end after the steering change
    import xrft_tpu
    from xrft_tpu import LabeledArray

    B, N, S = 8, 4096, 1024
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32), dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    da_w = da.chunk({"y": S, "x": S})

    def welch_full(xx):
        return xrft_tpu.power_spectrum(
            da_w.copy(data=xx), dim=["y", "x"], window="hann",
            chunks_to_segments=True).data
    print(f"full welch power_spectrum: {timeit(welch_full, da.data):6.2f} "
          f"ms/iter", flush=True)


if __name__ == "__main__":
    main()
