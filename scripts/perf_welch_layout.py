"""Probe: does the segmented (Welch) batch-dim ORDER explain the fused
Welch flagship running ~15 ms slower than the unsegmented window-only
PSD despite identical data volume and smaller transforms?

Hypothesis: in the steered layout ``[y, time, y_seg, x_seg, x]`` the
tiny ``x_seg=4`` dim occupies the sublane (second-minor) slot of every
x-stage intermediate, padding 4->8 under the v5e's (8,128) tiling — a
2x traffic blowup on the largest arrays in the pipeline.  Variants move
a tile-friendly dim (time=8) next to the transform dim or merge all
batch dims into one 128 dim.

Times the raw stacked rfft2 + |F|^2 (no mirror/scaling tail) per layout.

Usage: python scripts/perf_welch_layout.py
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

    def raw_psd(axes):
        def f(xx):
            a, layout = stacked_fft.fft_nd_stacked(xx, axes, "rfft", raw=True)
            re, im = stacked_fft.raw_planes(a, layout)
            return jnp.sum(re * re + im * im)
        return f

    cases = [
        ("welch steered  (1024, 8,4,4, 1024) ax(0,4)", (1024, 8, 4, 4, 1024),
         (0, 4)),
        ("time-last      (1024, 4,4,8, 1024) ax(0,4)", (1024, 4, 4, 8, 1024),
         (0, 4)),
        ("merged batch   (1024, 128,   1024) ax(0,2)", (1024, 128, 1024),
         (0, 2)),
        ("flagship ref   (4096, 8,     4096) ax(0,2)", (4096, 8, 4096),
         (0, 2)),
    ]
    for label, shape, axes in cases:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        ms = timeit(raw_psd(axes), x)
        print(f"{label}  {ms:7.2f} ms/iter", flush=True)
        del x


if __name__ == "__main__":
    main()
