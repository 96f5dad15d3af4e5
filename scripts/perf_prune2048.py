"""Should config.direct_prune_max extend to 2048?  Measures the
segmented core at 2048^2 segments (8x4096^2 -> 32 segments): factorized
plan (16,128) (64-byte restore runs) vs a single direct 2048 dot
(contiguous restore, 2x the direct-1024 FLOPs).

Usage: python scripts/perf_prune2048.py
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
    from xrft_tpu import config as cfg
    from xrft_tpu.ops import stacked_fft

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    rng = np.random.RandomState(0)
    shape = (2048, 2, 2, 8, 2048)      # steered 2048^2-segment layout
    axis_order = (3, 1, 0, 2, 4)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))

    def with_restore(xx):
        a, layout = stacked_fft.fft_nd_stacked(xx, (0, 4), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        ps = re * re + im * im
        out = stacked_fft.raw_to_standard(ps, layout, axis_order=axis_order)
        return jnp.sum(out)

    for label, cap in [("factorized (16,128)", 1024),
                       ("direct 2048", 2048)]:
        old = cfg.config.direct_prune_max
        cfg.config.direct_prune_max = cap
        try:
            ms = timeit(with_restore, x)
            print(f"prune plan {label}: {ms:7.2f} ms/iter", flush=True)
        finally:
            cfg.config.direct_prune_max = old


if __name__ == "__main__":
    main()
