"""Window placement A/B for the SEGMENTED fused route now that the
prune axis is a single direct dot: pre_weights folds the x window into
the dot rows (exactly free) and the y window into the inter-dot output
fusion, vs the shipped explicit-multiply-before-engine rule (census
rule, ops/psd_fused.py, measured on the 4096 flagship pre-direct-prune).

Usage: python scripts/perf_welch_prewt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.signal as sps

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
    w = np.asarray(sps.windows.hann(1024, sym=False), np.float64)
    wf = w.astype(np.float32)

    def explicit(xx):
        v = xx * wf[:, None, None, None, None]
        v = v * wf[None, None, None, None, :]
        a, layout = stacked_fft.fft_nd_stacked(v, (0, 4), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        ps = re * re + im * im
        return jnp.sum(stacked_fft.raw_to_standard(ps, layout,
                                                   axis_order=axis_order))

    def prewt(xx):
        a, layout = stacked_fft.fft_nd_stacked(
            xx, (0, 4), "rfft", raw=True, pre_weights={0: w, 4: w})
        re, im = stacked_fft.raw_planes(a, layout)
        ps = re * re + im * im
        return jnp.sum(stacked_fft.raw_to_standard(ps, layout,
                                                   axis_order=axis_order))

    m0 = timeit(explicit, x)
    m1 = timeit(prewt, x)
    print(f"window explicit multiply: {m0:6.2f} ms/iter", flush=True)
    print(f"window pre_weights fold:  {m1:6.2f} ms/iter", flush=True)

    # value parity
    ref = np.asarray(jax.jit(explicit)(x))
    got = np.asarray(jax.jit(prewt)(x))
    print(f"parity rel err: {abs(got-ref)/abs(ref):.2e}", flush=True)


if __name__ == "__main__":
    main()
