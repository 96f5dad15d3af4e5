"""Test the census-derived fix for the window/detrend scheduling cliff.

census_cliff.py showed the detrend+window program (20.5 ms) carries an
extra copy/fusion pipeline after the x-final dot (the engine pre_weights
multiply) that the slower detrend-only program (22.4 ms) lacks — the
anomaly is schedule-driven, not traffic-driven.  If inserting the same
structure with a WEIGHT OF ONES recovers the 2 ms, the generic fix is to
always route a unit pre_weight through the engine when a detrend pass
exists.

Usage: python scripts/perf_cliff_fix.py
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
    from xrft_tpu import LabeledArray
    from xrft_tpu.ops import psd_fused, stacked_fft
    from xrft_tpu.detrend import detrend as _detrend

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32), dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    x = da.data

    def via(barrier, do_detrend, window):
        def f(xx):
            d = da.copy(data=xx).transpose("y", "time", "x")
            d = d.copy(data=jax.lax.optimization_barrier(d.data))
            if do_detrend:
                d = _detrend(d, ["y", "x"], detrend_type="linear")
            data = d.data
            pw = None
            if window == "explicit":
                import scipy.signal as sps

                w = sps.windows.hann(N, sym=False).astype(np.float32)
                data = data * jnp.asarray(w.reshape(N, 1, 1))
                data = data * jnp.asarray(w.reshape(1, 1, N))
            elif window == "pre":
                import scipy.signal as sps

                w64 = np.asarray(sps.windows.hann(N, sym=False), np.float64)
                pw = {0: w64, 2: w64}
            a, layout = stacked_fft.fft_nd_stacked(
                data, [0, 2], "rfft", (), (0,), pre_weights=pw, raw=True,
                inter_axis_barrier=barrier)
            re, im = stacked_fft.raw_planes(a, layout)
            psd = re * re + im * im
            return stacked_fft.raw_to_standard(psd, layout,
                                               axis_order=[1, 0, 2])
        return f

    for name, fn in [
        ("detrend only (baseline)", via(False, True, None)),
        ("detrend only + barrier", via(True, True, None)),
        ("detrend + window pre (champ)", via(False, True, "pre")),
        ("window explicit only", via(False, False, "explicit")),
        ("window explicit + barrier", via(True, False, "explicit")),
        ("bare (baseline)", via(False, False, None)),
        ("bare + barrier", via(True, False, None)),
    ]:
        ms = timeit(fn, x)
        print(f"{name:30s} {ms:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
