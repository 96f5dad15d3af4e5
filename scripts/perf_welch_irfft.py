"""Reconcile the round-2 interactive claims for the Welch and irfft
flagships with driver-reproducible numbers (VERDICT r2 item 3).

Welch: the 34.8 ms claim predates commit b9ba4de, which rebalanced
plan(1024) from (8, 128) to (32, 32) to fix a 16x-padded epilogue OOM on
the NON-raw segmented path — possibly regressing the fused raw route
nobody re-measured.  This sweeps the 1024 plan on the segmented
flagship.

irfft: the 27 ms claim's coordinate convention is unrecorded; compare
fftshifted (the forward flagship's shift=True output) vs natural-order
freq_y coords.

Usage: python scripts/perf_welch_irfft.py
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
    import xrft_tpu
    from xrft_tpu import LabeledArray
    from xrft_tpu.ops import carray, stacked_fft

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32), dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    da_w = da.chunk({"y": 1024, "x": 1024})
    x = da.data

    def welch(xx):
        return xrft_tpu.power_spectrum(
            da_w.copy(data=xx), dim=["y", "x"], window="hann",
            chunks_to_segments=True).data

    plan_orig = stacked_fft.plan

    def with_plan(p1024):
        def plan2(n, cap):
            if n == 1024:
                return p1024
            return plan_orig(n, cap)
        return plan2

    for label, p in [("(32,32) current", (32, 32)),
                     ("(8,128) pre-b9ba4de", (8, 128)),
                     ("(16,64)", (16, 64)),
                     ("(64,16)", (64, 16))]:
        stacked_fft.plan = with_plan(p)
        try:
            ms = timeit(welch, x)
            print(f"welch plan(1024)={label:22s} {ms:7.2f} ms/iter",
                  flush=True)
        finally:
            stacked_fft.plan = plan_orig

    # ---- irfft variants
    from xrft_tpu.ops import carray as _car

    M = N // 2 + 1
    re0 = jnp.asarray(rng.randn(B, N, M).astype(np.float32))

    def irfft_with(freq_y):
        half = LabeledArray(
            jnp.zeros((B, N, M), np.float32),
            dims=("time", "freq_y", "freq_x"),
            coords={"freq_y": freq_y, "freq_x": np.fft.rfftfreq(N, 0.5)})

        def f(xx):
            daft = half.copy(data=_car.ComplexPair(xx, xx * 0.3))
            out = xrft_tpu.ifft(daft, dim=["freq_y", "freq_x"],
                                real_dim="freq_x", shift=False, lag=None,
                                true_phase=False, true_amplitude=False)
            return jnp.sum(out.data)
        return f

    ms = timeit(irfft_with(np.fft.fftshift(np.fft.fftfreq(N, 0.5))), re0)
    print(f"irfft2 shifted freq_y coords    {ms:7.2f} ms/iter", flush=True)
    ms = timeit(irfft_with(np.fft.fftfreq(N, 0.5)), re0)
    print(f"irfft2 natural freq_y coords    {ms:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
