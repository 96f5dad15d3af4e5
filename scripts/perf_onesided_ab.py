"""End-to-end A/B after the one-sided fused routing + direct-prune plan:

1. flagship two-sided PSD (detrend+hann)     — must hold ~20.5 ms
2. Welch two-sided PSD (1024^2 hann segs)    — was 34.8 ms
3. Welch one-sided PSD (real_dim=x)          — was 58.5 ms
4. unsegmented one-sided PSD (window only)   — was 25.6 ms

Usage: python scripts/perf_onesided_ab.py
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

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    B, N, S = 8, 4096, 1024
    rng = np.random.RandomState(0)
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32), dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    da_w = da.chunk({"y": S, "x": S})
    x = da.data

    def flagship(xx):
        return xrft_tpu.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], window="hann",
            detrend="linear").data

    def welch2(xx):
        return xrft_tpu.power_spectrum(
            da_w.copy(data=xx), dim=["y", "x"], window="hann",
            chunks_to_segments=True).data

    def welch1(xx):
        return xrft_tpu.power_spectrum(
            da_w.copy(data=xx), dim=["y", "x"], real_dim="x",
            window="hann", chunks_to_segments=True).data

    def onesided(xx):
        return xrft_tpu.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], real_dim="x",
            window="hann").data

    for name, f in [("flagship two-sided (hold ~20.5)", flagship),
                    ("welch two-sided    (was 34.8)", welch2),
                    ("welch one-sided    (was 58.5)", welch1),
                    ("one-sided window   (was 25.6)", onesided)]:
        print(f"{name}: {timeit(f, x):7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
