"""Radix-plan sweep for the STACKED engine on the flagship PSD.

config.direct_dft_max was swept in round 1 against the PAIR engine
(78 ms era); the stacked engine's tiling preferences may differ:
  cap 64  -> plan(4096) = (64, 64)    merged final dim 128
  cap 128 -> plan(4096) = (32, 128)   merged final dim 256 (current)
  cap 256 -> plan(4096) = (64, 64)    (balanced; same as 64)
  cap 512 -> plan(4096) = (8, 512)->(64,64) balanced

Also probes one XLA flag pair via a subprocess note: flags must be set
before backend init, so flag experiments run this script under different
XLA_FLAGS env values.

Usage: python scripts/perf_radix_sweep.py
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
    from xrft_tpu import LabeledArray, spectra
    from xrft_tpu.config import config
    from xrft_tpu.ops import stacked_fft

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32), dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    x = da.data

    ref = None
    for cap in (64, 128, 256):
        old = config.direct_dft_max
        config.direct_dft_max = cap
        try:
            plan = stacked_fft.plan(N, cap)

            def f(xx):
                return spectra.power_spectrum(
                    da.copy(data=xx), dim=["y", "x"], window="hann",
                    detrend="linear").data
            ms = timeit(f, x)
            v = np.asarray(jax.jit(lambda xx: f(xx)[:, :8, :8])(x))
            if ref is None:
                ref = v
            err = np.abs(v - ref).max() / np.abs(ref).max()
            print(f"cap {cap:4d} plan {plan}  {ms:7.2f} ms/iter  "
                  f"(corner err {err:.1e})", flush=True)
        finally:
            config.direct_dft_max = old


if __name__ == "__main__":
    main()
