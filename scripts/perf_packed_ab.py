"""A/B the packed two-sided PSD route (ops/psd_packed.py) against the
one-sided fused + mirror route on the flagship, in one chip session.

Usage: python scripts/perf_packed_ab.py
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

    # quick health probe (the tunnel hangs for minutes at a time)
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32), dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    x = da.data

    def run_mode(mode):
        old = config.psd_packed
        config.psd_packed = mode
        try:
            def f(xx):
                return spectra.power_spectrum(
                    da.copy(data=xx), dim=["y", "x"], window="hann",
                    detrend="linear").data
            ms = timeit(f, x)
            val = np.asarray(jax.jit(lambda xx: f(xx)[:, :8, :8])(x))
            return ms, val
        finally:
            config.psd_packed = old

    ms_cur, v_cur = run_mode("never")
    print(f"one-sided fused + mirror   {ms_cur:7.2f} ms/iter", flush=True)
    ms_new, v_new = run_mode("auto")
    print(f"packed two-sided           {ms_new:7.2f} ms/iter", flush=True)
    print("corner rel err:",
          np.abs(v_cur - v_new).max() / np.abs(v_cur).max())


if __name__ == "__main__":
    main()
