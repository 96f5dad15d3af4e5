"""Additive-cost A/B for the fused PSD's pieces (round-2 perf work).

Times the flagship two-sided PSD and ablations (no mirror / no detrend /
no window / bare rfft2) with chained-loop differencing, to attribute the
per-iteration device time to pipeline stages under the CURRENT code.

Usage: python scripts/perf_psd_stages.py
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
    from xrft_tpu.ops import psd_fused, stacked_fft

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    data = rng.randn(B, N, N).astype(np.float32)
    da = LabeledArray(
        data, dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    x = da.data

    def run(name, f):
        ms = timeit(f, x)
        print(f"{name:38s} {ms:7.2f} ms/iter")
        return ms

    def full(xx):
        return spectra.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], window="hann",
            detrend="linear").data

    def one_sided(xx):
        # fused path up to (and incl.) raw->standard, no Hermitian mirror
        out, _ = psd_fused.fused_one_sided_psd(
            da.copy(data=xx), ["y", "x"], "x", True, 1.0,
            {"window": "hann", "detrend": "linear"})
        return out.data

    def no_detrend(xx):
        return spectra.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], window="hann").data

    def no_window(xx):
        return spectra.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], detrend="linear").data

    def raw_only(xx):
        # engine alone in the preferred layout: y-major input
        xt = jnp.swapaxes(xx, 0, 1)
        a, layout = stacked_fft.fft_nd_stacked(
            jax.lax.optimization_barrier(xt), [0, 2], "rfft", (), (0,),
            raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return re * re + im * im

    run("full two-sided PSD", full)
    run("one-sided (no mirror)", one_sided)
    run("no detrend", no_detrend)
    run("no window", no_window)
    run("raw engine + |.|^2 (no restore)", raw_only)


if __name__ == "__main__":
    main()
