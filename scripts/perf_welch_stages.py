"""Additive stage breakdown of the fused Welch flagship (8x4096^2 ->
128 x 1024^2 hann segments): where do the ~20 ms between the raw
segmented engine (14.8 ms, scripts/perf_welch_layout.py) and the full
power_spectrum (34.8 ms) go?

Usage: python scripts/perf_welch_stages.py
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
    from xrft_tpu.ops import stacked_fft

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

    def run(name, f, xx=x):
        ms = timeit(f, xx)
        print(f"{name:44s} {ms:7.2f} ms/iter", flush=True)

    # 1. full user-facing Welch PSD (two-sided)
    def welch_full(xx):
        return xrft_tpu.power_spectrum(
            da_w.copy(data=xx), dim=["y", "x"], window="hann",
            chunks_to_segments=True).data
    run("full welch power_spectrum", welch_full)

    # 2. same but one-sided (real_dim=x): no Hermitian mirror
    def welch_onesided(xx):
        return xrft_tpu.power_spectrum(
            da_w.copy(data=xx), dim=["y", "x"], real_dim="x", window="hann",
            chunks_to_segments=True).data
    run("welch one-sided (no mirror)", welch_onesided)

    # 3. fft path only (what the fused route wraps): segmented windowed rfft
    def welch_fft(xx):
        ft = xrft_tpu.fft(da_w.copy(data=xx), dim=["y", "x"], real_dim="x",
                          window="hann", chunks_to_segments=True,
                          true_phase=False, true_amplitude=True)
        d = ft.data
        return jnp.sum(d.re * d.re + d.im * d.im)
    run("segmented windowed rfft via fft()", welch_fft)

    # 4. hand-built pipeline: stack+steer+window+raw engine+|F|^2, no
    # restore/mirror/coords
    w1 = np.asarray(__import__("scipy.signal", fromlist=["signal"])
                    .windows.hann(S, sym=False), np.float32)

    def hand_raw(xx):
        v = xx.reshape(B, N // S, S, N // S, S)
        v = jnp.transpose(v, (2, 0, 1, 3, 4))       # (S, B, ys, xs, S)
        v = jax.lax.optimization_barrier(v)
        v = v * w1[:, None, None, None, None]
        v = v * w1[None, None, None, None, :]
        a, layout = stacked_fft.fft_nd_stacked(v, (0, 4), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return jnp.sum(re * re + im * im)
    run("hand: stack+steer+window+raw+|F|^2", hand_raw)

    # 5. as 4 plus restore to standard order
    def hand_restore(xx):
        v = xx.reshape(B, N // S, S, N // S, S)
        v = jnp.transpose(v, (2, 0, 1, 3, 4))
        v = jax.lax.optimization_barrier(v)
        v = v * w1[:, None, None, None, None]
        v = v * w1[None, None, None, None, :]
        a, layout = stacked_fft.fft_nd_stacked(v, (0, 4), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        ps = re * re + im * im
        out = stacked_fft.raw_to_standard(ps, layout)
        return jnp.sum(out)
    run("hand: ... + raw_to_standard", hand_restore)

    # 6. unsegmented window-only one-sided PSD for scale
    def flag_onesided(xx):
        return xrft_tpu.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], real_dim="x",
            window="hann").data
    run("unsegmented window-only one-sided", flag_onesided)


if __name__ == "__main__":
    main()
