"""Benchmark: end-to-end windowed power spectral density on TPU.

Workload: the north-star configuration family (BASELINE.md) — a 4096x4096
windowed, detrended 2-D power_spectrum over a batch of fields, as one
jit-compiled program on the default backend (the real TPU chip under the
driver).  The reference publishes no timings (BASELINE.md), so
``vs_baseline`` is the speedup over the same computation executed by the
numpy/pocketfft stack the reference delegates to, measured on this host.

Prints exactly one JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <speedup>}
"""

import json
import time

import numpy as np


def main():
    import jax
    import scipy.signal as sps

    import xrft_tpu
    from xrft_tpu import LabeledArray

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    data = rng.randn(B, N, N).astype(np.float32)
    da = LabeledArray(
        data,
        dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5},
    )

    def pipeline(d):
        # reduce to a scalar on device: the float() transfer below forces
        # full execution (on the tunnelled runtime, block_until_ready does
        # not reliably block — see .claude/skills/verify/SKILL.md)
        return jax.numpy.sum(xrft_tpu.power_spectrum(
            d, dim=["y", "x"], window="hann", detrend="linear"
        ).data)

    fn = jax.jit(pipeline)
    float(fn(da))  # warmup/compile

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(da))
    t1 = time.perf_counter()
    tpu_ms = (t1 - t0) / iters * 1e3

    # numpy/pocketfft baseline: same math, one 4096^2 slice, scaled to B;
    # min of 3 runs to suppress host-load noise
    v = data[0].astype(np.float64)
    i = np.arange(N) - (N - 1) / 2
    w = sps.windows.hann(N, sym=False)

    def np_pipeline():
        vm = v - v.mean()
        sy = (vm * i[:, None]).sum(axis=0) / (i**2).sum()
        sx = (vm * i[None, :]).sum(axis=1) / (i**2).sum()
        vd = vm - i[:, None] * sy[None, :] - sx[:, None] * i[None, :]
        F = np.fft.fftshift(np.fft.fftn(vd * (w * w[:, None]))) * 0.25
        return (np.abs(F) ** 2) * (1.0 / (N * 0.5)) ** 2

    best = np.inf
    for _ in range(3):
        t2 = time.perf_counter()
        np_pipeline()
        best = min(best, time.perf_counter() - t2)
    np_ms = best * 1e3 * B

    # HBM roofline estimate: minimal traffic for the fused pipeline
    # (read input once, write |F|^2 once, plus 2 r/w complex passes per FFT
    # axis for the four-step factorization), v5e HBM BW ~819 GB/s
    elems = B * N * N
    bytes_moved = elems * (4 + 4 + 2 * 2 * 2 * 8)
    roofline_ms = bytes_moved / 819e9 * 1e3

    print(json.dumps({
        "metric": f"windowed+detrended power_spectrum {B}x{N}x{N} f32, "
                  f"end-to-end jit (roofline est {roofline_ms:.0f} ms)",
        "value": round(tpu_ms, 2),
        "unit": "ms",
        "vs_baseline": round(np_ms / tpu_ms, 2),
    }))


if __name__ == "__main__":
    main()
