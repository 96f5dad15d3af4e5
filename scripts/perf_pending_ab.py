"""Pending on-chip A/Bs batched into one session:

1. irfft2 with natural-order freq_y coords — sortby's cyclic-roll
   detection replaces a 537 MB gather (was measured 'natural' >> the
   pre-sorted case before the fix).
2. direct-prune sweep at 2048-size prune axes (should
   config.direct_prune_max extend to 2048?).
3. segment_overlap cost on the Welch flagship: 50% overlap processes
   ~2x the samples on the overlapped axis — is the slice-stack
   bandwidth-bound (expect <= ~2x the no-overlap time), and what does
   the 8x4096^2 one-sided Welch PSD cost at 0 vs 50% overlap?

Usage: python scripts/perf_pending_ab.py
"""

import os
import sys
import time
import warnings

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
    from xrft_tpu import config as cfg
    from xrft_tpu.ops import carray as _car
    from xrft_tpu.ops import stacked_fft

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
    warnings.simplefilter("ignore")

    # ---- 1. natural-order irfft (sortby roll fast path)
    B, N = 8, 4096
    M = N // 2 + 1
    rng = np.random.RandomState(0)
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

    ms_sorted = timeit(irfft_with(np.fft.fftshift(np.fft.fftfreq(N, 0.5))),
                       re0)
    print(f"irfft2 shifted freq_y (sortby no-op): {ms_sorted:7.2f} ms",
          flush=True)
    ms_nat = timeit(irfft_with(np.fft.fftfreq(N, 0.5)), re0)
    print(f"irfft2 natural freq_y (sortby=roll):  {ms_nat:7.2f} ms",
          flush=True)
    del re0

    # ---- 2. direct-prune at 2048
    shape = (2048, 2, 2, 8, 2048)
    axis_order = (3, 1, 0, 2, 4)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))

    def with_restore(xx):
        a, layout = stacked_fft.fft_nd_stacked(xx, (0, 4), "rfft", raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        ps = re * re + im * im
        out = stacked_fft.raw_to_standard(ps, layout, axis_order=axis_order)
        return jnp.sum(out)

    from xrft_tpu.config import config as _config

    for label, cap in [("factorized (16,128)", 1024), ("direct 2048", 2048)]:
        old = _config.direct_prune_max
        _config.direct_prune_max = cap
        try:
            ms = timeit(with_restore, x)
            print(f"2048-seg prune plan {label}: {ms:7.2f} ms/iter",
                  flush=True)
        finally:
            _config.direct_prune_max = old
    del x

    # ---- 3. segment_overlap on the one-sided Welch flagship
    B2, N2, SEG = 8, 4096, 1024
    xw = jnp.asarray(rng.randn(B2, N2, N2).astype(np.float32))

    base = LabeledArray(
        jnp.zeros((B2, N2, N2), np.float32),  # device zeros: no 512 MB
        dims=("time", "y", "x"),              # host->device transfer
        coords={"y": np.arange(N2) * 0.5, "x": np.arange(N2) * 0.5},
    ).chunk({"y": SEG, "x": SEG})

    def welch_with(overlap):

        def f(xx):
            da = base.copy(data=xx)
            ps = xrft_tpu.power_spectrum(
                da, dim=["y", "x"], real_dim="x", window="hann",
                chunks_to_segments=True, segment_overlap=overlap)
            return jnp.sum(ps.data)
        return f

    for overlap, label in [(None, "overlap 0 "), (SEG // 2, "overlap 50%")]:
        ms = timeit(welch_with(overlap), xw, iters=4)
        print(f"one-sided Welch flagship {label}: {ms:7.2f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
