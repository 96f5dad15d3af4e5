"""A/B: current restore+mirror (reverse on the minor axis of the restored
one-sided array) vs the raw-digit mirror (lax.rev on the raw layout's
mostly-major digit dims + a second restore reshape) on the flagship PSD.

MEASURED RESULT (v5e, round 3): NET LOSS — 24.39 vs 20.70 ms/iter at
bit-exact parity.  XLA does NOT fuse the rev + transpose-reshape chain
into the mirror concat's output fusion: the second restore materializes
a full extra engine-width intermediate (~272 MB round trip) and the
mirror still pays its gather, so reading the mirror tail from raw digits
costs MORE than reversing the restored array's minor axis.  Kept as the
measured justification for leaving the HLO reverse mirror in place
(ROADMAP #1; the round-2 Pallas kernel was the other negative result).

Usage: python scripts/perf_mirror_raw.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


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
    kwargs = {"window": "hann", "detrend": "linear"}
    scale = np.float32((0.5 * 0.5) ** 2 * (1.0 / (N * 0.5)) ** 2)

    def full_current(xx):
        return spectra.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], **kwargs).data

    def full_rawmirror(xx):
        re, im, layout, ctx = psd_fused._fused_raw_rfft(
            da.copy(data=xx), ["y", "x"], "x", True, kwargs)
        psd = (re * re + im * im) * scale
        order = [ctx["newdims"].index(d) for d in ctx["orig_dims"]]
        S = stacked_fft.raw_to_standard(psd, layout, axis_order=order)
        m = N // 2 + 1
        xpos = stacked_fft._axis_dig_positions(layout, layout.prune_axis)
        other = [a for a in layout.order if a != layout.prune_axis]
        ypos = sum((stacked_fft._axis_dig_positions(layout, a)
                    for a in other), [])
        t = lax.rev(psd, tuple(xpos + ypos))
        T = stacked_fft.raw_to_standard(t, layout, axis_order=order,
                                        prune_slice=False)
        W = T.shape[-1]
        h = N // 2
        yax = 1
        # shift=True, even N pieces: [S[h], T-tail rolled, S[:h]]
        # mirrored run src cols descending h-1 .. 1; T[j] = S_pad[W-1-j],
        # so the ascending-j slice [W-h, W-1) reads them in run order
        j0 = W - 1 - (h - 1)
        j1 = W - 1 - 1 + 1
        tail = jnp.roll(T[..., j0:j1], 1, axis=yax)
        return jnp.concatenate([S[..., h:h + 1], tail, S[..., :h]], axis=-1)

    ms_cur = timeit(full_current, x)
    print(f"current full PSD        {ms_cur:7.2f} ms/iter")
    ms_new = timeit(full_rawmirror, x)
    print(f"raw-digit mirror PSD    {ms_new:7.2f} ms/iter")

    # parity spot check (f32 tolerances)
    a = np.asarray(jax.jit(full_current)(x))
    b = np.asarray(jax.jit(full_rawmirror)(x))
    print("rel err:", np.abs(a - b).max() / np.abs(a).max())


if __name__ == "__main__":
    main()
