"""Flagship byte ledger (VERDICT r4 item 7): decompose the issued bytes
and the measured ms pass-by-pass, so the roofline percentage is
arithmetic anyone can audit.

For each progressive composition of the flagship two-sided PSD
(8 x 4096^2, hann + linear detrend) this measures

  - XLA cost-analysis "bytes accessed" of the compiled program,
  - chained-loop ms/iter (the bench discipline),
  - the effective bandwidth each stage's DELTA implies,

and prints one JSON document plus a markdown table (paste target:
BASELINE.md "byte ledger").  The min-traffic model rows come from the
analytic model documented in BASELINE.md round 3 (read input + write
two-sided PSD + 2 split-complex r/w passes per FFT axis = 9.66 GB).

Usage: python scripts/byte_ledger.py          (on the chip, ~3 min)
       XRFT_SMOKE=1 ... (CPU plumbing check at tiny shapes)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SMOKE = bool(os.environ.get("XRFT_SMOKE"))


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
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    return (wall(fk) - wall(f1)) / (iters - 1)


def issued_bytes(fn, x):
    """XLA cost-analysis bytes accessed of the single-call program."""
    try:
        c = jax.jit(fn).lower(x).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed", float("nan")))
    except Exception as e:  # tunnelled backends may hide cost analysis
        print(f"  (cost analysis unavailable: {type(e).__name__}: {e})",
              file=sys.stderr)
        return float("nan")


def main():
    from xrft_tpu import LabeledArray, spectra
    from xrft_tpu.ops import psd_fused, stacked_fft

    B, N = (2, 256) if SMOKE else (8, 4096)
    rng = np.random.RandomState(0)
    data = rng.randn(B, N, N).astype(np.float32)
    da = LabeledArray(
        data, dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    x = da.data

    # ---- progressive stage compositions (each includes the previous)
    def stream(xx):  # the ceiling control: same input footprint, no dots
        return xx * 1.0000001 + 0.1

    def raw_psd(xx):  # engine dots + fused |F|^2, raw layout, no restore
        xt = jnp.swapaxes(xx, 0, 1)
        a, layout = stacked_fft.fft_nd_stacked(
            jax.lax.optimization_barrier(xt), [0, 2], "rfft", (), (0,),
            raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return re * re + im * im

    def one_sided_bare(xx):  # + raw->standard restore (no pre-ops)
        out, _ = psd_fused.fused_one_sided_psd(
            da.copy(data=xx), ["y", "x"], "x", True, 1.0, {})
        return out.data

    def one_sided(xx):  # + detrend + window
        out, _ = psd_fused.fused_one_sided_psd(
            da.copy(data=xx), ["y", "x"], "x", True, 1.0,
            {"window": "hann", "detrend": "linear"})
        return out.data

    def full(xx):  # + Hermitian mirror -> two-sided flagship
        return spectra.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], window="hann",
            detrend="linear").data

    stages = [
        ("stream control (ceiling)", stream),
        ("raw engine + |F|^2", raw_psd),
        ("+ restore (one-sided, bare)", one_sided_bare),
        ("+ detrend + window", one_sided),
        ("+ Hermitian mirror (two-sided)", full),
    ]

    rows = []
    for name, f in stages:
        gb = issued_bytes(f, x) / 1e9
        ms = timeit(f, x)
        rows.append({"stage": name, "issued_gb": round(gb, 3),
                     "ms": round(ms, 2)})
        print(f"{name:34s} issued {gb:7.2f} GB   {ms:7.2f} ms/iter",
              file=sys.stderr)

    # ---- analytic min-traffic model: bench.py's canonical round-1 model
    # (read input + write |F|^2 + 2 r/w split-complex passes per FFT
    # axis = 72 B/elem = 9.66 GB at flagship scale)
    elems = B * N * N
    inp = elems * 4
    twosided = elems * 4
    axis_passes = elems * 2 * 2 * 8  # 2 passes x (r+w) x (re+im f32)
    model = {
        "read_input_gb": inp / 1e9,
        "per_axis_rw_gb": axis_passes / 1e9,
        "axes": 2,
        "write_twosided_gb": twosided / 1e9,
        "min_total_gb": (inp + 2 * axis_passes + twosided) / 1e9,
    }

    # ---- ledger: per-pass deltas vs the stage below it
    ledger = []
    for i in range(1, len(rows)):
        d_gb = rows[i]["issued_gb"] - rows[i - 1]["issued_gb"]
        d_ms = rows[i]["ms"] - rows[i - 1]["ms"]
        bw = (d_gb / (d_ms / 1e3)) if d_ms > 0 else float("nan")
        ledger.append({"pass": rows[i]["stage"],
                       "delta_gb": round(d_gb, 2),
                       "delta_ms": round(d_ms, 2),
                       "delta_gbps": round(bw, 0) if bw == bw else None})

    out = {"backend": jax.devices()[0].platform, "smoke": SMOKE,
           "stages": rows, "model": model, "ledger": ledger}
    print(json.dumps(out))

    # markdown table for BASELINE.md
    print("\n| Stage (cumulative) | issued GB | ms/iter | Δ GB | Δ ms | Δ eff GB/s |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for i, r in enumerate(rows):
        if i == 0:
            print(f"| {r['stage']} | {r['issued_gb']} | {r['ms']} | — | — | — |",
                  file=sys.stderr)
        else:
            led = ledger[i - 1]
            print(f"| {r['stage']} | {r['issued_gb']} | {r['ms']} | "
                  f"{led['delta_gb']} | {led['delta_ms']} | "
                  f"{led['delta_gbps']} |", file=sys.stderr)


if __name__ == "__main__":
    main()
