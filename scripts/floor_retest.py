"""Standing toolchain floor-retest instrument (VERDICT r4 item 2).

The repo's perf north star (>70% of the 819 GB/s HBM spec on the flagship
PSD) was adjudicated toolchain-bound in round 4 by a four-legged measured
proof spread across scripts/perf_pallas_dot.py, perf_pallas_fftfuse.py,
perf_radix_sweep.py and bench.py's streaming control (BASELINE.md "Round
4: the floor hypothesis TESTED").  This script re-runs the decisive leg
of each experiment in ONE command and emits ONE JSON verdict, so any
toolchain/runtime update mechanically re-adjudicates the target instead
of resting on stale session numbers:

  1. stream   — non-dot elementwise roundtrip at the flagship footprint:
                the practical streaming ceiling (recorded 556 GB/s).
  2. dot      — the engine's hottest dot, XLA emitter vs the Pallas fold
                kernel on the identical packed K=128 layout (recorded
                parity: 3.6x vs 3.6x ms/iter; Pallas beating XLA by >8%
                means the emitter floor moved).
  3. fusedfft — composed stacked engine vs the fused Pallas four-step
                kernel on the flagship's hot complex axis (recorded
                21.3 vs 34.8 ms/iter; fused beating stacked means
                inter-stage HBM traffic became recoverable).
  4. radix    — the flagship windowed+detrended PSD under direct_dft_max
                caps {64, 128, 256} (recorded: cap-128 plan (32,128)
                best); another cap winning by >5% means re-tune the plan.

Verdict: "floor stands" when every leg is within tolerance of the
round-4 recording; otherwise "floor moved, re-tune" with per-leg
reasons.  Either way the JSON carries every measurement so the drift is
auditable.

Usage:  python scripts/floor_retest.py           (on the chip, ~5 min)
        XRFT_SMOKE=1 python scripts/floor_retest.py   (CPU plumbing check)

Referenced from BASELINE.md (floor analysis) and ROADMAP.md #1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

SMOKE = bool(os.environ.get("XRFT_SMOKE"))

# round-4 on-chip recordings (BASELINE.md) and drift tolerances
RECORDED = {
    "stream_gbps": 556.0,
    "dot_xla_ms": 3.63,
    "dot_pallas_ms": 3.57,
    "fft_stacked_ms": 21.3,
    "fft_fused_ms": 34.8,
    "psd_cap128_ms": 21.0,
}
STREAM_MOVED_FACTOR = 1.10   # ceiling >10% above recording: re-tune
DOT_PALLAS_WIN = 0.92        # pallas < 0.92x XLA: emitter floor moved
FUSED_WIN = 1.00             # fused < stacked: fusion became a win
RADIX_WIN = 0.95             # another cap <0.95x current: re-plan


def chain(fn, x, iters=10, reps=3):
    """Per-iteration wall time of x -> fn(x) self-chained k times, forced
    by a scalar transfer (block_until_ready is unreliable on this
    runtime — CLAUDE.md)."""
    def loop(k):
        def body(_, xx):
            return fn(xx)

        def run(xx):
            out = lax.fori_loop(0, k, body, xx)
            return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))
        return jax.jit(run)

    f1, fk = loop(1), loop(iters)
    float(f1(x)); float(fk(x))

    def wall(f):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    return (wall(fk) - wall(f1)) / (iters - 1)


def sum_chain(fn, x, iters=8, reps=3):
    """Chained loop where fn's output reduces to a scalar feeding a tiny
    input perturbation (for pipelines whose output shape != input)."""
    def loop(k):
        def body(_, carry):
            s, xx = carry
            s2 = jnp.sum(fn(xx))
            return s + s2, xx + s2 * 1e-38

        def run(xx):
            s, _ = lax.fori_loop(0, k, body, (jnp.float32(0.0), xx))
            return s
        return jax.jit(run)

    f1, fk = loop(1), loop(iters)
    float(f1(x)); float(fk(x))

    def wall(f):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    return (wall(fk) - wall(f1)) / (iters - 1)


def leg_stream(out):
    """1. streaming ceiling: non-foldable elementwise roundtrip at the
    flagship footprint (bench.py's control, recorded 556 GB/s)."""
    B, N = (2, 256) if SMOKE else (8, 4096)
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, N).astype(np.float32))
    ms = chain(lambda v: v + jnp.abs(v) * 1e-39, x)
    out["stream_ms"] = round(ms, 2)
    out["stream_gbps"] = round(2 * B * N * N * 4 / ms * 1e-6, 1)


def leg_dot(out):
    """2. hottest-dot A/B: XLA fold vs Pallas fold kernel on the packed
    K=128/M=256 layout (perf_pallas_dot.py legs B2/C2)."""
    from xrft_tpu.ops.matmul_fft import _dft_matrix_np
    from xrft_tpu.ops import pallas_dot

    B = 2 if SMOKE else 8
    R1, M1 = 32, 128
    R = R1 * M1 * B
    G = 4
    N2 = R // G * M1
    wc = _dft_matrix_np(R1, -1)
    W = np.stack([wc.real, wc.imag]).astype(np.float32)
    Wbd = np.zeros((G * 2 * R1, G * R1), np.float32)
    for g in range(G):
        Wbd[g * 2 * R1:(g + 1) * 2 * R1, g * R1:(g + 1) * R1] = \
            W.reshape(2 * R1, R1)
    WB = jnp.asarray(Wbd)
    XB = jnp.asarray(np.random.RandomState(1).randn(G * R1, N2)
                     .astype(np.float32))

    def fold_xla(xx):
        y = lax.dot_general(WB, xx, (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST)
        return y[:G * R1] + 1e-38 * y[G * R1:]

    out["dot_xla_ms"] = round(chain(fold_xla, XB, iters=12), 2)
    best = None
    for tc in ([2048] if SMOKE else [2048, 4096]):
        try:
            f = pallas_dot.make_dot_fold_kernel(WB, N2, tile_cols=tc,
                                                interpret=SMOKE)
            ms = chain(f, XB, iters=12)
            best = ms if best is None else min(best, ms)
        except Exception as e:  # leg failure = inconclusive, not a verdict
            out.setdefault("dot_pallas_errors", []).append(
                f"tc={tc}: {type(e).__name__}: {e}"[:120])
    if best is not None:
        out["dot_pallas_ms"] = round(best, 2)
        # numerics guard: the comparison is void if the kernel is wrong
        f = pallas_dot.make_dot_fold_kernel(WB, N2, tile_cols=2048,
                                            interpret=SMOKE)
        d = np.abs(np.asarray(f(XB)[:, :512]) -
                   np.asarray(fold_xla(XB)[:, :512])).max()
        out["dot_pallas_absdiff"] = float(d)


def leg_fusedfft(out):
    """3. fused-FFT A/B: stacked engine vs the best fused Pallas variant
    on the flagship's hot complex axis (perf_pallas_fftfuse.py)."""
    from xrft_tpu.ops.carray import ComplexPair
    from xrft_tpu.ops.stacked_fft import fft_nd_stacked
    from xrft_tpu.ops import pallas_fft

    rows = 512 if SMOKE else 32768
    n = 1024 if SMOKE else 4096
    rng = np.random.RandomState(2)
    z = ComplexPair(jnp.asarray(rng.randn(rows, n).astype(np.float32)),
                    jnp.asarray(rng.randn(rows, n).astype(np.float32)))
    inv = np.float32(1.0 / np.sqrt(n))

    def scale(p):
        return ComplexPair(p.re * inv, p.im * inv)

    out["fft_stacked_ms"] = round(
        chain(lambda p: scale(fft_nd_stacked(p, [-1], "fft")), z), 2)
    fs = pallas_fft._balanced_factors(n)
    try:
        f = lambda p: scale(pallas_fft.pallas_fft_last(
            p, -1, interpret=SMOKE or None, factors=fs,
            row_block=8 if SMOKE else 16, variant="dg"))
        out["fft_fused_ms"] = round(chain(f, z), 2)
    except Exception as e:
        out["fft_fused_error"] = f"{type(e).__name__}: {e}"[:160]


def leg_radix(out):
    """4. radix headline: flagship PSD under caps {64,128,256}
    (perf_radix_sweep.py).  Cap 128 -> plan (32,128) is the production
    recording."""
    from xrft_tpu import LabeledArray, spectra
    from xrft_tpu.config import config
    from xrft_tpu.ops import stacked_fft

    B, N = (2, 256) if SMOKE else (8, 4096)
    rng = np.random.RandomState(3)
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32), dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})

    for cap in (64, 128, 256):
        old = config.direct_dft_max
        config.direct_dft_max = cap
        try:
            plan = stacked_fft.plan(N, cap)

            def f(xx):
                return spectra.power_spectrum(
                    da.copy(data=xx), dim=["y", "x"], window="hann",
                    detrend="linear").data

            out[f"psd_cap{cap}_ms"] = round(sum_chain(f, da.data), 2)
            out[f"psd_cap{cap}_plan"] = list(plan)
        except Exception as e:
            out[f"psd_cap{cap}_error"] = f"{type(e).__name__}: {e}"[:120]
        finally:
            config.direct_dft_max = old


def adjudicate(m):
    """Apply the decision rules; returns (verdict, reasons)."""
    reasons = []
    if m.get("stream_gbps", 0) > RECORDED["stream_gbps"] * STREAM_MOVED_FACTOR:
        reasons.append(
            f"streaming ceiling {m['stream_gbps']} GB/s exceeds the "
            f"recorded {RECORDED['stream_gbps']} by >10%: the roofline "
            "denominator moved — re-run bench and re-derive the floor")
    if "dot_pallas_ms" in m and "dot_xla_ms" in m:
        if m["dot_pallas_ms"] < m["dot_xla_ms"] * DOT_PALLAS_WIN:
            reasons.append(
                f"Pallas dot {m['dot_pallas_ms']} ms beats XLA "
                f"{m['dot_xla_ms']} by >8%: the dot-emitter floor moved — "
                "run scripts/perf_pallas_inctx.py (the IN-CONTEXT A/B) "
                "before flipping config.pallas_level0: when this fired "
                "in round 5 the isolated win did NOT survive fusion "
                "context (in-context 38.87/50.39 vs 20.69 ms — see "
                "BASELINE.md round 5)")
        if m.get("dot_pallas_absdiff", 0.0) > 1e-2:
            reasons.append("Pallas fold kernel numerics drifted "
                           f"({m['dot_pallas_absdiff']:.2e}) — fix before "
                           "trusting the dot A/B")
    if "fft_fused_ms" in m and "fft_stacked_ms" in m:
        if m["fft_fused_ms"] < m["fft_stacked_ms"] * FUSED_WIN:
            reasons.append(
                f"fused Pallas FFT {m['fft_fused_ms']} ms beats the "
                f"stacked engine {m['fft_stacked_ms']}: Mosaic's DMA "
                "tiling/overlap improved — promote config.pallas_fft")
    caps = {c: m[f"psd_cap{c}_ms"] for c in (64, 128, 256)
            if f"psd_cap{c}_ms" in m}
    if 128 in caps and len(caps) > 1:
        best_cap = min(caps, key=caps.get)
        if best_cap != 128 and caps[best_cap] < caps[128] * RADIX_WIN:
            reasons.append(
                f"cap {best_cap} PSD {caps[best_cap]} ms beats cap 128 "
                f"{caps[128]} by >5%: re-tune config.direct_dft_max / "
                "the radix plan")
    return ("floor moved, re-tune" if reasons else "floor stands"), reasons


def main():
    measurements = {"backend": jax.default_backend(), "smoke": SMOKE}
    for name, leg in (("stream", leg_stream), ("dot", leg_dot),
                      ("fusedfft", leg_fusedfft), ("radix", leg_radix)):
        t0 = time.time()
        try:
            leg(measurements)
        except Exception as e:
            measurements[f"{name}_leg_error"] = \
                f"{type(e).__name__}: {e}"[:200]
        print(f"[{name} leg done in {time.time() - t0:.0f}s]",
              file=sys.stderr, flush=True)

    verdict, reasons = adjudicate(measurements)
    if SMOKE:
        verdict = "smoke (timings meaningless)"
        reasons = []
    print(json.dumps({"verdict": verdict, "reasons": reasons,
                      "recorded_r4": RECORDED, **measurements}))


if __name__ == "__main__":
    main()
