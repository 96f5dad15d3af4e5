"""In-context A/B for the Pallas level-0 dot route (round 5).

FLOOR_r05 fired: on this toolchain the ISOLATED packed level-0 dot runs
5.18 ms under XLA vs 4.19 under Pallas (the round-4 recordings had them
at parity, 3.63/3.57).  The floor instrument's decision rule says "wire
pallas_dot in as an engine level" — but the round-4 in-situ barrier
harness showed fusion context, not the isolated dot, decides the win,
and the fused production legs did NOT regress (stacked 21.33 vs 21.3).

This script settles it the only honest way: the REAL flagship PSD
program (8 x 4096^2, hann + linear detrend) with the engine's level-0
real dot routed through
  - lax.dot_general            (production, config.pallas_level0='never')
  - the Pallas kernel, unpacked ('unpacked': (2k, j) x (j, cols) at the
    engine's own layout modulo the j-major transpose)
  - the Pallas kernel, packed  ('packed': G=4 block-diag K=128/M=256,
    the isolated-A/B-winning MXU shape, + input/output relayouts)
with the bench discipline (chained-loop differencing, min over reps).

Usage: python scripts/perf_pallas_inctx.py        (on the chip, ~4 min)
       XRFT_SMOKE=1 ...                           (CPU plumbing check)
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


def main():
    from xrft_tpu import LabeledArray, spectra
    from xrft_tpu.config import config

    B, N = (2, 2048) if SMOKE else (8, 4096)
    rng = np.random.RandomState(0)
    data = rng.randn(B, N, N).astype(np.float32)
    da = LabeledArray(
        data, dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    x = da.data

    def flagship(xx):
        return spectra.power_spectrum(
            da.copy(data=xx), dim=["y", "x"], window="hann",
            detrend="linear").data

    suffix = "_interpret" if SMOKE and jax.default_backend() == "cpu" \
        else ""
    out = {"backend": jax.devices()[0].platform, "smoke": SMOKE}
    vals = {}
    for mode in ("never", "unpacked" + suffix, "packed" + suffix):
        config.pallas_level0 = mode
        try:
            # numeric pin first: the route must be bit-compatible
            # (jitted — eager mode through the tunnel is one RPC per op)
            s = float(jax.jit(lambda xx: jnp.sum(flagship(xx)))(x))
            out[f"checksum_{mode}"] = s
            ms = timeit(flagship, x)
        except Exception as e:
            out[f"error_{mode}"] = f"{type(e).__name__}: {e}"[:300]
            continue
        finally:
            config.pallas_level0 = "never"
        key = mode.replace("_interpret", "")
        vals[key] = ms
        out[f"psd_{key}_ms"] = round(ms, 2)
        print(f"pallas_level0={mode:12s} flagship {ms:7.2f} ms/iter",
              file=sys.stderr)

    if "never" in vals:
        best = min(vals, key=vals.get)
        win = vals["never"] - vals[best]
        out["verdict"] = (
            f"{best} wins by {win:.2f} ms"
            if best != "never" and win > 0.3
            else "dot_general holds in context — keep 'never' default")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
