"""On-chip A/B experiments for the fused PSD's remaining memory passes.

Variants of the flagship 8x4096x4096 windowed+detrended PSD, each timed
by chained-loop differencing and itemized by the HLO pass census.  The
conclusions drive psd_fused/stacked_fft layout choices; negative results
are recorded in comments there.

Usage: python scripts/perf_psd_variants.py [variant ...]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def census(compiled, min_gb=0.2):
    out = []
    inentry = False
    for line in compiled.as_text().splitlines():
        if re.match(r"ENTRY ", line):
            inentry = True
            continue
        if inentry:
            if line.strip() == "}":
                break
            m = re.match(r"\s*%?[\w.-]+ = (\S+)\[([\d,]*)\]", line)
            if not m:
                continue
            shp = [int(s) for s in m.group(2).split(",") if s]
            size = int(np.prod(shp)) * 4 if shp else 0
            if size < min_gb * 1e9:
                continue
            rhs = line.split("=", 1)[1]
            km = re.search(r"\]\S*\s+(\w+)\(", rhs)
            out.append((size / 1e9, km.group(1) if km else "?", m.group(2)))
    return out


def timeit(fn, x, iters=6):
    """Per-iteration device time via chained-loop differencing."""
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
    from xrft_tpu import LabeledArray
    from xrft_tpu import spectra

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    data = rng.randn(B, N, N).astype(np.float32)

    def pipeline(dims_order):
        """PSD with the input pre-permuted to dims_order (metadata-only:
        the fused path restores the caller's order in its epilogue)."""
        perm = [("time", "y", "x").index(d) for d in dims_order]
        arr = np.ascontiguousarray(data.transpose(perm))
        da = LabeledArray(
            arr, dims=dims_order,
            coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})

        def f(x):
            return spectra.power_spectrum(
                da.copy(data=x), dim=["y", "x"], window="hann",
                detrend="linear").data
        return f, da.data

    variants = {
        "tyx": ("time", "y", "x"),
        "ytx": ("y", "time", "x"),
    }
    sel = sys.argv[1:] or list(variants)
    for name in sel:
        f, x = pipeline(variants[name])
        comp = jax.jit(f).lower(x).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gb = ca.get("bytes accessed", 0.0) / 1e9
        ms = timeit(f, x)
        print(f"== {name}: {ms:.2f} ms/iter, {gb:.2f} GB")
        for g, kind, shape in census(comp):
            print(f"   {g:5.2f} GB  {kind:12s} [{shape}]")


if __name__ == "__main__":
    main()
