"""Measure the convolve method='direct' vs 'fft' crossover on-chip.

The direct method is ONE lax.conv_general_dilated (MXU-native: the
systolic array contracts the kernel window at full rate) whose cost
grows with kernel area; the fft method is three padded engine
transforms (8192^2 for a 4096^2 field) whose cost is k-independent.
This script times both on a 4096^2 f32 field over a kernel-size sweep
and reports the crossover in kernel elements — the value that
``config.direct_conv_max`` (xrft_tpu/config.py) should carry.

Usage: python scripts/perf_conv_direct.py        (runs on the default
backend = the real chip here; add JAX_PLATFORMS=cpu etc. to rehearse)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, x, iters=4):
    """ms/iter via the house fori_loop delta (amortizes the ~25 ms
    per-call tunnel RPC; forced scalar transfer, never bare
    block_until_ready — see CLAUDE.md)."""
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

    n = int(os.environ.get("CONV_N", 4096))  # CPU rehearsal: CONV_N=256
    ks = tuple(int(s) for s in os.environ.get(
        "CONV_KS", "15,31,63,95,127,191,255").split(","))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, n).astype(np.float32))

    rows = []
    crossover = None
    for k in ks:
        kern = LabeledArray(rng.randn(k, k).astype(np.float32),
                            dims=["y", "x"])

        def run(meth):
            def f(xx):
                da = LabeledArray(xx, dims=["y", "x"])
                return xrft_tpu.convolve(da, kern, mode="same",
                                         method=meth).data
            return timeit(f, x)

        t_dir = run("direct")
        t_fft = run("fft")
        rows.append({"k": k, "kernel_elems": k * k,
                     "direct_ms": round(t_dir, 2),
                     "fft_ms": round(t_fft, 2)})
        print(json.dumps(rows[-1]), flush=True)
        if t_dir > t_fft and crossover is None:
            crossover = k * k
    # MACs/s the direct route sustains at the largest still-winning size
    win = [r for r in rows if r["direct_ms"] <= r["fft_ms"]]
    tput = None
    if win:
        r = win[-1]
        tput = n * n * r["kernel_elems"] / (r["direct_ms"] * 1e-3) / 1e12
    out = {
        "metric": "conv_direct_crossover_kernel_elems",
        "rows": rows,
        "crossover_kernel_elems": crossover,
        "direct_tmacs_at_best": round(tput, 2) if tput else None,
        "recommended_direct_conv_max": (crossover - 1) if crossover
        else rows[-1]["kernel_elems"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
