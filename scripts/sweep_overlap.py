"""Sweep ``config.pencil_overlap_chunks`` on the virtual 8-device mesh.

For each chunk count this measures (a) the number of all_to_all
collectives in the jaxpr (must equal the chunk count per sharded axis —
the dataflow the overlap knob creates) and (b) wall time of the jitted
sharded FFT on the virtual CPU mesh.  The CPU backend executes
collectives as memcpy and cannot show real ICI latency hiding, so the
wall numbers bound the knob's *overhead* (per-chunk dispatch, smaller
FFT batches) rather than its benefit; on a real slice the benefit term
is AccFFT-style pipelining of chunk i's collective with chunk i-1's FFT.
Run on real multi-chip hardware before trusting a nondefault setting.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/sweep_overlap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    from xrft_tpu.config import config
    from xrft_tpu.ops import carray
    from xrft_tpu.parallel import make_mesh, pencil_fftn

    if len(jax.devices()) < 8:
        sys.exit("need 8 devices (see usage in the module docstring)")

    mesh = make_mesh({"p": 8})
    rng = np.random.RandomState(0)
    # one sharded transform axis, a large batch axis to chunk over
    B, N, M = 256, 512, 64
    x = jax.device_put(np.asarray(rng.randn(B, N, M), np.float32))

    ref = None
    print(f"{'chunks':>6} {'all_to_all':>10} {'wall_ms':>8}  parity")
    for k in (1, 2, 4, 8, 16):
        old = config.pencil_overlap_chunks
        config.pencil_overlap_chunks = k
        try:
            def f(v):
                return pencil_fftn(v, [1], mesh, {1: "p"}, "fft")

            txt = str(jax.make_jaxpr(f)(x))
            n_coll = txt.count("all_to_all")
            g = jax.jit(lambda v: carray.real(f(v)).sum()
                        + carray.imag(f(v)).sum())
            float(g(x))  # compile
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                float(g(x))
                best = min(best, time.perf_counter() - t0)
            got = carray.to_numpy(f(x))
            if ref is None:
                ref = np.fft.fft(np.asarray(x, np.float64), axis=1)
            err = np.abs(got - ref).max() / np.abs(ref).max()
            print(f"{k:>6} {n_coll:>10} {best * 1e3:>8.2f}  {err:.1e}")
        finally:
            config.pencil_overlap_chunks = old


if __name__ == "__main__":
    main()
