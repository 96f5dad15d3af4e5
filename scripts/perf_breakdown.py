"""Stage-by-stage on-chip timing of the bench workload (round-2 perf work).

Times each pipeline stage as its own jit program with scalar-transfer
forcing (block_until_ready is unreliable through the tunnel), subtracting
the measured null-call RPC overhead.  Not part of the test suite; a
development tool for the roofline work (VERDICT.md round-1 item 2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda v: float(jnp.sum(v)) if hasattr(v, "dtype") else v, out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        # force: scalar transfer of a reduced value
        leaves = [v for v in jax.tree_util.tree_leaves(out) if hasattr(v, "dtype")]
        float(jnp.sum(leaves[0]) if leaves[0].ndim else leaves[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    from xrft_tpu import LabeledArray
    from xrft_tpu.ops import carray, matmul_fft
    import xrft_tpu

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    data = rng.randn(B, N, N).astype(np.float32)
    x = jnp.asarray(data)

    null = jax.jit(lambda v: jnp.sum(v[0, 0, :8]))
    t_null = timeit(null, x)
    print(f"null call (RPC+reduce overhead):     {t_null:8.2f} ms")

    # full bench pipeline
    da = LabeledArray(data, dims=("time", "y", "x"),
                      coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
    pipe = jax.jit(lambda d: jnp.sum(xrft_tpu.power_spectrum(
        d, dim=["y", "x"], window="hann", detrend="linear").data))
    t = timeit(pipe, da)
    print(f"full PSD pipeline:                   {t:8.2f} ms   (-null {t - t_null:7.2f})")

    # stages
    def s_detrend_window(v):
        i = jnp.arange(N, dtype=jnp.float32) - (N - 1) / 2
        vm = v - v.mean(axis=(-2, -1), keepdims=True)
        sy = (vm * i[:, None]).sum(axis=-2, keepdims=True) / (i**2).sum()
        sx = (vm * i[None, :]).sum(axis=-1, keepdims=True) / (i**2).sum()
        vd = vm - i[:, None] * sy - sx * i[None, :]
        w = jnp.asarray(np.hanning(N).astype(np.float32))
        return vd * (w[:, None] * w[None, :])

    t = timeit(jax.jit(lambda v: jnp.sum(s_detrend_window(v))), x)
    print(f"detrend+window only:                 {t:8.2f} ms   (-null {t - t_null:7.2f})")

    # rfft over last axis only
    rfft_last = jax.jit(lambda v: matmul_fft.matmul_fft_nd(v, [-1], "rfft"))
    t = timeit(rfft_last, x)
    print(f"rfft last axis (4096->2049):         {t:8.2f} ms   (-null {t - t_null:7.2f})")

    # y-axis complex fft on the rfft-sized array
    xc = carray.ComplexPair(
        jnp.asarray(rng.randn(B, N, N // 2 + 1).astype(np.float32)),
        jnp.asarray(rng.randn(B, N, N // 2 + 1).astype(np.float32)))
    fft_y = jax.jit(lambda v: matmul_fft_nd_axis(v))

    def matmul_fft_nd_axis(v):
        return matmul_fft.matmul_fft_nd(v, [-2], "fft")

    t = timeit(fft_y, xc)
    print(f"fft y axis (complex, 8x4096x2049):   {t:8.2f} ms   (-null {t - t_null:7.2f})")

    # moveaxis round trip alone on the same pair
    mv = jax.jit(lambda v: carray.moveaxis(carray.moveaxis(v, -2, -1) * 1.000001, -1, -2))
    t = timeit(mv, xc)
    print(f"moveaxis there+back (same pair):     {t:8.2f} ms   (-null {t - t_null:7.2f})")

    # |.|^2 + scaling
    mag = jax.jit(lambda v: v.re * v.re + v.im * v.im)
    t = timeit(mag, xc)
    print(f"|.|^2:                               {t:8.2f} ms   (-null {t - t_null:7.2f})")

    # pure HBM bandwidth probe: copy-scale of the full f32 array
    cp = jax.jit(lambda v: v * 1.000001)
    t = timeit(cp, x)
    gb = x.size * 4 * 2 / 1e9
    print(f"copy-scale {gb:.2f} GB:                  {t:8.2f} ms   (-null {t - t_null:7.2f})"
          f"  -> {gb / ((t - t_null) / 1e3):6.1f} GB/s")


if __name__ == "__main__":
    main()
