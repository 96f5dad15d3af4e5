"""Stage breakdown of the inverse flagship irfft2 8x4096x(2049->4096):
where do the 27 ms go?  Stages (ops/matmul_fft.py irfft kind):

  1. y-axis ifft on the one-sided complex pair (stacked, std epilogue)
  2. packed-irfft untangle (slices, flip, E/O/Z elementwise)
  3. half-length (2048) x ifft (stacked, std epilogue)
  4. interleave stack+reshape -> real 4096 axis

Usage: python scripts/perf_irfft_stages.py
"""

import os
import sys
import time

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
    from xrft_tpu.ops import carray, matmul_fft, stacked_fft

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((256, 256))))
    print(f"health probe: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    B, N = 8, 4096
    M = N // 2 + 1
    rng = np.random.RandomState(0)
    re0 = jnp.asarray(rng.randn(B, N, M).astype(np.float32))

    def pair(xx):
        return carray.ComplexPair(xx, xx * 0.3)

    # stage 1 only: y ifft (stacked, std epilogue), sum planes
    def s1(xx):
        z = stacked_fft.fft_nd_stacked(pair(xx), [1], "ifft")
        return jnp.sum(z.re) + jnp.sum(z.im)
    print(f"1. y-ifft (std epilogue)        {timeit(s1, re0):7.2f}",
          flush=True)

    # stages 1+2+3+4: the full irfft kind
    def sfull(xx):
        out = matmul_fft.matmul_fft_nd(pair(xx), [1, 2], "irfft")
        return jnp.sum(out)
    print(f"full irfft2                     {timeit(sfull, re0):7.2f}",
          flush=True)

    # stages 2-4 alone: packed irfft of the x axis only (skip y)
    def s234(xx):
        out = matmul_fft.matmul_fft_nd(pair(xx), [2], "irfft")
        return jnp.sum(out)
    print(f"packed x-irfft alone            {timeit(s234, re0):7.2f}",
          flush=True)

    # stage 3 proxy: 2048-length complex ifft (std epilogue), same rows
    z0 = jnp.asarray(rng.randn(B, N, N // 2).astype(np.float32))

    def s3(xx):
        z = stacked_fft.fft_nd_stacked(pair(xx), [2], "ifft")
        return jnp.sum(z.re) + jnp.sum(z.im)
    print(f"3. half-length x-ifft alone     {timeit(s3, z0):7.2f}",
          flush=True)

    # stage 2 proxy: untangle elementwise (slices+flip+E/O/Z), no fft
    def s2(xx):
        X = pair(xx)
        m = N // 2
        Xh = carray.getitem(X, (Ellipsis, slice(0, m)))
        Xr = carray.flip(carray.getitem(X, (Ellipsis, slice(1, m + 1))),
                         [-1])
        E = carray.ComplexPair((Xh.re + Xr.re) * 0.5, (Xh.im - Xr.im) * 0.5)
        O = carray.ComplexPair((Xh.re - Xr.re) * 0.5, (Xh.im + Xr.im) * 0.5)
        return jnp.sum(E.re * O.re + E.im * O.im)
    print(f"2. untangle elementwise+flip    {timeit(s2, re0):7.2f}",
          flush=True)


def epilogue_probe():
    """y-ifft raw (no epilogue) vs std: isolates the 2-plane standard
    epilogue cost."""
    from xrft_tpu.ops import carray, stacked_fft

    B, N = 8, 4096
    M = N // 2 + 1
    rng = np.random.RandomState(0)
    re0 = jnp.asarray(rng.randn(B, N, M).astype(np.float32))

    def pair(xx):
        return carray.ComplexPair(xx, xx * 0.3)

    def s_raw(xx):
        a, layout = stacked_fft.fft_nd_stacked(pair(xx), [1], "ifft",
                                               raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return jnp.sum(re) + jnp.sum(im)
    print(f"y-ifft RAW (no epilogue)        {timeit(s_raw, re0):7.2f}",
          flush=True)

    def s_std(xx):
        z = stacked_fft.fft_nd_stacked(pair(xx), [1], "ifft")
        return jnp.sum(z.re) + jnp.sum(z.im)
    print(f"y-ifft STD epilogue             {timeit(s_std, re0):7.2f}",
          flush=True)

    # and the half-length x ifft raw vs std
    z0 = jnp.asarray(rng.randn(B, N, N // 2).astype(np.float32))

    def x_raw(xx):
        a, layout = stacked_fft.fft_nd_stacked(pair(xx), [2], "ifft",
                                               raw=True)
        re, im = stacked_fft.raw_planes(a, layout)
        return jnp.sum(re) + jnp.sum(im)
    print(f"x-ifft(2048) RAW                {timeit(x_raw, z0):7.2f}",
          flush=True)

    def x_std(xx):
        z = stacked_fft.fft_nd_stacked(pair(xx), [2], "ifft")
        return jnp.sum(z.re) + jnp.sum(z.im)
    print(f"x-ifft(2048) STD                {timeit(x_std, z0):7.2f}",
          flush=True)


if __name__ == "__main__":
    main()
    epilogue_probe()
