"""On-chip validation suite: runs the checks that only mean something on
real TPU hardware (accuracy of the split-complex engine, the df64
high-precision path, and end-to-end pipeline parity).

Usage (default env routes to the TPU):  python scripts/chip_checks.py

Prints one PASS/FAIL line per check; exits nonzero on failure.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import xrft_tpu
    from xrft_tpu import LabeledArray
    from xrft_tpu.ops import fft_core
    from xrft_tpu.ops.carray import to_numpy
    from xrft_tpu.ops.df64_fft import df64_fft_nd, df64_to_numpy

    failures = 0

    def check(name, value, bound):
        nonlocal failures
        ok = value <= bound
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: {value:.3e} "
              f"(bound {bound:.0e})")

    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)

    # 1. f32 engine: 2-D FFT parity
    x = rng.randn(4, 1024, 1024).astype(np.float32)
    got = to_numpy(jax.jit(lambda a: fft_core.fftn(a, [1, 2]))(jnp.asarray(x)))
    ref = np.fft.fftn(x[0].astype(np.float64), axes=[0, 1])
    check("f32 engine 2-D fftn rel err",
          np.abs(got[0] - ref).max() / np.abs(ref).max(), 1e-6)

    # 2. df64 engine: 1e-10 contract (measures ~1e-14)
    xx = rng.randn(8, 1024).astype(np.float32)
    got = df64_to_numpy(df64_fft_nd(xx, [-1], "fft", interpret=False))
    ref = np.fft.fft(xx.astype(np.float64), axis=-1)
    check("df64 engine fft rel err",
          np.abs(got - ref).max() / np.abs(ref).max(), 1e-10)

    # 2b. int8-limb MXU DFT (Ozaki-style spike)
    from xrft_tpu.ops.int8_dft import int8_dft_last

    x8 = rng.randn(16, 1024).astype(np.float32)
    got = df64_to_numpy(jax.jit(lambda a: int8_dft_last(a, -1))(x8))
    ref = np.fft.fft(x8.astype(np.float64), axis=-1)
    check("int8-limb MXU DFT rel err",
          np.abs(got - ref).max() / np.abs(ref).max(), 1e-10)

    # 3. fft64 public API: Parseval at 1e-12
    Nx = 512
    dx = 0.37
    xs = dx * (np.arange(Nx) - 100)
    sig = rng.randn(Nx).astype(np.float32)
    da = LabeledArray(sig, dims=["x"], coords={"x": xs})
    F = xrft_tpu.fft64(da, dim="x")
    lhs = (np.abs(F.values) ** 2).sum() * F["freq_x"].attrs["spacing"]
    rhs = (np.abs(sig.astype(np.float64)) ** 2).sum() * dx
    check("fft64 Parseval rel err", abs(lhs - rhs) / rhs, 1e-12)

    # 4. full pipeline: windowed+detrended PSD vs host oracle
    N = 512
    da2 = LabeledArray(rng.rand(N, N).astype(np.float32), dims=["y", "x"],
                       coords={"y": np.arange(N) * 0.5,
                               "x": np.arange(N) * 0.5})
    ps = xrft_tpu.power_spectrum(da2, window="hann", detrend="linear")
    import scipy.signal as sps
    from xrft_tpu.detrend import detrend as _dt
    v = da2.values.astype(np.float64)
    vp = _dt(LabeledArray(v, dims=["y", "x"], coords=da2.coords),
             ["y", "x"], "linear").values
    w = sps.windows.hann(N, sym=False)
    Fo = np.fft.fftshift(np.fft.fftn(vp * (w * w[:, None]))) * 0.25
    refps = np.abs(Fo) ** 2 * (1 / (N * 0.5)) ** 2
    check("pipeline PSD rel err",
          np.abs(ps.values - refps).max() / refps.max(), 1e-5)

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
