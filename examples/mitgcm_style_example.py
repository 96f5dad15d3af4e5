"""Batched ocean-model spectral analysis (MITgcm-example analogue).

Runnable port of the reference's ``doc/MITgcm_example.ipynb`` workflow on
synthetic channel-model fields: windowed, linearly detrended 2-D spectra
of a (time, depth, y, x) stack, cross spectra between vertical velocity
and buoyancy, and isotropic spectra — everything batched over time/depth
in a single jit-compiled program (the dask-chunk analogue is free batch
parallelism; shard the time dim over a mesh for multi-chip).
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xrft_tpu
from xrft_tpu import LabeledArray

T, Z, N = 4, 3, 256
dx = 20e3  # 20 km grid
rng = np.random.RandomState(0)

coords = {"YC": np.arange(N) * dx, "XC": np.arange(N) * dx}
w = LabeledArray(rng.randn(T, Z, N, N).astype(np.float32),
                 dims=["time", "Zl", "YC", "XC"], coords=coords, name="W")
b = LabeledArray(rng.randn(T, Z, N, N).astype(np.float32),
                 dims=["time", "Zl", "YC", "XC"], coords=coords, name="B")

# what = F(w) with linear detrend + hann window over the horizontal dims
what = xrft_tpu.fft(w, dim=["XC", "YC"], detrend="linear", window="hann",
                    true_phase=False, true_amplitude=False)
print("fft dims:", what.dims)

# power spectra, batched over (time, Zl)
ps = xrft_tpu.power_spectrum(w, dim=["XC", "YC"], detrend="linear",
                             window="hann")
print("power_spectrum dims:", ps.dims,
      "| total power:", float(ps.values.sum()))

# vertical buoyancy flux cospectrum: Re{ F(w) conj(F(b)) }
cs = xrft_tpu.cross_spectrum(w, b, dim=["XC", "YC"], detrend="linear",
                             window="hann", true_phase=False)
print("cross_spectrum dims:", cs.dims)

# isotropic spectrum of one snapshot, with spectral slope fit
iso = xrft_tpu.isotropic_power_spectrum(
    w.isel(time=0, Zl=0), dim=["YC", "XC"], detrend="linear", window="hann"
)
kr = iso["freq_r"].values
_, slope, _ = xrft_tpu.fit_loglog(kr[1:], np.maximum(iso.values[1:], 1e-30))
print(f"isotropic spectrum: {iso.sizes['freq_r']} radial bins, "
      f"slope {slope:.2f}")
