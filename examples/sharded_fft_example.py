"""Distributed spectral analysis over a device mesh.

What the reference's dask backend cannot do (transform dims must fit one
chunk): shard the *transform* dimensions across devices and run the FFT as
a pencil decomposition with all_to_all transposes.  Works on any mesh —
run with 8 emulated devices via:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/sharded_fft_example.py
"""

import jax
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xrft_tpu
from xrft_tpu import LabeledArray
from xrft_tpu.parallel import make_mesh, sharded_power_spectrum

n_dev = len(jax.devices())
print(f"{n_dev} devices: {jax.devices()[0].platform}")
p1 = 2 if n_dev % 2 == 0 else 1
mesh = make_mesh({"py": p1, "px": n_dev // p1})

N = 256
rng = np.random.RandomState(0)
da = LabeledArray(rng.randn(N, N).astype(np.float32), dims=["y", "x"],
                  coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})

# both transform dims sharded: each axis FFT runs locally after an
# all_to_all pencil transpose over the mesh
ps = sharded_power_spectrum(da, mesh, {"y": "py", "x": "px"},
                            dim=["y", "x"], window="hann", detrend="linear")
print("sharded PSD dims:", ps.dims, "| sharding:", ps.data.sharding.spec
      if hasattr(ps.data, "sharding") else type(ps.data).__name__)

local = xrft_tpu.power_spectrum(da, dim=["y", "x"], window="hann",
                                detrend="linear")
err = np.abs(ps.values - local.values).max() / local.values.max()
print(f"parity vs single-device: {err:.2e}")
