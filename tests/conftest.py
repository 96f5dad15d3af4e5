"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (emulating a TPU slice
for sharding tests, per SURVEY.md §4) and float64 enabled so numpy-parity
oracles hold to ~1e-12.  This mirrors how the reference tests "distributed"
behaviour in-process with dask's local scheduler.

Must run before any jax backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
