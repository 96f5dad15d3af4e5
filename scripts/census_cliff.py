"""Root-cause the window/detrend scheduling cliff (VERDICT r2 item 7).

Measured: a detrend-only flagship PSD is ~2 ms SLOWER than
detrend+window (ROADMAP #2).  This script diffs the HLO big-buffer pass
census (and cost analysis) of the two programs so the placement rule in
ops/psd_fused.py rests on an artifact, not a coincidence.

Usage: python scripts/census_cliff.py

FINDINGS (round 3, v5e): the detrend+window program (20.5 ms two-sided)
carries an extra 4-op pipeline after the x-axis final dot that
detrend-only (22.4 ms) lacks:

    0.55 GB fusion kOutput [32,2,65,32,128,8,1]   (x final dot)
    0.55 GB copy
    0.55 GB fusion kLoop   [32,2,65,32,128,8]     (pre_weights multiply)
    0.55 GB copy

i.e. the engine pre_weights window multiply DECOUPLES the y-axis dots
from the detrend-laden input fusion.  Total cost-model traffic is
22.07 GB for the FASTER program vs 16.69 GB for the slower one — the
cliff is a scheduling effect, not traffic.  perf_cliff_fix.py confirms:
an inter-axis optimization_barrier reproduces the break and recovers
1.1 ms for detrend-only (19.14 -> 18.02 one-sided) while HURTING the
window-only (+5.7 ms) and bare (+2.4 ms) variants, so the shipped rule
(ops/psd_fused.py) gates the barrier to detrend-without-window exactly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from profile_trace import pass_census


def census_of(pipe, da, label):
    f = jax.jit(pipe)
    compiled = f.lower(da).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"\n=== {label}: {ca.get('flops', 0)/1e9:.0f} GF, "
          f"{ca.get('bytes accessed', 0)/1e9:.2f} GB accessed ===")
    for gb, kind, shape, fk in pass_census(compiled, min_gb=0.2):
        print(f"  {gb:5.2f} GB  {kind:12s} {fk:8s} [{shape}]")
    return compiled


def main():
    import xrft_tpu
    from xrft_tpu import LabeledArray

    B, N = 8, 4096
    rng = np.random.RandomState(0)
    da = LabeledArray(
        rng.randn(B, N, N).astype(np.float32),
        dims=("time", "y", "x"),
        coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5},
    )

    census_of(lambda d: xrft_tpu.power_spectrum(
        d, dim=["y", "x"], window="hann", detrend="linear").data,
        da, "detrend + window (20.5 ms)")
    census_of(lambda d: xrft_tpu.power_spectrum(
        d, dim=["y", "x"], detrend="linear").data,
        da, "detrend only (22.4 ms)")
    census_of(lambda d: xrft_tpu.power_spectrum(
        d, dim=["y", "x"], window="hann").data,
        da, "window only (21.7 ms)")


if __name__ == "__main__":
    main()
