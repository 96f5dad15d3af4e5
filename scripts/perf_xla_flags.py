"""Probe whether XLA:TPU scheduling flags move the flagship PSD.

Flags must be set before backend init, so this driver re-execs the
measurement in subprocesses with different XLA_FLAGS values.  Caveat:
the axon-tunnelled backend may compile server-side, in which case
client-side XLA_FLAGS silently do nothing — the control row (no flags)
exists to detect that (identical times => flags likely ignored).

MEASURED RESULT (round 3): no flag leverage exists on this deployment.
The client-side XLA build (CPU wheel) aborts at flag-parse time on every
TPU-specific flag ("Unknown flag in XLA_FLAGS"), i.e. the TPU compiler
behind the axon tunnel is not reachable through client XLA_FLAGS at all;
control measured 21.30 ms/iter.

Usage: python scripts/perf_xla_flags.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

MEASURE = r"""
import sys, time
sys.path.insert(0, %(root)r)
import numpy as np, jax, jax.numpy as jnp
from xrft_tpu import LabeledArray, spectra

B, N = 8, 4096
rng = np.random.RandomState(0)
da = LabeledArray(rng.randn(B, N, N).astype(np.float32),
                  dims=("time", "y", "x"),
                  coords={"y": np.arange(N) * 0.5, "x": np.arange(N) * 0.5})
x = da.data

def f(xx):
    return spectra.power_spectrum(da.copy(data=xx), dim=["y", "x"],
                                  window="hann", detrend="linear").data

def loop(k):
    def body(_, carry):
        s, xx = carry
        s2 = jnp.sum(f(xx))
        return s + s2, xx + s2 * 1e-38
    def run(xx):
        s, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), xx))
        return s
    return jax.jit(run)

f1, fk = loop(1), loop(6)
float(f1(x)); float(fk(x))
def wall(g):
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(g(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3
print("RESULT %%.2f" %% ((wall(fk) - wall(f1)) / 5))
"""

VARIANTS = [
    ("control", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("no-lhs", "--xla_latency_hiding_scheduler_rerun=0"),
    ("aggr-fusion", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
]


def main():
    root = os.path.dirname(HERE)
    for name, flags in VARIANTS:
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        code = MEASURE % {"root": root}
        p = subprocess.run([sys.executable, "-c", code], env=env, cwd=root,
                           capture_output=True, text=True, timeout=1500)
        out = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
        ms = out[0].split()[1] if out else f"FAIL rc={p.returncode}"
        print(f"{name:12s} {flags:55s} {ms} ms/iter", flush=True)
        if not out:
            err = (p.stderr or "").strip().splitlines()
            print("   " + "\n   ".join(err[-3:]))


if __name__ == "__main__":
    main()
