"""Global configuration for xrft_tpu.

Everything here is host-side, static configuration that shapes how the
jit-compiled spectral pipelines are traced.  There is deliberately no
config-file / env-flag sprawl: like the reference library (which is 100%
keyword-argument driven), per-call behaviour is controlled by kwargs; the
few process-wide knobs live here.

Reference: xrft has no config system at all (see SURVEY.md §5); these knobs
exist only because the TPU build has multiple FFT execution engines.
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager

import jax


@dataclasses.dataclass
class _Config:
    # FFT execution engine:
    #   "auto"   - XLA's native FFT where the backend supports it (CPU/GPU),
    #              MXU matmul-FFT on TPU (where the FFT HLO is unavailable
    #              or slow for the sizes we care about).
    #   "xla"    - always lower to the FFT HLO.
    #   "matmul" - always use the four-step/Bluestein matmul engine.
    fft_engine: str = "auto"
    # Largest size for which a direct O(N^2) DFT matmul is used before
    # switching to the four-step factorization.  128..1024 are reasonable;
    # the MXU keeps direct matmuls at high utilization up to ~1k.
    direct_dft_max: int = 512
    # Complex-number representation:
    #   "auto"   - native complex dtypes on CPU/GPU; split (re, im) pairs on
    #              TPU, where complex HLOs do not execute.
    #   "native" - force native complex dtypes.
    #   "split"  - force split pairs (tests use this on CPU to validate the
    #              exact TPU code path).
    complex_mode: str = "auto"
    # Extended-precision accumulation for the matmul engine when inputs are
    # complex64 ("float32x2" double-word arithmetic). "never" | "always".
    # Overridden per-call via fft(..., precision=...).
    extended_precision: str = "never"


config = _Config()


def set_fft_engine(engine: str) -> None:
    if engine not in ("auto", "xla", "matmul"):
        raise ValueError(f"Unknown fft engine {engine!r}")
    config.fft_engine = engine


def resolve_fft_engine(override: str | None = None) -> str:
    """Resolve 'auto' to a concrete engine for the default backend."""
    engine = override or config.fft_engine
    if engine == "auto":
        platform = jax.default_backend()
        # 'axon' is a tunnelled TPU backend; treat like tpu.
        return "xla" if platform in ("cpu", "gpu", "cuda", "rocm") else "matmul"
    return engine


@contextmanager
def fft_engine(engine: str):
    """Context manager to temporarily force an FFT engine (used in tests)."""
    old = config.fft_engine
    set_fft_engine(engine)
    try:
        yield
    finally:
        config.fft_engine = old


@contextmanager
def complex_mode(mode: str):
    """Context manager to temporarily force a complex representation."""
    if mode not in ("auto", "native", "split"):
        raise ValueError(f"Unknown complex mode {mode!r}")
    old = config.complex_mode
    config.complex_mode = mode
    try:
        yield
    finally:
        config.complex_mode = old
