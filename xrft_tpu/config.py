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
    # switching to the four-step factorization.  Swept on the v5e
    # (8x4096x4096 2-D FFT, HIGHEST precision): 128 -> 78.7 ms,
    # 512 -> 109 ms, 1024 -> 125 ms, all at 1.5e-7 relative error — the
    # engine is memory-bound, so smaller radices (less compute per pass)
    # win until pass count grows.
    direct_dft_max: int = 128
    # Complex-number representation:
    #   "auto"   - native complex dtypes on CPU/GPU; split (re, im) pairs on
    #              TPU, where complex HLOs do not execute.
    #   "native" - force native complex dtypes.
    #   "split"  - force split pairs (tests use this on CPU to validate the
    #              exact TPU code path).
    complex_mode: str = "auto"
    # MXU matmul precision for the FFT engine: "highest" (6-pass bf16,
    # ~f32 accuracy), "high" (3-pass), or "default" (fastest, lowest
    # accuracy).  f64 inputs always use exact f64 arithmetic (CPU).
    matmul_precision: str = "highest"
    # Stacked-complex pad-free engine (ops/stacked_fft.py): "auto" uses it
    # for every forward fft/rfft/ifft whose axis sizes factor into radices
    # <= direct_dft_max (measured ~2.5-4x faster than the pair engine on
    # the v5e: single dot_general per four-step stage, folded twiddles,
    # no tiny minor dims); "never" forces the round-1 pair engine.
    stacked_fft: str = "auto"
    # Raw-layout (fused-estimator) engine only: largest pruned-rfft axis
    # size planned as a SINGLE direct dot instead of the multi-level
    # factorization.  A one-level plan leaves the one-sided axis fully
    # contiguous in the raw digit layout, so the estimator's restore
    # pass is a near-free reshape; multi-level plans interleave it in
    # level-0-digit-sized runs (8 elements for 1024=(8,128)) that the
    # TPU transpose emitter moves ~8x slower than bandwidth.  Measured
    # on the v5e segmented (Welch) flagship core, 128x1024^2 rfft2+|F|^2
    # +restore: (8,128) plan 26.5 ms vs direct-1024 16.1 ms, f32 error
    # 1.6e-7 -> 3.6e-7 (scripts/perf_welch_direct.py).  The 4096-size
    # flagship keeps its (32,128) plan: its 32-wide level-0 runs restore
    # at ~1.8 ms, and a direct 4096 dot would cost 4x the FLOPs.
    direct_prune_max: int = 1024
    # Pencil-FFT compute/communication overlap: split each
    # (all_to_all -> local FFT) pair along a resident batch axis into this
    # many independent chunks so XLA's latency-hiding scheduler can overlap
    # chunk i's collective with chunk i-1's FFT.  1 = no chunking.
    pencil_overlap_chunks: int = 1
    # Fused Pallas four-step FFT kernel: "never" (default), "auto" (TPU,
    # f32, N=n1*n2 with n1,n2<=256), or "always" (tests: interpret mode
    # on CPU).  Round-4 reformulation (caller-side digit bitcasts, 3-D
    # block refs) COMPILES AND RUNS on this Mosaic toolchain — and
    # measures a NET LOSS on the flagship's hot complex axis
    # (32768x4096: best fused 34.8 ms vs stacked engine 21.3;
    # scripts/perf_pallas_fftfuse.py).  Two measured limiters, both
    # toolchain-level: (a) one HBM side of every (n1, n2) split pays a
    # minor-dim-<128 DMA tiling penalty (n1*n2=4096 cannot give both
    # sides a 128 minor: 41.7/34.8/48.5 ms for (128,32)/(64,64)/
    # (32,128)); (b) the kernel's 6-pass HIGHEST matmuls do not overlap
    # with DMA under Mosaic (DEFAULT precision saves 14 ms; XLA's dot
    # emitter hides the same passes for free).  Independent confirmation
    # of the round-4 dot-datapath floor proof.  Default stays "never";
    # re-test on toolchain updates.
    pallas_fft: str = "never"
    # Large-grid binned aggregation (ops/binning.py, points x bins above
    # the one-hot threshold): "auto" = Pallas on-the-fly one-hot kernel on
    # TPU (the sorted-permutation path spends ~30 ms in a 4M-point gather
    # on the v5e; the kernel does the same aggregation in ~2 ms), sorted
    # path elsewhere; "pallas" / "pallas_interpret" / "sorted" force.
    binned_sum_impl: str = "auto"
    # Hermitian mirror for the fused two-sided PSD (ops/pallas_mirror.py):
    # "xla" (default) = reverse/concat HLOs.  A single-pass Pallas kernel
    # exists ("pallas" / "pallas_interpret" to force) and is bit-exact,
    # but measured a NET LOSS on the v5e flagship (22.7 vs 20.7 ms
    # end-to-end): the butterfly-roll reversals are VPU-bound (~5.5 ms
    # standalone vs 6.2 for XLA's reverse) and, being opaque to XLA's
    # scheduler, the kernel forfeits the overlap with the engine's dots
    # that the HLO mirror enjoys.  "auto" currently = "xla".
    psd_mirror_impl: str = "xla"
    # engine='hp' implementation:
    #   "auto"    - on backends with real float64 (cpu/gpu, requires
    #               jax_enable_x64) the jit hp pipelines run native: f64
    #               quad planes + the c128 XLA FFT — the 1e-10 precision
    #               contract then holds OFF-chip too (<=1e-12 measured;
    #               the emulated path degrades to ~2.5e-8 on XLA:CPU,
    #               whose LLVM FMA contraction breaks the double-word
    #               sequences — ROADMAP #6).  On TPU: int8-limb/df64
    #               emulation (the only option; no f64 execution).
    #   "emulate" - force the TPU emulation path everywhere (tests use
    #               this on CPU to validate the exact on-chip code path).
    #   "native"  - force native (errors on TPU, which has no f64).
    hp_impl: str = "auto"
    # Hermitian row-pair packed two-sided PSD (ops/psd_packed.py): "auto"
    # takes the packed route (half-size complex FFT + elementwise
    # combine, no mirror pass) for real 2-D power spectra whenever
    # applicable; "never" (default) keeps the one-sided rfft + mirror
    # route.  MEASURED NET LOSS on the v5e flagship (55.3 vs 20.9 ms,
    # scripts/perf_packed_ab.py): the one-sided engine already exploits
    # realness (real level-0 dots + weight-level column pruning), so
    # packing saves no MXU work, while the combine's partner reads
    # (flip+roll of both standard planes) add several memory passes.
    psd_packed: str = "never"
    # Pallas route for the stacked engine's real-input level-0 dot (the
    # flagship's hottest dot, W(2,k,j) x X(j, ~4.2M cols)): "never"
    # (default), "unpacked" (ops/pallas_dot.make_dot_kernel on the
    # (2k, j) x (j, cols) layout the engine already has — zero
    # relayouts), or "packed" (G=4 block-diagonal K-packing, the
    # isolated-A/B-winning MXU shape, at the price of one input and one
    # output relayout).  "*_interpret" suffixes run the kernel in
    # interpret mode (CPU tests).  Wired per the floor_retest decision
    # rule after FLOOR_r05 fired (isolated XLA dot 5.18 ms vs Pallas
    # 4.19 on this toolchain).  The IN-CONTEXT A/B
    # (scripts/perf_pallas_inctx.py, on-chip, bit-identical checksums)
    # decided it: inside the flagship program the Pallas routes lose
    # 38.87 ('unpacked') / 50.39 ('packed') vs 20.69 ms ('never') — the
    # Pallas call boundary severs XLA's fusion of this dot with its
    # neighbors, costing far more than the isolated kernel wins.
    # 'never' stays the default; see BASELINE.md round 5.
    pallas_level0: str = "never"
    # convolve/correlate method='auto' crossover: kernels with at most
    # this many elements (over the transform dims) take the direct MXU
    # ``conv_general_dilated`` route; larger kernels take the padded-FFT
    # route.  The direct method's cost is prod(n_out)*prod(n2) MACs at
    # systolic rate while the fft route streams three padded transforms
    # through HBM, so the crossover is a kernel-size constant to first
    # order.  Default from the analytic model (HIGHEST-precision MXU at
    # ~30 TFLOP/s vs three ~500 GB/s transform passes puts the 4096^2
    # crossover near a 100^2 kernel); scripts/perf_conv_direct.py
    # measures the real crossover on-chip — re-tune from its output.
    direct_conv_max: int = 8192


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
def hp_impl(mode: str):
    """Context manager to temporarily force the engine='hp' implementation
    ("auto" | "emulate" | "native"); tests force "emulate" on CPU to pin
    the exact TPU code path."""
    if mode not in ("auto", "emulate", "native"):
        raise ValueError(f"Unknown hp implementation {mode!r}")
    old = config.hp_impl
    config.hp_impl = mode
    try:
        yield
    finally:
        config.hp_impl = old


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
