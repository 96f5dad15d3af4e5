"""Hand-scheduled tiled matmul kernels for the engine's hot dot shapes.

Purpose (VERDICT r3 item 1): test — on hardware — whether a Pallas
kernel with explicit tiling/double-buffered HBM->VMEM streaming can beat
XLA's dot emitter (~448 GB/s effective, 55% of the v5e HBM spec) on the
flagship engine's dot fusions.  The flagship's hottest dot, from the
compiled stablehlo of ``power_spectrum(8x4096^2, window, detrend)`` with
the (32,128)-planned stacked engine (ops/stacked_fft.py):

    %33 = dot_general W(2,32,32) x X(32,128,8,32,128),
          contracting j=32 -> out(2,32,32,128,8,128)   [HIGHEST precision]

i.e. a K=32, M=64 contraction swept over 4.19M result columns — an
MXU-hostile shape (the 128x128 systolic array runs 1/8 filled in both
matrix dims).  The co-designed reformulation these kernels consume packs
G=4 independent j-tiles per column with a block-diagonal weight:

    W_bd(256,128) @ X2(128, N)      K=128, M=256

which quarters the column count the MXU must stream at the price of 4x
(mostly-zero) MAC work — a win whenever the dot is column-rate- or
bandwidth-bound, which this one is (arithmetic intensity ~10.7 F/B vs
the v5e balance point of ~40).

Two schedules:

- :func:`make_dot_kernel` — grid over column tiles; Pallas's BlockSpec
  pipeline auto-double-buffers the HBM->VMEM input stream and the
  VMEM->HBM output stream.
- :func:`make_dot_kernel_dma` — single-program kernel with EXPLICIT
  two-slot double buffering (``pltpu.make_async_copy`` + semaphores),
  in case the auto-pipeline's scheduling is the limiter.

Both run the dot at HIGHEST precision (6-pass bf16, the engine's f32
grade — ops/matmul_fft._PRECISIONS).  Measured A/B lives in
scripts/perf_pallas_dot.py; results recorded in BASELINE.md.

This replaces nothing in the reference (xrft delegates all compute to
numpy/pocketfft, /root/reference/xrft/xrft.py:32-36); it is part of the
TPU-native engine work those libraries stand in for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_dot_kernel", "make_dot_kernel_dma", "pack_block_diag"]


def pack_block_diag(w2: np.ndarray, groups: int) -> np.ndarray:
    """Block-diagonal expansion diag(w2, ..., w2) packing ``groups``
    independent K-tiles into one MXU-shaped contraction."""
    m, k = w2.shape
    out = np.zeros((groups * m, groups * k), w2.dtype)
    for g in range(groups):
        out[g * m:(g + 1) * m, g * k:(g + 1) * k] = w2
    return out


def _dot(w, x):
    return lax.dot_general(
        w, x, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def make_dot_kernel(w, n_cols: int, tile_cols: int = 8192,
                    interpret: bool = False):
    """(M, K) @ (K, n_cols) at HIGHEST precision, column-tiled.

    The weight block is grid-invariant (fetched once, stays in VMEM);
    Pallas pipelines the x/out column tiles with automatic double
    buffering.  Requires n_cols % tile_cols == 0 (the A/B shapes are
    powers of two; production wiring would pad the tail tile).
    """
    w = jnp.asarray(w, jnp.float32)
    M, K = w.shape
    if n_cols % tile_cols:
        raise ValueError(f"n_cols {n_cols} % tile_cols {tile_cols} != 0")
    grid = n_cols // tile_cols

    def kernel(w_ref, x_ref, o_ref):
        o_ref[:] = _dot(w_ref[:], x_ref[:])

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile_cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, n_cols), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def f(x):
        return call(w, x)

    return f


def make_dot_fold_kernel(w, n_cols: int, tile_cols: int = 4096,
                         interpret: bool = False):
    """Self-chained A/B variant: y = (M,K)@(K,n) folded back to K rows,
    ``out = y[:K] + 1e-38 * y[K:]`` — the shape-preserving consumer the
    chained-loop harness needs, fused INSIDE the kernel (computed as two
    (K,K)@(K,tc) dots, so no in-kernel reshape/slice of a VMEM dot
    result).  XLA gets the identical fusion opportunity in its leg; per
    iteration both implementations move read K*n + write K*n bytes."""
    w = jnp.asarray(w, jnp.float32)
    M, K = w.shape
    if M != 2 * K:
        raise ValueError("fold kernel expects M == 2K")
    if n_cols % tile_cols:
        raise ValueError(f"n_cols {n_cols} % tile_cols {tile_cols} != 0")
    grid = n_cols // tile_cols
    w_hi, w_lo = w[:K], w[K:]

    def kernel(wh_ref, wl_ref, x_ref, o_ref):
        o_ref[:] = _dot(wh_ref[:], x_ref[:]) \
            + 1e-38 * _dot(wl_ref[:], x_ref[:])

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((K, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_cols), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, tile_cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, n_cols), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def f(x):
        return call(w_hi, w_lo, x)

    return f


def make_dot_kernel_dma(w, n_cols: int, tile_cols: int = 8192,
                        interpret: bool = False):
    """Same contraction with EXPLICIT two-slot double-buffered DMA:
    input tiles stream HBM->VMEM ahead of the MXU, output tiles stream
    VMEM->HBM behind it, all overlap managed by hand."""
    w = jnp.asarray(w, jnp.float32)
    M, K = w.shape
    if n_cols % tile_cols:
        raise ValueError(f"n_cols {n_cols} % tile_cols {tile_cols} != 0")
    num = n_cols // tile_cols

    def kernel(w_ref, x_hbm, o_hbm):
        def body(x_s, o_s, sem_in, sem_out):
            def get_in(slot, i):
                return pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(i * tile_cols, tile_cols)],
                    x_s.at[slot], sem_in.at[slot])

            def put_out(slot, i):
                return pltpu.make_async_copy(
                    o_s.at[slot],
                    o_hbm.at[:, pl.ds(i * tile_cols, tile_cols)],
                    sem_out.at[slot])

            get_in(0, 0).start()

            def loop(i, _):
                slot = i % 2
                nxt = (i + 1) % 2

                @pl.when(i + 1 < num)
                def _():
                    get_in(nxt, i + 1).start()

                get_in(slot, i).wait()

                # slot's previous output DMA (tile i-2) must land before
                # the MXU overwrites the buffer
                @pl.when(i >= 2)
                def _():
                    put_out(slot, i - 2).wait()

                o_s[slot] = _dot(w_ref[:], x_s[slot])
                put_out(slot, i).start()
                return 0

            lax.fori_loop(0, num, loop, 0)

            @pl.when(num >= 2)
            def _():
                put_out((num - 2) % 2, num - 2).wait()

            put_out((num - 1) % 2, num - 1).wait()

        pl.run_scoped(
            body,
            x_s=pltpu.VMEM((2, K, tile_cols), jnp.float32),
            o_s=pltpu.VMEM((2, M, tile_cols), jnp.float32),
            sem_in=pltpu.SemaphoreType.DMA((2,)),
            sem_out=pltpu.SemaphoreType.DMA((2,)),
        )

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((M, n_cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    @jax.jit
    def f(x):
        return call(w, x)

    return f
