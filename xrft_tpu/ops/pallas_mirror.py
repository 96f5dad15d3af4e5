"""Hermitian mirror as a single Pallas pass (the two-sided PSD tail).

The reference's ``power_spectrum`` returns the full two-sided grid
(``/root/reference/xrft/xrft.py:685-750``); for real input this library
computes the one-sided PSD and expands it by Hermitian symmetry

    P[oy, ox] = half[oy, k]                 k = (ox - h) mod n,  k <= n/2
    P[oy, ox] = half[(NY - oy) mod NY, n-k] otherwise

(`spectra._hermitian_expand`).  This kernel builds the full two-sided
array in ONE output pass — ~1.1 GB of traffic instead of ~3.4 — with all
reversals done as butterfly `pltpu.roll` cascades (exact: rolls only
move values; `rev` itself is unimplemented in this deployment's Mosaic
lowering):

**Measured result (v5e, 8x4096x4096 flagship): a NET LOSS — kept as an
opt-in** (`config.psd_mirror_impl = "pallas"`).  Standalone the kernel
is only slightly faster than the XLA reverse/concat expansion (5.48 vs
6.23 ms: the log2-stage roll cascades are VPU-bound, ~45 vector ops per
mirrored element), and in-pipeline it LOSES (22.7 vs 20.7 ms end-to-end)
because a pallas_call is opaque to XLA's latency-hiding scheduler — the
HLO mirror overlaps the engine's MXU dots, the kernel serializes after
them.  An MXU anti-identity-dot reversal (exact under HIGHEST: 0/1
weights select whole bf16x3 splits) would cut the standalone cost to
~2 ms but cannot recover the lost overlap, so it was not pursued.

  * output direct tiles copy their source tile;
  * output mirror tiles load the block-reversed source tile, reverse it
    in-register (rolls + iota selects), and patch the two off-by-one
    boundary lines (the mirror index map ``n - k`` crosses one row/col
    into the neighbouring tile) from three thin (width-1) fetches;
  * the Nyquist column (k = n/2, unpermuted rows) is patched from a
    fourth thin fetch.

The thin fetches are what keep the kernel in-bounds on the engine's
padded one-sided width (2080 on the flagship): no 256-wide block ever
touches past column n/2 + 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mirror_applicable", "mirror_two_sided", "mirror_reference"]

BY = 256
BX = 256


def mirror_applicable(shape, n_full: int, dtype) -> bool:
    """True when `mirror_two_sided` supports this geometry: [..., NY, MP]
    real input, NY a multiple of 256, n_full a multiple of 512, one-sided
    columns (n_full//2 + 1) present."""
    if len(shape) < 2:
        return False
    ny, mp = shape[-2], shape[-1]
    if np.dtype(dtype).kind != "f":
        return False
    return (ny % BY == 0 and n_full % (2 * BX) == 0 and n_full >= 2 * BX
            and ny >= BY and mp >= n_full // 2 + 1)


def _rev(b, axis):
    """Reverse a power-of-two axis via a butterfly roll cascade (exact)."""
    from jax.experimental.pallas import tpu as pltpu

    n = b.shape[axis]
    if n == 1:
        return b
    idx = jax.lax.broadcasted_iota(jnp.int32, b.shape, axis)
    s = n // 2
    while s >= 1:
        hi = pltpu.roll(b, s, axis)       # hi[j] = b[j - s]
        lo = pltpu.roll(b, n - s, axis)   # lo[j] = b[j + s]
        b = jnp.where((idx // s) % 2 == 0, lo, hi)
        s //= 2
    return b


def mirror_two_sided(half, n_full: int, shift: bool, interpret: bool = False):
    """[..., NY, MP] one-sided real PSD -> [..., NY, n_full] two-sided.

    `half` columns 0..n_full//2 are the one-sided spectrum (columns past
    that, e.g. engine padding, are ignored).  The non-half axis (rows) is
    already in its final output order; its mirror map is (NY - oy) mod NY
    regardless of row shift.  `shift` applies the fftshift layout to the
    reconstructed half axis.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = half.shape[:-2]
    NY, MP = half.shape[-2], half.shape[-1]
    NX = n_full
    assert mirror_applicable(half.shape, n_full, half.dtype)
    x = half.reshape((-1, NY, MP))
    B = x.shape[0]
    ni, nj = NY // BY, NX // BX
    mj = (NX // 2) // BX
    hj = mj if shift else 0

    def t_k(j):
        return (j - hj) % nj

    def wide_map(b, i, j):
        t = t_k(j)
        mir = t >= mj
        return (b, jnp.where(mir, ni - 1 - i, i),
                jnp.where(mir, (nj - 1) - t, t))

    # Mosaic requires the last two block dims divisible by (8, 128), so
    # the "thin" boundary fetches are (8, BX) / (BY, 128) blocks whose
    # first row / lane is the line actually used.  The needed offsets are
    # BY/BX multiples, so they are always 8/128-block-aligned.
    def row_map(b, i, j):  # (8, BX) block: row 0 = the W[0, q] source row
        t = t_k(j)
        return (b, ((NY - i * BY) % NY) // 8,
                jnp.where(t >= mj, (nj - 1) - t, 0))

    def col_map(b, i, j):  # (BY, 128): lane 0 = the W[p, 0] source column
        t = t_k(j)
        return (b, ni - 1 - i, jnp.where(t >= mj, (NX - t * BX) // 128, 0))

    def corner_map(b, i, j):  # (8, 128): element [0, 0] = W[0, 0]
        t = t_k(j)
        return (b, ((NY - i * BY) % NY) // 8,
                jnp.where(t >= mj, (NX - t * BX) // 128, 0))

    def nyq_map(b, i, j):  # (BY, 128): lane 0 = unpermuted Nyquist column
        return (b, i, (NX // 2) // 128)

    def kern(a_ref, b_ref, c_ref, d_ref, n_ref, out_ref):
        j = pl.program_id(2)
        t = t_k(j)

        @pl.when(t < mj)
        def _():
            out_ref[...] = a_ref[...]

        @pl.when(t >= mj)
        def _():
            A = a_ref[...]                      # (1, BY, BX)
            W = _rev(_rev(A, 1), 2)
            W = pltpu.roll(pltpu.roll(W, 1, 1), 1, 2)
            p = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)
            q = jax.lax.broadcasted_iota(jnp.int32, A.shape, 2)
            rowB = pltpu.roll(_rev(b_ref[...][:, 0:1, :], 2), 1, 2)
            colC = pltpu.roll(_rev(c_ref[...][:, :, 0:1], 1), 1, 1)
            W = jnp.where(p == 0, rowB, W)
            W = jnp.where(q == 0, colC, W)
            # corner: scalar splat (a (1,1,1)-block broadcast would need
            # both sublane and lane broadcasting, unsupported in Mosaic)
            W = jnp.where((p == 0) & (q == 0), d_ref[0, 0, 0], W)
            # k = n/2 (t == mj, q == 0): the direct Nyquist column
            W = jnp.where((q == 0) & (t == mj),
                          n_ref[...][:, :, 0:1], W)
            out_ref[...] = W

    out = pl.pallas_call(
        kern,
        grid=(B, ni, nj),
        in_specs=[
            pl.BlockSpec((1, BY, BX), wide_map),
            pl.BlockSpec((1, 8, BX), row_map),
            pl.BlockSpec((1, BY, 128), col_map),
            pl.BlockSpec((1, 8, 128), corner_map),
            pl.BlockSpec((1, BY, 128), nyq_map),
        ],
        out_specs=pl.BlockSpec((1, BY, BX), lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, NY, NX), x.dtype),
        interpret=interpret,
    )(x, x, x, x, x)
    return out.reshape(batch + (NY, NX))


def mirror_reference(half: np.ndarray, n_full: int, shift: bool) -> np.ndarray:
    """Pure-numpy oracle for `mirror_two_sided` (tests)."""
    NY = half.shape[-2]
    n = n_full
    h = n // 2 if shift else 0
    out = np.empty(half.shape[:-1] + (n,), half.dtype)
    for ox in range(n):
        k = (ox - h) % n
        if k <= n // 2:
            out[..., ox] = half[..., :, k]
        else:
            ymap = (NY - np.arange(NY)) % NY
            out[..., ox] = half[..., ymap, n - k]
    return out
