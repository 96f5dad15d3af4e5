"""Pencil-decomposed distributed N-D FFT over a device mesh.

This is the capability the reference fundamentally lacks: dask-xrft errors
out when a transform dim is chunked
(``/root/reference/xrft/tests/test_xrft.py:166-170``).  Here, transform
axes sharded across mesh axes are handled with the classical pencil
decomposition (cf. AccFFT, PAPERS.md): per-axis FFTs are always *local*
(the axis is made fully resident first), and residency moves between axes
via ``all_to_all`` collective transposes that ride the ICI when mesh axes
map to physical rings.

Algorithm (inside ``jax.shard_map``): for each transform axis
  * axis unsharded  -> local FFT.
  * axis sharded on mesh axis m -> all_to_all swaps residency with a
    "buddy" axis (an unsharded axis with divisible extent), local FFT, then
    all_to_all back.  Layout in == layout out.

All data moves in split-complex (re, im) component pairs on TPU — the
collectives and FFT matmuls see only real f32 arrays.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import carray, fft_core

__all__ = ["pencil_fftn"]


def _all_to_all(x, mesh_axis, split_axis, concat_axis):
    fn = lambda v: jax.lax.all_to_all(
        v, mesh_axis, split_axis=split_axis, concat_axis=concat_axis,
        tiled=True,
    )
    if carray.is_pair(x):
        return carray.ComplexPair(fn(x.re), fn(x.im))
    return fn(x)


def _pick_buddy(ndim, axis, axis_sharding, local_shape, P_size):
    """Choose an unsharded axis to temporarily host the sharding during the
    transpose.  Prefers one whose extent divides the mesh-axis size; else
    returns the one needing the least zero-padding (padding is valid because
    the axis-`axis` FFT acts independently per buddy-axis position).

    Axes sharded on *other* mesh axes are valid buddies too (their local
    shard splits further during the transpose and is restored by the
    reverse transpose), so any multi-axis-sharded layout works.

    Returns (buddy_axis, pad_amount)."""
    cands = [b for b in range(ndim) if b != axis]
    if not cands:
        raise ValueError(
            f"pencil FFT needs a buddy axis to transpose axis {axis}; "
            f"a 1-D sharded transform has none (shapes {local_shape})."
        )

    def cost(b):
        pad = (-local_shape[b]) % P_size
        return (
            0 if pad == 0 else 1,                  # prefer no padding
            0 if not axis_sharding.get(b) else 1,  # prefer unsharded hosts
            pad / max(local_shape[b], 1),          # least relative padding
        )

    b = min(cands, key=cost)
    return b, (-local_shape[b]) % P_size


def pencil_fftn(
    x,
    axes,
    mesh: Mesh,
    axis_sharding: dict[int, str | None],
    kind: str = "fft",
):
    """Distributed N-D FFT of a (globally-viewed) array.

    Parameters
    ----------
    x : array or ComplexPair (global view; will be shard_map-ed)
    axes : transform axes.  For 'rfft'/'irfft' the real axis is ``axes[-1]``
        and must be both the trailing axis and unsharded.
    mesh : jax.sharding.Mesh
    axis_sharding : {array_axis: mesh_axis_name} for sharded axes; all other
        axes replicated... sharded non-transform axes are allowed and act as
        pure batch parallelism.
    kind : 'fft' | 'ifft' | 'rfft' | 'irfft'
    """
    ndim = x.ndim
    axes = [a % ndim for a in axes]
    axis_sharding = {a % ndim: m for a, m in axis_sharding.items() if m}
    if kind in ("rfft", "irfft"):
        if axes[-1] != ndim - 1:
            raise ValueError(f"{kind} axis must be the last axis")
        if axis_sharding.get(ndim - 1):
            raise ValueError(f"the real ({kind}) axis must be unsharded")

    spec_in = P(*[axis_sharding.get(a) for a in range(ndim)])

    def local_fn(xl):
        out = xl

        def one_axis(out, a, ckind):
            m = axis_sharding.get(a)
            core = fft_core.fftn if ckind == "fft" else fft_core.ifftn
            if m is None:
                return core(out, [a])
            P_size = mesh.shape[m]
            b, pad_amt = _pick_buddy(ndim, a, axis_sharding, out.shape, P_size)
            orig = out.shape[b]
            if pad_amt:
                widths = [(0, 0)] * ndim
                widths[b] = (0, pad_amt)
                out = carray.pad(out, widths)
            out = _all_to_all(out, m, split_axis=b, concat_axis=a)
            out = core(out, [a])
            out = _all_to_all(out, m, split_axis=a, concat_axis=b)
            if pad_amt:
                key = tuple(
                    slice(0, orig) if i == b else slice(None)
                    for i in range(ndim)
                )
                out = carray.getitem(out, key)
            return out

        if kind == "rfft":
            # transform the (possibly sharded) complex axes first — they
            # commute with the trailing real axis and keep full extents for
            # the buddy transposes; then full-FFT + slice the last axis
            # locally (it is unsharded by contract).
            for a in axes[:-1]:
                out = one_axis(out, a, "fft")
            n = out.shape[-1]
            out = fft_core.fftn(out, [ndim - 1])
            return out[..., : n // 2 + 1]
        if kind == "irfft":
            # inverse-transform the other axes first (pencil where sharded);
            # per-last-axis Hermitian symmetry then holds, so mirror the
            # half spectrum locally and finish with a local inverse FFT
            for a in axes[:-1]:
                out = one_axis(out, a, "ifft")
            tail = carray.conj(
                carray.getitem(out, (Ellipsis, slice(-2, 0, -1)))
            )
            out = carray.concatenate([out, tail], axis=-1)
            out = fft_core.ifftn(out, [ndim - 1])
            return carray.real(out)
        for a in axes:
            out = one_axis(out, a, kind)
        return out

    if carray.is_pair(x):
        in_specs = carray.ComplexPair(spec_in, spec_in)
        out_specs = in_specs if kind != "irfft" else spec_in
    else:
        in_specs = spec_in
        out_specs = spec_in
        if kind in ("fft", "ifft", "rfft") and fft_core.use_split_complex():
            out_specs = carray.ComplexPair(spec_in, spec_in)

    f = jax.shard_map(local_fn, mesh=mesh, in_specs=(in_specs,),
                      out_specs=out_specs, check_vma=False)
    return f(x)
