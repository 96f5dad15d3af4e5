"""Mesh construction and LabeledArray sharding helpers.

The reference's sole parallelism mechanism is dask chunking (SURVEY.md
§2.2); its TPU-native replacement is ``jax.sharding``: batch (non-transform)
dims shard freely across a device mesh with zero collectives — the direct
analogue of dask's embarrassingly parallel chunked dims — while transform
dims use the pencil decomposition in :mod:`.pencil`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..labeled import LabeledArray
from ..ops import carray

__all__ = ["make_mesh", "shard_labeled", "spec_for"]


def make_mesh(axis_shapes: dict[str, int] | None = None) -> Mesh:
    """Build a Mesh over all available devices.

    ``axis_shapes``: mapping of mesh-axis name to size, e.g.
    ``{"data": 2, "fft": 4}``.  Default: one axis named 'data' spanning all
    devices.
    """
    if axis_shapes is None:
        axis_shapes = {"data": len(jax.devices())}
    return jax.make_mesh(tuple(axis_shapes.values()), tuple(axis_shapes))


def spec_for(da: LabeledArray, dim_shards: dict[str, str]) -> P:
    """PartitionSpec for a LabeledArray from a {dim: mesh_axis} mapping."""
    return P(*[dim_shards.get(d) for d in da.dims])


def shard_labeled(da: LabeledArray, mesh: Mesh, dim_shards: dict[str, str]
                  ) -> LabeledArray:
    """Place a LabeledArray's data on `mesh` sharded per {dim: mesh_axis}.

    Unlisted dims are replicated.  Split-complex data shards componentwise
    with identical layout.
    """
    for d in dim_shards:
        if d not in da.dims:
            raise ValueError(f"shard dim {d!r} not in array dims {da.dims}")
    sharding = NamedSharding(mesh, spec_for(da, dim_shards))
    data = da.data
    if isinstance(data, np.ndarray):
        from ..labeled import _asjax

        data = _asjax(data)
    if carray.is_pair(data):
        data = carray.ComplexPair(
            jax.device_put(data.re, sharding), jax.device_put(data.im, sharding)
        )
    else:
        data = jax.device_put(data, sharding)
    return da.copy(data=data)
