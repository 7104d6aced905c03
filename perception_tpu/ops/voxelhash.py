"""Voxel-hash nearest-neighbor search for large clouds.

The north star's "batched voxel-hash NN-gather" primitive
(BASELINE.json). The MXU brute force (ops/nn.py) wins for the 10^3-10^4
point working sets of the cuboid pipeline, but full 640x480 frames
(3*10^5 points) need sublinear candidate sets. TPU-friendly design (no
pointer-chasing):

  build:  quantize reference points to cells of size = search radius on
          a grid fitted to the cloud's bounding box (traced values, so
          ids stay inside int32 for any realistic scene/radius), sort
          by cell id once -> contiguous per-cell runs;
  query:  each query point checks its 27 neighboring cells; run starts
          come from a binary search (searchsorted) into the sorted cell
          ids and candidates are gathered as fixed-width windows —
          27 x W contiguous gathers per query, masked on cell match.

Any true neighbor within ``radius`` lands in one of the 27 cells, so
the result equals exact NN whenever the true NN distance <= radius
(misses are flagged). Queries are processed in tiles to bound the
gather working set.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from perception_tpu.ops.points import SENTINEL, apply_mask, bounds


class VoxelHash(NamedTuple):
    points: jax.Array      # (N, 3) sorted by cell id
    cell_ids: jax.Array    # (N,) int32 sorted
    origin: jax.Array      # (3,)
    cell_size: jax.Array   # ()
    dims: jax.Array        # (3,) int32 grid extents (traced)
    sentinel_id: jax.Array # () int32 id marking invalid/padded slots
    order: jax.Array       # (N,) int32 original index per sorted slot —
                           # gather per-point attributes (normals, colors)
                           # into hash order with ``attr[vh.order]``


def _cell_ids(pts, origin, cell_size, dims):
    cell = jnp.floor((pts - origin) / cell_size).astype(jnp.int32)
    cell = jnp.clip(cell, 0, dims - 1)
    return (cell[..., 0] * dims[1] + cell[..., 1]) * dims[2] + cell[..., 2]


def build(ref: jax.Array, ref_mask: jax.Array, cell_size: float) -> VoxelHash:
    """Fit the grid to the masked cloud's bounds and sort by cell id.

    The grid spans the cloud plus one guard cell per side; total cell
    count must stay < 2^31 (true for any scene up to ~1000 cells/axis —
    e.g. 10 m at 1 cm)."""
    cell_size = jnp.asarray(cell_size, ref.dtype)
    lo, hi = bounds(ref, ref_mask)
    origin = lo - cell_size
    dims = jnp.clip(
        jnp.ceil((hi - origin) / cell_size).astype(jnp.int32) + 2, 1, 1200
    )
    ref_p = apply_mask(ref, ref_mask)
    ids = _cell_ids(ref, origin, cell_size, dims)
    sentinel = dims[0] * dims[1] * dims[2]
    ids = jnp.where(ref_mask, ids, sentinel)
    sorted_ids, order = jax.lax.sort(
        (ids, jnp.arange(ids.shape[0], dtype=jnp.int32)), num_keys=1
    )
    return VoxelHash(
        points=ref_p[order],
        cell_ids=sorted_ids,
        origin=origin,
        cell_size=cell_size,
        dims=dims,
        sentinel_id=sentinel,
        order=order.astype(jnp.int32),
    )


_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


@functools.partial(jax.jit, static_argnames=("window", "tile"))
def query(
    vh: VoxelHash,
    queries: jax.Array,
    window: int = 8,
    tile: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Nearest reference point per query within ~cell_size radius.

    Returns (idx (Nq,) into the *sorted* hash points, dist2 (Nq,)).
    dist2 is huge (sentinel-scale) when no candidate cell held a
    neighbor; ``window`` caps candidates per cell (denser cells are
    subsampled by truncation — raise it for fine grids).
    """
    dims = vh.dims
    n = vh.points.shape[0]
    doffs = jnp.asarray(_OFFSETS, jnp.int32)
    offs = (doffs[:, 0] * dims[1] + doffs[:, 1]) * dims[2] + doffs[:, 2]  # (27,)

    nq = queries.shape[0]
    pad = (-nq) % tile
    q_pad = jnp.pad(queries, ((0, pad), (0, 0)), constant_values=SENTINEL)
    q_tiles = q_pad.reshape(-1, tile, 3)

    def one_tile(q):
        cid = _cell_ids(q, vh.origin, vh.cell_size, dims)
        neigh = cid[:, None] + offs[None, :]                      # (T, 27)
        starts = jnp.searchsorted(vh.cell_ids, neigh)             # (T, 27)
        # Candidate window per neighbor cell: (T, 27, W) sorted indices.
        cand = starts[..., None] + jnp.arange(window)[None, None, :]
        cand = jnp.clip(cand, 0, n - 1)
        ok = vh.cell_ids[cand] == neigh[..., None]                # cell match
        pts = vh.points[cand]                                      # (T, 27, W, 3)
        d2 = jnp.sum((pts - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(ok, d2, 4.0e12)
        d2f = d2.reshape(q.shape[0], -1)
        best = jnp.argmin(d2f, axis=1)
        bi = jnp.take_along_axis(cand.reshape(q.shape[0], -1), best[:, None], axis=1)[:, 0]
        bd = jnp.take_along_axis(d2f, best[:, None], axis=1)[:, 0]
        return bi.astype(jnp.int32), bd

    idx, d2 = jax.lax.map(one_tile, q_tiles)
    return idx.reshape(-1)[:nq], d2.reshape(-1)[:nq]


def nearest_neighbor_voxelhash(
    query_pts: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    radius: float,
    window: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-shot build+query; returns (points (Nq, 3) of the neighbors,
    dist2, found mask). Neighbors farther than ``radius`` are misses."""
    vh = build(ref, ref_mask, cell_size=radius)
    idx, d2 = query(vh, query_pts, window=window)
    found = d2 <= radius * radius
    return vh.points[idx], d2, found
