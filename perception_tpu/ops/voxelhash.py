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
    pointsT: jax.Array     # (4, N) transposed + zero-padded row — the
                           # query's slice-gather layout (contiguous
                           # windows along the minor axis are the shape
                           # TPU fetches efficiently; row-gathers of
                           # (3,) slices measured 280x slower)
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
    pts_sorted = ref_p[order]
    return VoxelHash(
        points=pts_sorted,
        pointsT=jnp.concatenate(
            [pts_sorted.T, jnp.zeros((1, pts_sorted.shape[0]), pts_sorted.dtype)],
            axis=0,
        ),
        cell_ids=sorted_ids,
        origin=origin,
        cell_size=cell_size,
        dims=dims,
        sentinel_id=sentinel,
        order=order.astype(jnp.int32),
    )


# The 27-neighborhood decomposes into 9 runs of 3 cells consecutive in
# z — and consecutive z means CONSECUTIVE cell ids (ids are
# ((x*dy)+y)*dz + z), so one binary search per run bounds 3 cells whose
# candidates form ONE contiguous window of the sorted order. That turns
# the query into slice-gathers (dynamic_slice of (4, 3W) blocks from
# the transposed table) instead of 27xW independent row-gathers, plus
# jnp.searchsorted method="sort" (the default 'scan' lowering is ~4.4x
# slower on TPU at these shapes). Measured on v5e, 2048 queries:
#   M=32768:  29.1 ms -> 0.05 ms   (MXU brute force: 0.9 ms)
#   M=131072: 42.6 ms -> 0.03 ms   (brute: 1.4 ms)
# — the voxel hash now beats the brute-force distance tiles everywhere
# past ~10^4 points, which is the north-star "replacing PCL's KD-tree"
# claim made real on the target hardware.
_RUN_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


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
    doffs = jnp.asarray(_RUN_OFFSETS, jnp.int32)
    offs = (doffs[:, 0] * dims[1] + doffs[:, 1]) * dims[2]        # (9,)

    nq = queries.shape[0]
    pad = (-nq) % tile
    q_pad = jnp.pad(queries, ((0, pad), (0, 0)), constant_values=SENTINEL)
    q_tiles = q_pad.reshape(-1, tile, 3)
    # A 3-cell run holds at most 3*window candidates under the per-run
    # truncation cap; one contiguous window from the run's start covers
    # them (the run's cells are adjacent in the sorted order). Tiny
    # tables cap the window at the table itself.
    rw = min(3 * window, n)

    def one_tile(q):
        T = q.shape[0]
        cid = _cell_ids(q, vh.origin, vh.cell_size, dims)
        run_lo = cid[:, None] + offs[None, :] - 1                 # (T, 9) id of z-1
        # One stacked binary search returns each run's [start, end) in
        # the sorted order — no per-candidate cell-id gather needed.
        bounds = jnp.stack([run_lo, run_lo + 3], axis=-1)         # (T, 9, 2)
        se = jnp.searchsorted(
            vh.cell_ids, bounds.reshape(-1), method="sort"
        ).reshape(T, 9, 2)
        starts, ends = se[..., 0], se[..., 1]
        count = jnp.minimum(ends - starts, rw)
        # dynamic_slice clamps its start so the window fits; mirror the
        # clamp and shift the validity range accordingly.
        starts_c = jnp.clip(starts, 0, jnp.maximum(n - rw, 0))
        shift = starts - starts_c                                 # (T, 9) >= 0

        def slice_one(s):
            return jax.lax.dynamic_slice(vh.pointsT, (0, s), (4, rw))

        sl = jax.vmap(slice_one)(starts_c.reshape(-1))            # (T*9, 4, rw)
        pts = sl.reshape(T, 9, 4, rw)
        j = jnp.arange(rw)[None, None, :]
        ok = (j >= shift[..., None]) & (j - shift[..., None] < count[..., None])
        d2 = (
            (pts[:, :, 0, :] - q[:, 0, None, None]) ** 2
            + (pts[:, :, 1, :] - q[:, 1, None, None]) ** 2
            + (pts[:, :, 2, :] - q[:, 2, None, None]) ** 2
        )
        d2 = jnp.where(ok, d2, 4.0e12)
        d2f = d2.reshape(T, -1)
        best = jnp.argmin(d2f, axis=1)
        cand = (starts_c[..., None] + j).reshape(T, -1)
        bi = jnp.take_along_axis(
            jnp.clip(cand, 0, n - 1), best[:, None], axis=1
        )[:, 0]
        bd = jnp.take_along_axis(d2f, best[:, None], axis=1)[:, 0]
        return bi.astype(jnp.int32), bd

    if q_tiles.shape[0] == 1:
        # Single tile: call directly — routing one iteration through
        # lax.map wraps the slice-gathers in a while-loop body that XLA
        # lowers ~1000x slower on TPU (measured 52 ms vs 0.05 ms).
        idx, d2 = one_tile(q_tiles[0])
        return idx[:nq], d2[:nq]
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
