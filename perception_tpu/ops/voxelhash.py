"""Voxel-hash nearest-neighbor search for large clouds.

The north star's "batched voxel-hash NN-gather" primitive
(BASELINE.json) — the TPU replacement for the KD-tree inside PCL's ICP
(reference: cuboid_detection/src/iterative_closest_point.cpp:170-178,
object_detection/src/object_pose_detection.cpp:345-349). The MXU brute
force (ops/nn.py) wins for the 10^3-10^4 point working sets of the
cuboid pipeline; beyond ~10^4 reference points this module is the
sublinear engine.

TPU-first design (r4 rewrite — no per-query gathers at all):

  build:  quantize reference points to cells of size = search radius on
          a grid fitted to the cloud's bounding box; sort by cell id
          once -> contiguous per-cell runs in one flat table.
  query:  queries are processed in TILES of spatially-coherent points
          (sorted by cell id, or already coherent from the caller).
          Each tile's 27-neighborhood lives inside ONE contiguous
          range of the cell-sorted table ([min cell - slab, max cell +
          slab]); the kernel slices that range and brute-forces the
          (tile x range) distances on-chip:

            * candidates ride the SUBLANE axis, queries the LANE axis,
              so the argmin reduction is a cheap sublane reduce (the
              lane-axis argmin was measured 5x the cost of the d2
              compute itself);
            * d2 is exact IEEE f32 (q-p)^2 broadcast-FMA — no
              |a|^2+|b|^2-2ab cancellation, so results are bit-exact
              argmin over true f32 distances (index-exact vs a KD-tree
              oracle in f64 on non-degenerate data);
            * the per-tile range start is data-dependent: a scalar-
              prefetch grid maps each grid step to its table block.

          Per-query work is O(points in the tile's slab range), not
          O(M) — sublinear in the map size, and every memory access is
          a contiguous block DMA.

Exactness: any true neighbor within ``radius`` of a query lands in the
tile's range (superset of the query's 27 cells) unless the range
overflowed ``rng_pts`` (reported via ``return_stats``); the result then
equals exact NN whenever the true NN distance <= radius.

Production pattern (ICP): sort the source cloud by cell id ONCE per
frame, then every Gauss-Newton iteration queries the transformed
points with ``sort=False`` — the stale order stays tile-coherent under
mm-scale pose updates, queries return in the caller's layout, and the
whole correspondence search is one Pallas kernel per iteration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from perception_tpu.ops.points import SENTINEL, apply_mask, bounds

_TABLE_PAD = 1024  # table rows padded to this multiple (divisible by rblk)


class VoxelHash(NamedTuple):
    points: jax.Array      # (N, 3) sorted by cell id
    table: jax.Array       # (Npad, 8) f32 rows [x, y, z, 1, 0...] —
                           # candidates-on-sublanes layout the query
                           # kernel slices; padding rows are SENTINEL
                           # coords (their d2 is ~1e12, never winning)
    tableT: jax.Array      # (8, Npad) transposed copy for the
                           # HBM-streaming large-table kernel (DMA
                           # slices must be 128-aligned on lanes)
    cell_ids: jax.Array    # (N,) int32 sorted
    origin: jax.Array      # (3,)
    cell_size: jax.Array   # ()
    dims: jax.Array        # (3,) int32 grid extents (traced)
    sentinel_id: jax.Array # () int32 id marking invalid/padded slots
    order: jax.Array       # (N,) int32 original index per sorted slot —
                           # gather per-point attributes (normals,
                           # colors) into hash order with
                           # ``attr[vh.order]``


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

    n = pts_sorted.shape[0]
    # One extra sentinel block past the data: per-tile chunk windows
    # are rblk-quantized, so a range flush against the table end needs
    # slack to cover its tail without out-of-bounds slices.
    npad = -(-max(n, 1) // _TABLE_PAD) * _TABLE_PAD + _TABLE_PAD
    table = jnp.full((npad, 8), 0.0, pts_sorted.dtype)
    table = table.at[:, :3].set(SENTINEL)
    table = table.at[:n, :3].set(pts_sorted)
    table = table.at[:n, 3].set(1.0)
    return VoxelHash(
        points=pts_sorted,
        table=table,
        tableT=table.T,
        cell_ids=sorted_ids,
        origin=origin,
        cell_size=cell_size,
        dims=dims,
        sentinel_id=sentinel,
        order=order.astype(jnp.int32),
    )


def sort_by_cell(vh: VoxelHash, pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sort ``pts`` into this hash's cell-id order (tile coherence).

    Returns (pts_sorted, order). Production ICP calls this once per
    frame and then queries with ``sort=False`` every iteration."""
    cid = _cell_ids(pts, vh.origin, vh.cell_size, vh.dims)
    _, order = jax.lax.sort(
        (cid, jnp.arange(pts.shape[0], dtype=jnp.int32)), num_keys=1
    )
    return pts[order], order


def _tile_ranges(vh: VoxelHash, q_pad, nq, tile, R, rblk, align: int = 8):
    """Per-tile contiguous candidate range in the sorted table.

    Correct for ANY query order (min/max over the tile's real cell
    ids); tight when tiles are spatially coherent. Returns
    (start8 (ntiles,) 8-aligned element offsets,
     nchunk (ntiles,) rblk-chunk trip counts,
     overflow fraction of tiles whose range exceeded the R cap).

    The trip count is per-tile DYNAMIC: sparse tiles do one chunk,
    dense ones as many as their slab range needs (up to the R safety
    cap) — total kernel work tracks the actual candidate mass instead
    of a worst-case static capacity (the range-length distribution is
    heavily skewed: p50 ~100 candidates vs p99.9 ~1.6k on the
    crossover bench cloud)."""
    dims = vh.dims
    nqp = q_pad.shape[0]
    ntiles = nqp // tile
    slop = dims[1] * dims[2] + dims[2] + 1  # +-1 x-slab + y-row + z-cell

    cid = _cell_ids(q_pad, vh.origin, vh.cell_size, dims)
    valid = (jnp.arange(nqp) < nq).reshape(ntiles, tile)
    cid_t = cid.reshape(ntiles, tile)
    big = jnp.int32(2**31 - 1)
    mincid = jnp.min(jnp.where(valid, cid_t, big), axis=1)
    maxcid = jnp.max(jnp.where(valid, cid_t, -1), axis=1)
    lo = mincid - slop
    hi = maxcid + slop + 1
    starts = jnp.searchsorted(vh.cell_ids, lo, method="sort").astype(jnp.int32)
    ends = jnp.searchsorted(vh.cell_ids, hi, method="sort").astype(jnp.int32)

    npad = vh.table.shape[0]
    # Aligned starts (8 = f32 sublane tiling for the VMEM kernel; 128 =
    # lane tiling for the HBM-streaming kernel, whose DMA offsets must
    # be PROVABLY lane-aligned — they are passed in units of ``align``
    # and multiplied by the constant inside the kernel). One align-unit
    # of slack covers the down-quantization so the range tail is never
    # cut.
    start_a = (jnp.clip(starts, 0, max(npad - rblk, 0)) // align) * align
    span = jnp.minimum(ends, npad) - start_a
    nchunk = jnp.clip(-(-span // rblk), 1, R // rblk)
    nchunk = jnp.minimum(nchunk, (npad - start_a) // rblk)
    nchunk = jnp.maximum(nchunk, 1).astype(jnp.int32)
    overflow = jnp.sum(((ends - starts) > (R - align)) & (maxcid >= 0)) / jnp.maximum(
        jnp.sum(maxcid >= 0), 1
    )
    return (start_a // align).astype(jnp.int32), nchunk, overflow


# Above this table size the whole-table-in-VMEM kernel is replaced by
# the HBM-streaming variant: multiple VMEM-resident pallas calls with
# >= ~64k-row operands in one XLA computation crash the TPU compiler
# (measured: standalone query fine at 132k rows, two calls in one jit
# crash at 65k), and the in-ICP use runs one call per GN iteration.
_VMEM_TABLE_MAX = 49152


def _query_kernel_pallas_stream(vh, qT, start8, nchunk, tile, rblk):
    """Large-table TPU kernel: the table stays in HBM as its (8, Npad)
    transposed copy (lane-dim DMA slices must be 128-aligned); each
    chunk of a tile's candidate range is DMA'd into a VMEM scratch
    inside the dynamic chunk loop. Queries ride sublanes here and
    candidates lanes — the lane-axis argmin is pricier than the VMEM
    kernel's sublane reduce, but the large-map regime has small
    per-tile work (a few thousand source points against each range).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nqp = qT.shape[1]
    ntiles = nqp // tile
    q_rows = qT.T  # (nqp, 8) — queries on sublanes

    def kernel(start_ref, nchunk_ref, q_ref, tab_ref, d2_ref, idx_ref,
               pbuf, sem):
        i = pl.program_id(0)
        q = q_ref[:]    # (tile, 8)
        start = start_ref[i]

        def body(c, carry):
            dmin, imin = carry
            # start rides in 128-lane units so Mosaic can PROVE the
            # dynamic DMA offset is tile-aligned.
            off = start * 128 + c * rblk
            dma = pltpu.make_async_copy(
                tab_ref.at[:, pl.ds(off, rblk)], pbuf, sem
            )
            dma.start()
            dma.wait()
            p = pbuf[:]                                   # (8, rblk)
            dx = q[:, 0:1] - p[0, :][None, :]
            dy = q[:, 1:2] - p[1, :][None, :]
            dz = q[:, 2:3] - p[2, :][None, :]
            d2 = dx * dx + dy * dy + dz * dz              # (tile, rblk)
            cmin = jnp.min(d2, axis=1)[None, :]           # (1, tile)
            lnl = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            cloc = jnp.min(
                jnp.where(d2 <= cmin[0][:, None], lnl, jnp.int32(2**31 - 1)),
                axis=1,
            )[None, :]
            gidx = off + cloc
            better = cmin < dmin
            return (jnp.where(better, cmin, dmin),
                    jnp.where(better, gidx, imin))

        dmin0 = jnp.full((1, tile), 4.0e12, jnp.float32)
        imin0 = jnp.zeros((1, tile), jnp.int32)
        dmin, imin = jax.lax.fori_loop(0, nchunk_ref[i], body, (dmin0, imin0))
        d2_ref[:] = dmin
        idx_ref[:] = imin

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i, s, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # (8, Npad) in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i, s, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, s, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, rblk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    d2, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, nqp), jnp.float32),
            jax.ShapeDtypeStruct((1, nqp), jnp.int32),
        ],
    )(start8, nchunk, q_rows, vh.tableT)
    return idx[0], d2[0]


def _query_kernel_pallas(vh, qT, start8, nchunk, tile, rblk):
    """TPU kernel: table resident in VMEM, one grid step per query
    tile, per-tile dynamic chunk loop over its candidate range."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if vh.table.shape[0] > _VMEM_TABLE_MAX:
        return _query_kernel_pallas_stream(vh, qT, start8, nchunk, tile, rblk)

    nqp = qT.shape[1]
    ntiles = nqp // tile

    def kernel(start_ref, nchunk_ref, qT_ref, tab_ref, d2_ref, idx_ref):
        i = pl.program_id(0)
        q = qT_ref[:]   # (8, T)
        start = start_ref[i] * 8  # units of the sublane alignment

        def body(c, carry):
            dmin, imin = carry
            off = start + c * rblk
            p = tab_ref[pl.ds(off, rblk), :]              # (rblk, 8)
            # Exact f32 (q-p)^2 — candidates on sublanes, queries on
            # lanes: the argmin reduction runs over sublanes, which is
            # vreg-wise elementwise work instead of lane shuffles
            # (measured 5x cheaper).
            dx = q[0, :][None, :] - p[:, 0][:, None]
            dy = q[1, :][None, :] - p[:, 1][:, None]
            dz = q[2, :][None, :] - p[:, 2][:, None]
            d2 = dx * dx + dy * dy + dz * dz              # (rblk, T)
            cmin = jnp.min(d2, axis=0)[None, :]           # (1, T)
            snl = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
            # First (smallest-index) row achieving the min — ties
            # break like argmin.
            cloc = jnp.min(
                jnp.where(d2 <= cmin, snl, jnp.int32(2**31 - 1)), axis=0
            )[None, :]
            gidx = off + cloc
            better = cmin < dmin
            return (jnp.where(better, cmin, dmin),
                    jnp.where(better, gidx, imin))

        dmin0 = jnp.full((1, tile), 4.0e12, jnp.float32)
        imin0 = jnp.zeros((1, tile), jnp.int32)
        dmin, imin = jax.lax.fori_loop(0, nchunk_ref[i], body, (dmin0, imin0))
        d2_ref[:] = dmin
        idx_ref[:] = imin

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, s, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table, one DMA
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i, s, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, s, c: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    d2, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, nqp), jnp.float32),
            jax.ShapeDtypeStruct((1, nqp), jnp.int32),
        ],
    )(start8, nchunk, qT, vh.table)
    return idx[0], d2[0]


def _query_kernel_xla(vh, q_pad, start8, nchunk, tile, R, rblk):
    """Oracle path (CPU tests / non-TPU backends): same semantics as
    the Pallas kernel — per-tile contiguous slice + argmin with
    first-index tie-break. Uses the static R cap per tile (a superset
    of the dynamic chunk count) with candidates beyond the covered
    span masked out."""
    nqp = q_pad.shape[0]
    ntiles = nqp // tile
    q_tiles = q_pad.reshape(ntiles, tile, 3)
    # Extend by R sentinel rows so the per-tile dynamic_slice never
    # clamps its start (clamping would misalign the coverage mask).
    tab_ext = jnp.concatenate(
        [vh.table, jnp.full((R, 8), 0.0, vh.table.dtype)
         .at[:, :3].set(SENTINEL)], axis=0
    )

    def one_tile(args):
        q, s0, nc = args
        blk = jax.lax.dynamic_slice(tab_ext, (s0, 0), (R, 8))
        p = blk[:, :3]                                    # (R, 3)
        d2 = jnp.sum((q[:, None, :] - p[None, :, :]) ** 2, axis=-1)
        covered = jnp.arange(R) < nc * rblk
        d2 = jnp.where(covered[None, :], d2, 4.0e12)
        loc = jnp.argmin(d2, axis=1)
        bd = jnp.take_along_axis(d2, loc[:, None], axis=1)[:, 0]
        return (s0 + loc).astype(jnp.int32), bd

    idx, d2 = jax.lax.map(one_tile, (q_tiles, start8, nchunk))
    return idx.reshape(-1), d2.reshape(-1)


def _auto_params(nq: int, m: int, npad: int, rblk: int):
    """Tile size from the query/map ratio, range SAFETY CAP from the
    table size.

    A tile of cell-sorted queries spans ~``m * tile / nq`` of the
    sorted table (both sides cover the same scene), so sparse queries
    (nq << m) get small tiles; 512 is the lane-efficient ceiling. The
    per-tile work is dynamic (chunk trip counts), so the cap only
    bounds pathological tiles (incoherent order / depth edges)."""
    ratio = nq / max(m, 1)
    if ratio >= 8:
        tile = 512
    elif ratio >= 2:
        tile = 256
    else:
        tile = 128
    rng = min(npad, 16384)
    rng = -(-rng // rblk) * rblk
    return tile, rng


@functools.partial(
    jax.jit,
    static_argnames=("tile", "rng_pts", "rblk", "sort", "return_stats"),
)
def query(
    vh: VoxelHash,
    queries: jax.Array,
    tile: int | None = None,
    rng_pts: int | None = None,
    rblk: int = 512,
    sort: bool = True,
    return_stats: bool = False,
):
    """Nearest reference point per query within ~cell_size radius.

    Returns (idx (Nq,) into the *sorted* hash points, dist2 (Nq,))
    [+ overflow fraction with ``return_stats``]. dist2 is huge
    (sentinel-scale) when no candidate cell held a neighbor.

    ``rng_pts`` caps the per-tile candidate range; tiles whose slab
    range exceeds it lose tail candidates (counted by the overflow
    stat — raise ``rng_pts`` or shrink ``tile`` if it is nonzero).
    Both default to shape-adaptive values. ``sort=False`` skips the
    coherence sort and keeps the caller's order (use after
    ``sort_by_cell``; results come back unpermuted).
    """
    nq = queries.shape[0]
    npad_t = vh.table.shape[0]
    auto_tile, auto_rng = _auto_params(nq, vh.points.shape[0], npad_t, rblk)
    tile = auto_tile if tile is None else tile
    rng_pts = auto_rng if rng_pts is None else rng_pts
    nr = min(rng_pts + rblk, npad_t) // rblk
    R = nr * rblk

    pad = (-nq) % tile
    if sort:
        # Multi-operand sort carries the coordinates through the sort
        # (saves a (Nq, 3) row gather, ~1.3 ms at 307k on-chip).
        cid = _cell_ids(queries, vh.origin, vh.cell_size, vh.dims)
        _, qx, qy, qz, order_q = jax.lax.sort(
            (cid, queries[:, 0], queries[:, 1], queries[:, 2],
             jnp.arange(nq, dtype=jnp.int32)),
            num_keys=1,
        )
        q_use = jnp.stack([qx, qy, qz], axis=-1)
    else:
        q_use = queries
    q_pad = jnp.pad(q_use, ((0, pad), (0, 0)), constant_values=SENTINEL)

    stream = vh.table.shape[0] > _VMEM_TABLE_MAX
    align = 128 if stream else 8
    start_u, nchunk, overflow = _tile_ranges(
        vh, q_pad, nq, tile, R, rblk, align=align
    )

    if jax.default_backend() == "tpu":
        nqp = nq + pad
        qT = jnp.zeros((8, nqp), q_pad.dtype)
        qT = qT.at[:3].set(q_pad.T)
        idx, d2 = _query_kernel_pallas(vh, qT, start_u, nchunk, tile, rblk)
    else:
        idx, d2 = _query_kernel_xla(
            vh, q_pad, start_u * align, nchunk, tile, R, rblk
        )

    n = vh.points.shape[0]
    idx = jnp.minimum(idx[:nq], n - 1)
    d2 = d2[:nq]
    if sort:
        # Unsort by direct scatter (one pass each; the inverse-perm +
        # gather formulation costs an extra permutation build).
        idx = jnp.zeros(nq, jnp.int32).at[order_q].set(idx)
        d2 = jnp.zeros(nq, d2.dtype).at[order_q].set(d2)
    if return_stats:
        return idx, d2, overflow
    return idx, d2


def nearest_neighbor_voxelhash(
    query_pts: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    radius: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-shot build+query; returns (points (Nq, 3) of the neighbors,
    dist2, found mask). Neighbors farther than ``radius`` are misses."""
    vh = build(ref, ref_mask, cell_size=radius)
    idx, d2 = query(vh, query_pts)
    found = d2 <= radius * radius
    return vh.points[idx], d2, found
