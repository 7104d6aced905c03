"""Fused Gauss-Newton ICP iteration kernel.

The north-star "Pallas Gauss-Newton ICP" (BASELINE.json): one kernel
performs, per source block, the entire inner loop body —

  1. brute-force correspondence: distance tile vs the VMEM-resident
     target via one MXU contraction + row argmin;
  2. target point/normal gather as one-hot matmuls (gather-free);
  3. residual r = n.(p - q), Jacobian J = [n, p x n], Huber weight;
  4. the whole normal-equation system as ONE (8, B) x (B, 8) MXU
     contraction of Jhat = [n | p x n | r | 1] against itself:
     M[:6,:6] = A = J^T W J,  M[:6,6] = J^T W r,  M[6,6] = r^T W r,
     M[7,7] = sum W  — accumulated across blocks and restarts in VMEM.

The outer loop (6x6 solve + SE(3) update, a few microseconds) stays in
jnp. Versus the XLA op-graph path this collapses ~25 ops per iteration
into one kernel launch and keeps every intermediate in VMEM.

Measured on TPU v5e (see round-1 notes): at the cuboid-template shapes
(target ~1-2k points) XLA's own fusion is already at parity, so the
pipeline keeps the jnp path; at dense-fusion shapes (N >= 4k source,
M >= 8k target) the VMEM-resident target wins big — 0.03 ms vs 1.13 ms
for (4096 x 8192), ~40x — which is the regime this kernel exists for.
Correspondences can differ from the oracle on exact distance ties
(both are true nearest neighbors).

Layout notes: source points are packed (B, 8) = [x, y, z, valid, 0...]
(the valid flag doubles as the mask — masked rows produce w = 0);
target points/normals are (M, 8) with zero padding so the contraction
dims align to the 8-sublane tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perception_tpu.ops.pallas import interpret_mode


def _kernel(scalars_ref, src_ref, tgtd_ref, tn_ref, out_ref, stats_ref):
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        stats_ref[:] = jnp.zeros_like(stats_ref)

    max_d2 = scalars_ref[0]
    huber = scalars_ref[1]

    src = src_ref[0]      # (B, 8): x, y, z, -0.5, valid, 0...
    tgtd = tgtd_ref[:]    # (M, 8): x, y, z, |t|^2, 0...
    tn = tn_ref[:]        # (M, 8): x, y, z, nx, ny, nz, 0, 0

    # Distances via ONE contraction: src.tgtd = p.t - 0.5|t|^2 (the
    # -0.5 source pad column multiplies the |t|^2 target column), so
    # d2 = |p|^2 - 2 src.tgtd. |t|^2 is precomputed host-side once per
    # call instead of per grid step.
    p_sq = (
        src[:, 0] * src[:, 0] + src[:, 1] * src[:, 1] + src[:, 2] * src[:, 2]
    )                                                          # (B,)
    half = jax.lax.dot_general(
        src, tgtd, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, M)
    d2 = p_sq[:, None] - 2.0 * half

    best = jnp.argmin(d2, axis=1)                              # (B,)
    dmin = jnp.min(d2, axis=1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) == best[:, None]
    ).astype(jnp.float32)
    # Point + normal gathered in ONE narrow matmul (round 1 used two
    # full-width one-hot contractions — 2x the gather FLOPs).
    qn = jax.lax.dot_general(
        onehot, tn, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, 8): qx qy qz nx ny nz 0 0

    valid = src[:, 4]
    gate = jnp.where((dmin <= max_d2) & (valid > 0.5), 1.0, 0.0)

    dx = src[:, 0] - qn[:, 0]
    dy = src[:, 1] - qn[:, 1]
    dz = src[:, 2] - qn[:, 2]
    n0, n1, n2 = qn[:, 3], qn[:, 4], qn[:, 5]
    r = n0 * dx + n1 * dy + n2 * dz                            # (B,)
    absr = jnp.abs(r)
    w = gate * jnp.where(absr <= huber, 1.0, huber / jnp.maximum(absr, 1e-12))

    cx = src[:, 1] * n2 - src[:, 2] * n1
    cy = src[:, 2] * n0 - src[:, 0] * n2
    cz = src[:, 0] * n1 - src[:, 1] * n0

    ones = jnp.ones_like(r)
    jhat = jnp.stack([n0, n1, n2, cx, cy, cz, r, ones], axis=1)  # (B, 8)
    jw = jhat * w[:, None]
    Msys = jax.lax.dot_general(
        jw, jhat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, 8)
    out_ref[0] += Msys

    # Correspondence stats for the caller's diagnostics (overlap /
    # PCL-style fitness): gate count and gated sum of squared NN dists.
    # Computed as one MXU contraction E^T G (1-D vector reductions and
    # scatters don't lower inside Mosaic): E selects row 0, G carries
    # [gate, gate*d2] columns, so (E^T G)[0, :2] = the two sums.
    gd2 = jnp.maximum(dmin, 0.0) * gate
    colb = jax.lax.broadcasted_iota(jnp.int32, (gate.shape[0], 8), 1)
    E = jnp.where(colb == 0, 1.0, 0.0)                         # (B, 8)
    G = jnp.where(colb == 0, gate[:, None], 0.0) + jnp.where(
        colb == 1, gd2[:, None], 0.0
    )                                                          # (B, 8)
    stats_ref[0] += jax.lax.dot_general(
        E, G, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("block", "return_stats"))
def gn_system_pallas(
    src_t: jax.Array,       # (R, N, 3) transformed source points (per restart)
    src_mask: jax.Array,    # (R, N)
    target: jax.Array,      # (M, 3)
    target_normals: jax.Array,  # (M, 3)
    target_mask: jax.Array,     # (M,)
    max_correspondence_distance: float,
    huber_delta: float,
    block: int = 512,
    return_stats: bool = False,
):
    """Returns (R, 8, 8) fused normal-equation systems (see module doc).

    With ``return_stats=True`` also returns (R, 2) correspondence stats
    [gate count, gated sum of squared NN distances] so callers can form
    overlap and PCL-fitness diagnostics without a second pass."""
    R, N, _ = src_t.shape
    M = target.shape[0]

    n_pad = (-N) % block
    minus_half = jnp.full((R, N, 1), -0.5, src_t.dtype)
    src8 = jnp.concatenate(
        [src_t, minus_half, src_mask[..., None].astype(src_t.dtype),
         jnp.zeros((R, N, 3), src_t.dtype)],
        axis=-1,
    )
    src8 = jnp.pad(src8, ((0, 0), (0, n_pad), (0, 0)))

    # Park masked targets far away so they never win the argmin.
    tgt = jnp.where(target_mask[:, None], target, 1.0e6)
    m_pad = (-M) % 128
    tgt_p = jnp.pad(tgt, ((0, m_pad), (0, 0)), constant_values=1.0e6)
    t_sq = jnp.sum(tgt_p * tgt_p, axis=1, keepdims=True)   # (Mp, 1)
    tgtd = jnp.concatenate(
        [tgt_p, t_sq, jnp.zeros((M + m_pad, 4), src_t.dtype)], axis=1
    )
    nrm_p = jnp.pad(target_normals, ((0, m_pad), (0, 0)))
    tn = jnp.concatenate(
        [tgt_p, nrm_p, jnp.zeros((M + m_pad, 2), src_t.dtype)], axis=1
    )

    scalars = jnp.asarray(
        [max_correspondence_distance**2, huber_delta], jnp.float32
    )

    grid = (R, (N + n_pad) // block)
    out, stats = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block, 8), lambda r, nb: (r, nb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, 8), lambda r, nb: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8), lambda r, nb: (r, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, 8, 8), jnp.float32),
            jax.ShapeDtypeStruct((R, 8, 8), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(scalars, src8, tgtd, tn)
    if return_stats:
        return out, stats[:, 0, :2]
    return out


def gn_system_oracle(src_t, src_mask, target, target_normals, target_mask,
                     max_correspondence_distance, huber_delta,
                     return_stats: bool = False):
    """jnp reference implementation (same math, gather-based)."""
    from perception_tpu.ops import nn as _nn

    def one(src, mask):
        idx, d2 = _nn.nearest_neighbor(src, target, target_mask)
        q = target[idx]
        n = target_normals[idx]
        gate = mask & (d2 <= max_correspondence_distance**2)
        r = jnp.sum(n * (src - q), axis=-1)
        absr = jnp.abs(r)
        w = gate * jnp.where(absr <= huber_delta, 1.0, huber_delta / jnp.maximum(absr, 1e-12))
        cx = jnp.cross(src, n)
        jhat = jnp.concatenate([n, cx, r[:, None], jnp.ones_like(r)[:, None]], axis=1)
        stats = jnp.stack([jnp.sum(gate.astype(r.dtype)), jnp.sum(d2 * gate)])
        return (jhat * w[:, None]).T @ jhat, stats

    M, stats = jax.vmap(one)(src_t, src_mask)
    if return_stats:
        return M, stats
    return M
