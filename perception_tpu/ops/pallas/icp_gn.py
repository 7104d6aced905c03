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


def _kernel(scalars_ref, src_ref, tgt_ref, nrm_ref, out_ref):
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    max_d2 = scalars_ref[0]
    huber = scalars_ref[1]

    src = src_ref[0]      # (B, 8): x, y, z, valid, 0...
    tgt = tgt_ref[:]      # (M, 8): x, y, z, 0...
    nrm = nrm_ref[:]      # (M, 8)

    # Distances: |p|^2 - 2 p.t + |t|^2 over the first 3 components
    # (pad components are zero so the full 8-dim contraction is exact).
    p_sq = jnp.sum(src[:, :3] * src[:, :3], axis=1)          # (B,)
    t_sq = jnp.sum(tgt * tgt, axis=1)                         # (M,)
    cross = jax.lax.dot_general(
        src, tgt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, M) — src[:,3:] x tgt[:,3:] contribute 0
    d2 = p_sq[:, None] - 2.0 * cross + t_sq[None, :]

    best = jnp.argmin(d2, axis=1)                              # (B,)
    dmin = jnp.min(d2, axis=1)
    M = tgt.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) == best[:, None]
    ).astype(jnp.float32)
    q = jax.lax.dot_general(
        onehot, tgt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, 8)
    n = jax.lax.dot_general(
        onehot, nrm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    valid = src[:, 3]
    gate = jnp.where((dmin <= max_d2) & (valid > 0.5), 1.0, 0.0)

    dx = src[:, 0] - q[:, 0]
    dy = src[:, 1] - q[:, 1]
    dz = src[:, 2] - q[:, 2]
    r = n[:, 0] * dx + n[:, 1] * dy + n[:, 2] * dz             # (B,)
    absr = jnp.abs(r)
    w = gate * jnp.where(absr <= huber, 1.0, huber / jnp.maximum(absr, 1e-12))

    cx = src[:, 1] * n[:, 2] - src[:, 2] * n[:, 1]
    cy = src[:, 2] * n[:, 0] - src[:, 0] * n[:, 2]
    cz = src[:, 0] * n[:, 1] - src[:, 1] * n[:, 0]

    ones = jnp.ones_like(r)
    jhat = jnp.stack([n[:, 0], n[:, 1], n[:, 2], cx, cy, cz, r, ones], axis=1)  # (B, 8)
    jw = jhat * w[:, None]
    Msys = jax.lax.dot_general(
        jw, jhat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, 8)
    out_ref[0] += Msys


@functools.partial(jax.jit, static_argnames=("block",))
def gn_system_pallas(
    src_t: jax.Array,       # (R, N, 3) transformed source points (per restart)
    src_mask: jax.Array,    # (R, N)
    target: jax.Array,      # (M, 3)
    target_normals: jax.Array,  # (M, 3)
    target_mask: jax.Array,     # (M,)
    max_correspondence_distance: float,
    huber_delta: float,
    block: int = 512,
) -> jax.Array:
    """Returns (R, 8, 8) fused normal-equation systems (see module doc)."""
    R, N, _ = src_t.shape
    M = target.shape[0]

    n_pad = (-N) % block
    src8 = jnp.concatenate(
        [src_t, src_mask[..., None].astype(src_t.dtype), jnp.zeros((R, N, 4), src_t.dtype)],
        axis=-1,
    )
    src8 = jnp.pad(src8, ((0, 0), (0, n_pad), (0, 0)))

    # Park masked targets far away so they never win the argmin.
    tgt = jnp.where(target_mask[:, None], target, 1.0e6)
    m_pad = (-M) % 128
    tgt8 = jnp.pad(tgt, ((0, m_pad), (0, 5)), constant_values=0.0)
    tgt8 = tgt8.at[M:, :3].set(1.0e6) if m_pad else tgt8
    nrm8 = jnp.pad(target_normals, ((0, m_pad), (0, 5)))

    scalars = jnp.asarray(
        [max_correspondence_distance**2, huber_delta], jnp.float32
    )

    grid = (R, (N + n_pad) // block)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block, 8), lambda r, nb: (r, nb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 8), lambda r, nb: (r, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 8, 8), jnp.float32),
        interpret=interpret_mode(),
    )(scalars, src8, tgt8, nrm8)
    return out


def gn_system_oracle(src_t, src_mask, target, target_normals, target_mask,
                     max_correspondence_distance, huber_delta):
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
        return (jhat * w[:, None]).T @ jhat

    return jax.vmap(one)(src_t, src_mask)
