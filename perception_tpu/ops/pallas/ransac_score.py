"""Fused RANSAC hypothesis-scoring Pallas kernel.

The north-star requirement (BASELINE.json): "fuse RANSAC hypothesis
scoring into a single masked-reduction kernel". Scores K plane
hypotheses against N points in one pass:

    score[k] = sum_i mask[i] * (|p_i . n_k + d_k| <= tau)

Layout: points are packed homogeneous (N, 4) = [x, y, z, 1] and
hypotheses (K, 4) = [a, b, c, d], so the distance matrix is one
(TN, 4) x (4, TK) MXU contraction per tile; threshold + mask + count
happen in-register before anything is written back — the (N, K)
distance matrix never exists in HBM (at N=16k, K=1024 that matrix is
64 MB; the kernel streams it through VMEM in (2048, 512) tiles).

Grid: (K tiles, N tiles) with the N axis innermost, accumulating into
the (1, K) score row (output block revisited across the N axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perception_tpu.ops.pallas import interpret_mode

TILE_N = 2048
TILE_K = 512


def _kernel(tau_ref, pts_ref, mask_ref, hyp_ref, out_ref):
    n_idx = pl.program_id(1)

    @pl.when(n_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tau = tau_ref[0]
    pts = pts_ref[:]          # (TILE_N, 4) homogeneous points
    hyp = hyp_ref[:]          # (TILE_K, 4) plane coefficients
    mask = mask_ref[:]        # (TILE_N, 1) f32 validity

    # (TILE_N, TILE_K) signed distances as 4 broadcast FMAs on the VPU.
    # (The MXU contraction loses f32 ULPs that flip counts for points
    # sitting exactly at the threshold; exact IEEE f32 keeps the kernel
    # bit-identical to the numpy oracle.)
    dist = pts[:, 0:1] * hyp[:, 0][None, :]
    dist += pts[:, 1:2] * hyp[:, 1][None, :]
    dist += pts[:, 2:3] * hyp[:, 2][None, :]
    dist += hyp[:, 3][None, :]
    inlier = (jnp.abs(dist) <= tau).astype(jnp.float32) * mask  # fused VPU
    out_ref[:] += jnp.sum(inlier, axis=0, keepdims=True)  # (1, TILE_K)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k"))
def ransac_score_pallas(
    points: jax.Array,
    mask: jax.Array,
    normals: jax.Array,
    d: jax.Array,
    threshold,
    tile_n: int = TILE_N,
    tile_k: int = TILE_K,
) -> jax.Array:
    """Inlier count per hypothesis: (N,3), (N,), (K,3), (K,) -> (K,) f32.

    Matches ``perception_tpu.ops.ransac._score`` (the jnp oracle).
    """
    n = points.shape[0]
    k = normals.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    k_pad = -(-k // tile_k) * tile_k

    pts4 = jnp.concatenate([points, jnp.ones((n, 1), points.dtype)], axis=1)
    pts4 = jnp.pad(pts4, ((0, n_pad - n), (0, 0)))
    hyp4 = jnp.concatenate([normals, d[:, None]], axis=1)
    hyp4 = jnp.pad(hyp4, ((0, k_pad - k), (0, 0)))
    maskf = jnp.pad(mask.astype(points.dtype), (0, n_pad - n))[:, None]
    tau = jnp.asarray([threshold], jnp.float32)

    grid = (k_pad // tile_k, n_pad // tile_n)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tau (1,)
            pl.BlockSpec((tile_n, 4), lambda ki, ni: (ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda ki, ni: (ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, 4), lambda ki, ni: (ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_k), lambda ki, ni: (0, ki), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
        interpret=interpret_mode(),
    )(tau, pts4, maskf, hyp4)
    return out[0, :k]
