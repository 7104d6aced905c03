"""Iterative Closest Point: point-to-point (SVD) and point-to-plane (GN).

TPU-native replacement for ``pcl::IterativeClosestPoint`` as used by the
reference's cuboid/object pose nodes
(``cuboid_detection/src/iterative_closest_point.cpp:170-182``: maxIter
5000, transformation epsilon 1e-9, Euclidean-fitness epsilon gate;
``object_detection/src/object_pose_detection.cpp:212-247``: restart loop).

Parity notes:
  * correspondence = nearest neighbor of each transformed source point
    in the target (MXU brute force, ``perception_tpu.ops.nn``), with a
    max-correspondence-distance gate;
  * ``fitness`` = mean squared NN distance over gated source points —
    exactly PCL ``getFitnessScore()`` (the 0.0004 acceptance threshold
    from the launch file applies to this value);
  * the *pose* of an object is the inverse of the source->target ICP
    transform when source = scene and target = template
    (``iterative_closest_point.cpp:179``) — inversion is the caller's
    business, this module returns source->target.

Point-to-plane is the SLAM-odometry workhorse: Gauss-Newton on the
linearized twist with residual r_i = n_i . (T p_i - q_i); the 6x6
normal equations are built as one (N, 6)^T (N, 6) matmul per iteration
(MXU), optionally Huber-weighted. Both solvers run a fixed-capacity
``lax.while_loop`` so the whole alignment jits into a single XLA
computation, and everything vmaps over a leading batch axis for
multi-object / multi-keyframe alignment (replacing the reference's
sequential per-cluster loop ``object_pose_detection.cpp:376-413``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from perception_tpu.geometry import se3
from perception_tpu.ops import nn as _nn
from perception_tpu.ops.points import apply_mask


class ICPResult(NamedTuple):
    transform: jax.Array   # (4, 4) source -> target
    fitness: jax.Array     # () mean squared correspondence distance
    num_corr: jax.Array    # () int32 gated correspondences at convergence
    iterations: jax.Array  # () int32
    converged: jax.Array   # () bool — hit an epsilon criterion (not iter cap)


def _umeyama(src: jax.Array, tgt: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted rigid alignment src -> tgt (Kabsch/Umeyama, no scale).

    src, tgt: (N, 3); w: (N,) nonnegative weights. Returns (4, 4).
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    cs = jnp.sum(src * w[:, None], axis=0) / wsum
    ct = jnp.sum(tgt * w[:, None], axis=0) / wsum
    H = ((src - cs) * w[:, None]).T @ (tgt - ct)  # (3, 3)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(det)
    R = Vt.T @ D @ U.T
    t = ct - R @ cs
    return se3.make_T(R, t)


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "nn_tile"),
)
def icp_point_to_point(
    source: jax.Array,
    source_mask: jax.Array,
    target: jax.Array,
    target_mask: jax.Array,
    init_transform: Optional[jax.Array] = None,
    max_iterations: int = 50,
    transformation_epsilon: float = 1e-9,
    euclidean_fitness_epsilon: float = 0.0,
    max_correspondence_distance: float = 1.0e5,
    nn_tile: int = 4096,
) -> ICPResult:
    """Classic point-to-point ICP via per-iteration SVD alignment.

    Convergence mirrors PCL: stop when the incremental transform's
    squared twist norm < transformation_epsilon, or the fitness change
    < euclidean_fitness_epsilon, or max_iterations is reached.
    """
    T0 = jnp.eye(4, dtype=source.dtype) if init_transform is None else init_transform
    source = apply_mask(source, source_mask)
    max_d2 = max_correspondence_distance * max_correspondence_distance

    def cond(state):
        T, it, prev_fit, done = state
        return (~done) & (it < max_iterations)

    def body(state):
        T, it, prev_fit, _ = state
        src_t = se3.transform_points(T, source)
        idx, d2 = _nn.nearest_neighbor(src_t, target, target_mask, tile=nn_tile)
        w = (source_mask & (d2 <= max_d2)).astype(source.dtype)
        delta = _umeyama(src_t, target[idx], w)
        T_new = delta @ T
        fit = jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0)
        # PCL-style epsilons on the increment and the fitness change.
        twist = se3.se3_log(delta)
        small_step = jnp.sum(twist * twist) < transformation_epsilon
        small_fit = jnp.abs(prev_fit - fit) < euclidean_fitness_epsilon
        done = small_step | small_fit
        return (T_new, it + 1, fit, done)

    init = (T0, jnp.int32(0), jnp.float32(jnp.inf), jnp.bool_(False))
    T, it, _, done = jax.lax.while_loop(cond, body, init)

    # Final fitness/correspondences against the converged transform.
    src_t = se3.transform_points(T, source)
    idx, d2 = _nn.nearest_neighbor(src_t, target, target_mask, tile=nn_tile)
    gate = source_mask & (d2 <= max_d2)
    w = gate.astype(source.dtype)
    fitness = jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0)
    return ICPResult(
        transform=T,
        fitness=fitness,
        num_corr=jnp.sum(gate, dtype=jnp.int32),
        iterations=it,
        converged=done,
    )


def _huber_weight(r: jax.Array, delta: float) -> jax.Array:
    """IRLS weight for the Huber loss: 1 inside delta, delta/|r| outside."""
    absr = jnp.abs(r)
    return jnp.where(absr <= delta, 1.0, delta / jnp.maximum(absr, 1e-12))


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "nn_tile"),
)
def icp_point_to_plane(
    source: jax.Array,
    source_mask: jax.Array,
    target: jax.Array,
    target_normals: jax.Array,
    target_mask: jax.Array,
    init_transform: Optional[jax.Array] = None,
    max_iterations: int = 20,
    transformation_epsilon: float = 1e-10,
    max_correspondence_distance: float = 1.0e5,
    huber_delta: float = 0.02,
    damping: float = 1e-6,
    nn_tile: int = 4096,
) -> ICPResult:
    """Point-to-plane ICP by Gauss-Newton on the se(3) twist.

    Residual r_i = n_i . (T p_i - q_i) with q/n the NN target point and
    normal. Each iteration builds the 6x6 normal equations
    A = J^T W J, b = -J^T W r via one MXU matmul over the (N, 6)
    Jacobian (J_i = [n_i, (T p_i) x n_i]), solves the damped system,
    and updates T <- exp(xi) T. Converges in ~5-15 iterations where
    point-to-point needs hundreds — this is the odometry hot loop.
    """
    T0 = jnp.eye(4, dtype=source.dtype) if init_transform is None else init_transform
    source = apply_mask(source, source_mask)
    max_d2 = max_correspondence_distance * max_correspondence_distance

    def cond(state):
        T, it, prev_fit, done = state
        return (~done) & (it < max_iterations)

    def body(state):
        T, it, prev_fit, _ = state
        src_t = se3.transform_points(T, source)
        idx, d2 = _nn.nearest_neighbor(src_t, target, target_mask, tile=nn_tile)
        q = target[idx]
        n = target_normals[idx]
        gate = source_mask & (d2 <= max_d2)
        r = jnp.sum(n * (src_t - q), axis=-1)  # (N,)
        w = gate.astype(source.dtype) * _huber_weight(r, huber_delta)
        J = jnp.concatenate([n, jnp.cross(src_t, n)], axis=-1)  # (N, 6)
        Jw = J * w[:, None]
        A = Jw.T @ J  # (6, 6) — MXU reduction over N
        b = -(Jw.T @ r)
        A = A + damping * jnp.eye(6, dtype=A.dtype)
        xi = jnp.linalg.solve(A, b)
        T_new = se3.se3_exp(xi) @ T
        fit = jnp.sum(d2 * gate) / jnp.maximum(jnp.sum(gate), 1.0)
        done = jnp.sum(xi * xi) < transformation_epsilon
        return (T_new, it + 1, fit, done)

    init = (T0, jnp.int32(0), jnp.float32(jnp.inf), jnp.bool_(False))
    T, it, _, done = jax.lax.while_loop(cond, body, init)

    src_t = se3.transform_points(T, source)
    idx, d2 = _nn.nearest_neighbor(src_t, target, target_mask, tile=nn_tile)
    gate = source_mask & (d2 <= max_d2)
    w = gate.astype(source.dtype)
    fitness = jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0)
    return ICPResult(
        transform=T,
        fitness=fitness,
        num_corr=jnp.sum(gate, dtype=jnp.int32),
        iterations=it,
        converged=done,
    )


def icp_batched(
    sources: jax.Array,
    source_masks: jax.Array,
    target: jax.Array,
    target_mask: jax.Array,
    init_transforms: Optional[jax.Array] = None,
    **kwargs,
):
    """vmap point-to-point ICP of B source clouds against one target.

    Replaces the reference's sequential per-cluster / per-restart ICP
    loops (``object_pose_detection.cpp:212-247``): restarts become a
    batch axis and all alignments run concurrently on-chip.
    """
    B = sources.shape[0]
    if init_transforms is None:
        init_transforms = jnp.broadcast_to(jnp.eye(4, dtype=sources.dtype), (B, 4, 4))
    fn = functools.partial(icp_point_to_point, **kwargs)
    return jax.vmap(fn, in_axes=(0, 0, None, None, 0))(
        sources, source_masks, target, target_mask, init_transforms
    )
