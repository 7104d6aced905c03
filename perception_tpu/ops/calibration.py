"""Camera calibration: homographies, Zhang intrinsics, extrinsics.

Capability parity with the reference's calibration module
(``openpose/src/openpose/calibration/cameraParameterEstimation.cpp``:
chessboard intrinsics, pairwise multi-camera extrinsics). The math is
batched jnp (Zhang's method); chessboard *detection* is in-house
(``ops/chessboard.py``: device saddle response + host lattice ordering),
with a cv2 backend kept for cross-validation.

Pipeline: per-view DLT homographies (normalized), the IAC constraint
system -> closed-form K, per-view extrinsics from H and K, and
pairwise camera-to-camera extrinsics by averaging per-view relative
poses (rotation averaging via quaternion eigen-mean).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from perception_tpu.geometry import se3


def homography_dlt(obj_xy: jax.Array, img_uv: jax.Array) -> jax.Array:
    """Planar DLT homography H (3, 3): img ~ H [X, Y, 1], with Hartley
    normalization for conditioning."""

    def normalizer(pts):
        c = pts.mean(axis=0)
        s = jnp.sqrt(2.0) / jnp.maximum(jnp.linalg.norm(pts - c, axis=1).mean(), 1e-9)
        T = jnp.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])
        return T

    To = normalizer(obj_xy)
    Ti = normalizer(img_uv)
    o = jnp.concatenate([obj_xy, jnp.ones_like(obj_xy[:, :1])], axis=1) @ To.T
    i = jnp.concatenate([img_uv, jnp.ones_like(img_uv[:, :1])], axis=1) @ Ti.T

    n = obj_xy.shape[0]
    zeros = jnp.zeros((n, 3))
    r1 = jnp.concatenate([o, zeros, -i[:, 0:1] * o], axis=1)
    r2 = jnp.concatenate([zeros, o, -i[:, 1:2] * o], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2n, 9)
    _, V = jnp.linalg.eigh(A.T @ A)
    h = V[:, 0]
    H = h.reshape(3, 3)
    H = jnp.linalg.inv(Ti) @ H @ To
    return H / H[2, 2]


def _v_ij(H, i, j):
    return jnp.array(
        [
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ]
    )


def intrinsics_zhang(homographies: jax.Array) -> jax.Array:
    """(V, 3, 3) homographies (>= 3 views) -> K (3, 3) by the IAC
    constraints (Zhang 2000, closed form)."""

    def rows(H):
        return jnp.stack([_v_ij(H, 0, 1), _v_ij(H, 0, 0) - _v_ij(H, 1, 1)])

    Vm = jax.vmap(rows)(homographies).reshape(-1, 6)
    _, evecs = jnp.linalg.eigh(Vm.T @ Vm)
    b11, b12, b22, b13, b23, b33 = evecs[:, 0]

    v0 = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + v0 * (b12 * b13 - b11 * b23)) / b11
    alpha = jnp.sqrt(jnp.abs(lam / b11))
    beta = jnp.sqrt(jnp.abs(lam * b11 / (b11 * b22 - b12 * b12)))
    gamma = -b12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - b13 * alpha * alpha / lam
    return jnp.array([[alpha, gamma, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]])


def extrinsics_from_homography(K: jax.Array, H: jax.Array) -> jax.Array:
    """Board pose (camera <- board, (4, 4)) from K and the view's H."""
    Kinv = jnp.linalg.inv(K)
    h1 = Kinv @ H[:, 0]
    h2 = Kinv @ H[:, 1]
    h3 = Kinv @ H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(h1), 1e-12)
    # The homography scale sign is arbitrary; a board behind the camera
    # (t_z < 0) means it was flipped — negate r1, r2, t.
    flip = jnp.sign(h3[2] * lam)
    flip = jnp.where(flip == 0, 1.0, flip)
    r1 = h1 * lam * flip
    r2 = h2 * lam * flip
    t = h3 * lam * flip
    r3 = jnp.cross(r1, r2)
    R = se3.orthonormalize(jnp.stack([r1, r2, r3], axis=1))
    return se3.make_T(R, t)


def average_rotations(Rs: jax.Array) -> jax.Array:
    """Chordal L2 rotation average via the quaternion eigen-method."""
    qs = jax.vmap(se3.matrix_to_quat)(Rs)  # (V, 4)
    # Align hemispheres to the first quaternion.
    ref = qs[0]
    signs = jnp.sign(jnp.sum(qs * ref, axis=1, keepdims=True))
    signs = jnp.where(signs == 0, 1.0, signs)
    qs = qs * signs
    M = qs.T @ qs
    _, V = jnp.linalg.eigh(M)
    q = V[:, -1]
    return se3.quat_to_matrix(q)


def pairwise_extrinsics(T_cam0_board: jax.Array, T_cam1_board: jax.Array) -> jax.Array:
    """(V, 4, 4) board poses in two cameras -> averaged T_cam0_cam1."""
    rel = T_cam0_board @ se3.inverse(T_cam1_board)  # (V, 4, 4)
    R = average_rotations(rel[:, :3, :3])
    t = rel[:, :3, 3].mean(axis=0)
    return se3.make_T(R, t)


def chessboard_object_points(rows: int, cols: int, square: float) -> np.ndarray:
    """(rows*cols, 2) planar board model (meters)."""
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    return np.stack([xs.ravel() * square, ys.ravel() * square], 1).astype(np.float32)


def detect_chessboard(gray: np.ndarray, rows: int, cols: int, backend: str = "native"):
    """Corner detection; returns (rows*cols, 2) row-major or None.

    ``backend='native'`` (default) uses the in-house saddle detector +
    lattice ordering (``ops/chessboard.py`` — the gridPatternFunctions
    capability); ``backend='cv2'`` delegates to OpenCV at the host edge."""
    if backend == "native":
        from perception_tpu.ops.chessboard import detect_chessboard_native

        g = np.asarray(gray, np.float32)
        if g.max() > 1.5:  # uint8-scaled input
            g = g / 255.0
        return detect_chessboard_native(g, rows, cols)

    import cv2

    found, corners = cv2.findChessboardCorners(
        gray.astype(np.uint8), (cols, rows),
        flags=cv2.CALIB_CB_ADAPTIVE_THRESH | cv2.CALIB_CB_NORMALIZE_IMAGE,
    )
    if not found:
        return None
    corners = cv2.cornerSubPix(
        gray.astype(np.uint8), corners, (5, 5), (-1, -1),
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3),
    )
    return corners.reshape(-1, 2)


def calibrate_camera(
    object_xy: jax.Array,
    image_uvs: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(N, 2) board model + (V, N, 2) corner observations ->
    (K (3, 3), board poses (V, 4, 4))."""
    Hs = jax.vmap(lambda uv: homography_dlt(object_xy, uv))(image_uvs)
    K = intrinsics_zhang(Hs)
    Ts = jax.vmap(lambda H: extrinsics_from_homography(K, H))(Hs)
    return K, Ts
