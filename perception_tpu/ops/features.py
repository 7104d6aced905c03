"""Sparse visual features: FAST corners, oriented BRIEF, Hamming match.

SLAM front-end capability (BASELINE.json config #4: "ORB detect+match +
PnP"). The reference's closest analog is OpenPose's heatmap NMS
(``nmsBase.cu:51-249``) — the same local-max + threshold + top-K
structure reappears here as corner NMS. Design notes:

  * FAST-9: the 16-pixel Bresenham circle is evaluated as 16 shifted
    images (pure VPU, no gathers); a contiguous arc of >= 9
    brighter/darker pixels marks a corner, scored by absolute-diff sum;
  * NMS = 3x3 max-pool equality (lax.reduce_window), then top-K with a
    fixed capacity — masks, never dynamic shapes;
  * descriptors: 256-bit BRIEF on a box-smoothed image, steered by the
    intensity-centroid orientation (ORB's rBRIEF), packed as 8 uint32;
  * matching: XOR + population_count Hamming matrix, mutual-best +
    ratio test, fixed-capacity match list.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 16-pixel Bresenham circle of radius 3 (clockwise from 12 o'clock) —
# the standard FAST layout.
FAST_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    np.int32,
)  # (dx, dy)


class Keypoints(NamedTuple):
    uv: jax.Array      # (K, 2) float32 pixel coords (x, y)
    score: jax.Array   # (K,) corner response
    angle: jax.Array   # (K,) orientation radians
    mask: jax.Array    # (K,) valid


def _shifted(img: jax.Array, dx: int, dy: int) -> jax.Array:
    """Image translated by (dx, dy) with edge clamp (borders are masked
    out of detection anyway)."""
    return jnp.roll(img, (dy, dx), (0, 1))


@functools.partial(jax.jit, static_argnames=("max_keypoints", "arc", "subpixel"))
def fast_detect(
    img: jax.Array,
    threshold: float = 20.0,
    max_keypoints: int = 512,
    arc: int = 9,
    border: int = 16,
    subpixel: bool = False,
) -> Keypoints:
    """FAST-N corner detection on a grayscale (H, W) float image."""
    H, W = img.shape
    img = img.astype(jnp.float32)
    ring = jnp.stack([_shifted(img, int(dx), int(dy)) for dx, dy in FAST_CIRCLE])  # (16,H,W)

    bright = ring > (img + threshold)[None]
    dark = ring < (img - threshold)[None]

    # Contiguous circular arc >= `arc`: unrolled over the 16 start
    # positions on the doubled ring.
    bright2 = jnp.concatenate([bright, bright], axis=0)
    dark2 = jnp.concatenate([dark, dark], axis=0)
    is_corner = jnp.zeros((H, W), bool)
    for s in range(16):
        is_corner |= jnp.all(bright2[s : s + arc], axis=0)
        is_corner |= jnp.all(dark2[s : s + arc], axis=0)

    # Score: sum of |intensity difference| over the responding pixels.
    diff = jnp.abs(ring - img[None]) - threshold
    score = jnp.maximum(
        jnp.sum(jnp.where(bright, diff, 0.0), axis=0),
        jnp.sum(jnp.where(dark, diff, 0.0), axis=0),
    )
    score = jnp.where(is_corner, score, -1.0)

    # Border mask (descriptor patch must fit).
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    score = jnp.where(inb, score, -1.0)

    # 3x3 NMS: keep pixels equal to their neighborhood max.
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    score = jnp.where(score == pooled, score, -1.0)

    flat = score.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    py_i = top_idx // W
    px_i = top_idx % W
    valid = top_scores > 0

    xs = px_i.astype(jnp.float32)
    ys = py_i.astype(jnp.float32)
    if subpixel:
        # Optional sub-pixel localization: 1-D parabola fits on the raw
        # (pre-NMS) response along x and y — the same role as OpenPose's
        # sub-pixel heatmap peak refine (nmsBase.cu:165
        # writeResultKernel). Off by default: on smoothly-shaded images
        # it removes the ±0.5 px quantization floor, but on hard-edged
        # (piecewise-constant) textures the response is not parabolic
        # and the fit biases the corner (measured on the synthetic SLAM
        # scenes: max trajectory error 0.011 -> 0.025 m with it on).
        raw = jnp.maximum(
            jnp.sum(jnp.where(bright, diff, 0.0), axis=0),
            jnp.sum(jnp.where(dark, diff, 0.0), axis=0),
        )

        def _at(dy, dx):
            yy2 = jnp.clip(py_i + dy, 0, H - 1)
            xx2 = jnp.clip(px_i + dx, 0, W - 1)
            return raw[yy2, xx2]

        c = _at(0, 0)
        denom_x = _at(0, -1) - 2.0 * c + _at(0, 1)
        denom_y = _at(-1, 0) - 2.0 * c + _at(1, 0)
        dx = jnp.where(jnp.abs(denom_x) > 1e-6,
                       0.5 * (_at(0, -1) - _at(0, 1)) / denom_x, 0.0)
        dy = jnp.where(jnp.abs(denom_y) > 1e-6,
                       0.5 * (_at(-1, 0) - _at(1, 0)) / denom_y, 0.0)
        xs = xs + jnp.clip(dx, -0.5, 0.5)
        ys = ys + jnp.clip(dy, -0.5, 0.5)

    # Orientation: intensity centroid over an aligned square patch
    # (ORB uses a radius-15 disc; a 15x15 square is an adequate,
    # gather-light approximation).
    r = 7
    offs = jnp.arange(-r, r + 1)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    patch_y = jnp.clip(py_i[:, None, None] + oy[None], 0, H - 1)
    patch_x = jnp.clip(px_i[:, None, None] + ox[None], 0, W - 1)
    patches = img[patch_y, patch_x]  # (K, 15, 15)
    m01 = jnp.sum(patches * oy[None].astype(jnp.float32), axis=(1, 2))
    m10 = jnp.sum(patches * ox[None].astype(jnp.float32), axis=(1, 2))
    angle = jnp.arctan2(m01, m10)

    return Keypoints(
        uv=jnp.stack([xs, ys], axis=-1),
        score=jnp.where(valid, top_scores, 0.0),
        angle=jnp.where(valid, angle, 0.0),
        mask=valid,
    )


def _brief_pattern(n_bits: int = 256, patch: int = 31, seed: int = 42) -> np.ndarray:
    """Fixed Gaussian test-pair pattern (BRIEF-style), (n_bits, 4) int32
    = (x1, y1, x2, y2) offsets."""
    rng = np.random.RandomState(seed)
    sigma = patch / 5.0
    pts = np.clip(rng.randn(n_bits, 4) * sigma, -(patch // 2), patch // 2)
    return pts.astype(np.float32)


_PATTERN = _brief_pattern()


def box_blur(img: jax.Array, size: int = 5) -> jax.Array:
    """Mean filter via reduce_window (the smoothing BRIEF requires)."""
    s = jax.lax.reduce_window(
        img.astype(jnp.float32), 0.0, jax.lax.add, (size, size), (1, 1), "SAME"
    )
    c = jax.lax.reduce_window(
        jnp.ones_like(img, jnp.float32), 0.0, jax.lax.add, (size, size), (1, 1), "SAME"
    )
    return s / c


@jax.jit
def brief_describe(img: jax.Array, kps: Keypoints) -> jax.Array:
    """Steered BRIEF-256 descriptors: (K, 8) uint32.

    The test pattern is rotated by each keypoint's orientation and
    sampled with nearest-neighbor gathers from the blurred image.
    """
    H, W = img.shape
    smooth = box_blur(img, 5)
    pat = jnp.asarray(_PATTERN)  # (256, 4)

    ca, sa = jnp.cos(kps.angle), jnp.sin(kps.angle)  # (K,)

    def rot(x, y):
        # (K, 256) rotated offsets
        xr = ca[:, None] * x[None, :] - sa[:, None] * y[None, :]
        yr = sa[:, None] * x[None, :] + ca[:, None] * y[None, :]
        return xr, yr

    x1, y1 = rot(pat[:, 0], pat[:, 1])
    x2, y2 = rot(pat[:, 2], pat[:, 3])

    def sample(xo, yo):
        xs = jnp.clip(jnp.round(kps.uv[:, 0:1] + xo), 0, W - 1).astype(jnp.int32)
        ys = jnp.clip(jnp.round(kps.uv[:, 1:2] + yo), 0, H - 1).astype(jnp.int32)
        return smooth[ys, xs]  # (K, 256)

    bits = (sample(x1, y1) < sample(x2, y2)).astype(jnp.uint32)  # (K, 256)
    # Pack 256 bits into 8 uint32 words.
    bits = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


class Matches(NamedTuple):
    idx_a: jax.Array   # (M,) int32 index into set A
    idx_b: jax.Array   # (M,) int32 index into set B
    distance: jax.Array  # (M,) hamming distance
    mask: jax.Array    # (M,) valid


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_descriptors(
    desc_a: jax.Array,
    mask_a: jax.Array,
    desc_b: jax.Array,
    mask_b: jax.Array,
    max_distance: int = 64,
    ratio: float = 0.8,
    max_matches: int = 256,
) -> Matches:
    """Mutual-best Hamming matching with Lowe ratio test."""
    # (Na, Nb) Hamming distances: XOR + popcount over the 8 words.
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    big = jnp.int32(512)
    dist = jnp.where(mask_a[:, None] & mask_b[None, :], dist, big)

    best_b = jnp.argmin(dist, axis=1)  # (Na,)
    d_sorted = -jax.lax.top_k(-dist, 2)[0]  # (Na, 2) two smallest
    d1, d2 = d_sorted[:, 0], d_sorted[:, 1]
    best_a_of_b = jnp.argmin(dist, axis=0)  # (Nb,)
    mutual = best_a_of_b[best_b] == jnp.arange(dist.shape[0])
    ok = (
        mutual
        & (d1 <= max_distance)
        & (d1.astype(jnp.float32) <= ratio * jnp.maximum(d2.astype(jnp.float32), 1.0))
        & mask_a
    )

    score = jnp.where(ok, -d1, -big)
    top, idx_a = jax.lax.top_k(score, max_matches)
    valid = top > -big
    idx_b = best_b[idx_a]
    return Matches(
        idx_a=idx_a.astype(jnp.int32),
        idx_b=idx_b.astype(jnp.int32),
        distance=(-top).astype(jnp.int32),
        mask=valid,
    )
