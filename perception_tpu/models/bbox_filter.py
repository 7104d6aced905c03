"""3-D point filtering by a 2-D detection rectangle + bbox projection.

Equivalents of two reference nodes:
  * ``cuboid_detection/src/bbox_filter.cpp`` — project every cloud
    point through the 3x4 camera projection matrix P and keep those
    whose pixel lands inside the detection Rectangle
    (``within_bbox`` :30-51, filter loop :89-95);
  * ``cuboid_detection/scripts/draw_bbox.py`` — project the 8 ICP bbox
    vertices through P . E (extrinsics) for the 2-D overlay (:57-62),
    edges per templates.CUBOID_EDGES.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def project_P(P: jax.Array, points: jax.Array) -> jax.Array:
    """(3, 4) projection matrix, (..., 3) points -> (..., 2) pixels."""
    hom = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    uvw = hom @ P.T
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)


def filter_by_rect(
    points: jax.Array,
    mask: jax.Array,
    P: jax.Array,
    rect_xyxy,
) -> jax.Array:
    """Narrow ``mask`` to points projecting inside the rectangle."""
    uv = project_P(P, points)
    x1, y1, x2, y2 = (jnp.asarray(v, points.dtype) for v in rect_xyxy)
    inside = (
        (uv[..., 0] >= x1) & (uv[..., 0] <= x2) & (uv[..., 1] >= y1) & (uv[..., 1] <= y2)
    )
    return mask & inside & (points[..., 2] > 0)


def project_bbox(
    P: jax.Array,
    extrinsics: jax.Array,
    bbox_vertices: jax.Array,
) -> jax.Array:
    """Depth-frame bbox vertices (8, 3) -> color-image pixels (8, 2)
    through extrinsics E (4, 4) then projection P (3, 4) — the
    ``P @ E @ X`` chain of draw_bbox.py:57-62."""
    hom = jnp.concatenate([bbox_vertices, jnp.ones((bbox_vertices.shape[0], 1), bbox_vertices.dtype)], axis=-1)
    cam = (hom @ extrinsics.T)[:, :3]
    return project_P(P, cam)
