"""Cuboid template generation (the math of
``cuboid_detection/templates/make_cuboid.py:37-58``, reimplemented).

The reference samples the three *visible* faces of an L x W x H cuboid
centered at the origin — the faces at z = -H/2, y = -W/2, x = -L/2 —
on a regular grid of pitch ``density`` meters, to serve as the ICP
target template. Also provides the 8 bbox corner vertices used by
``publish_bounding_box`` (``iterative_closest_point.cpp:90-128``).
"""

from __future__ import annotations

import numpy as np

# Launch-file cuboid of record: L=0.2, W=0.1, H=0.03
# (cuboid_detection/launch/iterative_closest_point.launch:30-46).
DEFAULT_DIMS = (0.2, 0.1, 0.03)


def cuboid_template(
    length: float = 0.2,
    width: float = 0.1,
    height: float = 0.075,
    density: float = 0.002,
) -> np.ndarray:
    """Sample the 3 visible faces of a centered cuboid -> float32 (N, 3).

    Matches make_cuboid.py: half-open grids ``arange(-D/2, D/2, density)``
    per axis; face order bottom (z=-H/2), front (y=-W/2), left (x=-L/2).
    """
    xs = np.arange(-length / 2.0, length / 2.0, density)
    ys = np.arange(-width / 2.0, width / 2.0, density)
    zs = np.arange(-height / 2.0, height / 2.0, density)

    def face(a_vals, b_vals):
        a, b = np.meshgrid(a_vals, b_vals)
        return a.ravel(), b.ravel()

    fx, fy = face(xs, ys)
    bottom = np.stack([fx, fy, np.full_like(fx, -height / 2.0)], axis=1)
    fx, fz = face(xs, zs)
    front = np.stack([fx, np.full_like(fx, -width / 2.0), fz], axis=1)
    fy, fz = face(ys, zs)
    left = np.stack([np.full_like(fy, -length / 2.0), fy, fz], axis=1)

    return np.concatenate([bottom, front, left], axis=0).astype(np.float32)


def box_surface_template(
    dims, density: float = 0.002
) -> np.ndarray:
    """Sample all 6 faces of a centered box -> float32 (N, 3).

    The object_detection service templates are captured full-view
    clouds; a full-surface sampling plays the same ICP-target role for
    synthetic objects of any orientation."""
    L, W, H = dims
    xs = np.arange(-L / 2.0, L / 2.0, density)
    ys = np.arange(-W / 2.0, W / 2.0, density)
    zs = np.arange(-H / 2.0, H / 2.0, density)
    faces = []
    for vals_a, vals_b, axis, half in [
        (xs, ys, 2, H / 2.0),
        (xs, zs, 1, W / 2.0),
        (ys, zs, 0, L / 2.0),
    ]:
        a, b = np.meshgrid(vals_a, vals_b)
        flat = np.stack([a.ravel(), b.ravel()], 1)
        for sign in (-1.0, 1.0):
            pts = np.insert(flat, axis, sign * half, axis=1)
            faces.append(pts)
    return np.concatenate(faces, 0).astype(np.float32)


def cylinder_surface_template(
    radius: float, height: float, density: float = 0.002
) -> np.ndarray:
    """Sample the side + caps of a z-axis-centered cylinder -> (N, 3)."""
    n_theta = max(8, int(round(2 * np.pi * radius / density)))
    thetas = np.linspace(0.0, 2 * np.pi, n_theta, endpoint=False)
    zs = np.arange(-height / 2.0, height / 2.0, density)
    tt, zz = np.meshgrid(thetas, zs)
    side = np.stack(
        [radius * np.cos(tt).ravel(), radius * np.sin(tt).ravel(), zz.ravel()], 1
    )
    rr = np.arange(density, radius, density)
    caps = []
    for r in rr:
        n = max(6, int(round(2 * np.pi * r / density)))
        th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        ring = np.stack([r * np.cos(th), r * np.sin(th)], 1)
        for sign in (-1.0, 1.0):
            caps.append(
                np.concatenate(
                    [ring, np.full((len(ring), 1), sign * height / 2.0)], 1
                )
            )
    return np.concatenate([side] + caps, 0).astype(np.float32)


def cuboid_vertices(length: float, width: float, height: float) -> np.ndarray:
    """The 8 corners of a centered L x W x H cuboid, float32 (8, 3)."""
    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=np.float32,
    )
    return signs * np.array([length / 2.0, width / 2.0, height / 2.0], dtype=np.float32)


# The 12 edges of the cuboid as vertex-index pairs (for bbox overlay
# drawing, mirroring draw_bbox.py:66-77's edge list semantics).
CUBOID_EDGES = np.array(
    [
        (0, 1), (0, 2), (3, 1), (3, 2),
        (4, 5), (4, 6), (7, 5), (7, 6),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    dtype=np.int32,
)
