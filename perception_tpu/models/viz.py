"""Debug visualization: skeleton/bbox/landmark overlays (host numpy).

The reference renders on-GPU (``renderPose.cu``) and in rviz; headless
equivalents here draw into numpy RGB images for savers/video output —
the "publish every intermediate" observability in picture form.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# A simple color cycle for person ids.
_COLORS = np.array(
    [
        (255, 80, 80), (80, 255, 80), (80, 120, 255), (255, 200, 60),
        (200, 80, 255), (60, 220, 220), (255, 140, 40), (150, 255, 100),
    ],
    np.uint8,
)


def _draw_line(img, p0, p1, color, thickness=2):
    import cv2

    cv2.line(img, (int(p0[0]), int(p0[1])), (int(p1[0]), int(p1[1])),
             tuple(int(c) for c in color), thickness, cv2.LINE_AA)


def draw_skeletons(
    image: np.ndarray,
    keypoints: np.ndarray,   # (P_people, P_parts, 3)
    mask: np.ndarray,        # (P_people,)
    limb_pairs: np.ndarray,  # (L, 2)
    ids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Render skeletons onto a copy of ``image`` (renderPose analog)."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    for pi in range(len(keypoints)):
        if not bool(mask[pi]):
            continue
        color = _COLORS[(int(ids[pi]) if ids is not None else pi) % len(_COLORS)]
        kp = keypoints[pi]
        for a, b in limb_pairs:
            if kp[a, 2] > 0 and kp[b, 2] > 0:
                _draw_line(out, kp[a], kp[b], color)
        for p in range(kp.shape[0]):
            if kp[p, 2] > 0:
                cv2.circle(out, (int(kp[p, 0]), int(kp[p, 1])), 3,
                           tuple(int(c) for c in color), -1, cv2.LINE_AA)
    return out


def draw_bbox_2d(image: np.ndarray, rect, color=(0, 255, 0)) -> np.ndarray:
    import cv2

    out = np.ascontiguousarray(image.copy())
    cv2.rectangle(out, (int(rect[0]), int(rect[1])), (int(rect[2]), int(rect[3])),
                  color, 2)
    return out


def draw_cuboid_bbox(
    image: np.ndarray,
    bbox_uv: np.ndarray,   # (8, 2) projected cuboid vertices
    edges: np.ndarray,     # (12, 2) vertex index pairs
    color=(0, 255, 0),
) -> np.ndarray:
    """The draw_bbox.py overlay: 12 cuboid edges in image space."""
    out = np.ascontiguousarray(image.copy())
    for a, b in edges:
        _draw_line(out, bbox_uv[a], bbox_uv[b], color)
    return out


def depth_to_vis(depth: np.ndarray, max_depth: float = 5.0) -> np.ndarray:
    """Depth (H, W) -> turbo-ish color visualization (H, W, 3) uint8."""
    import cv2

    d = np.nan_to_num(np.asarray(depth), nan=0.0)
    norm = np.clip(d / max_depth, 0, 1)
    gray = (norm * 255).astype(np.uint8)
    return cv2.applyColorMap(gray, cv2.COLORMAP_TURBO)[..., ::-1]


def render_points_3d(
    points: np.ndarray,            # (N, 3)
    colors: Optional[np.ndarray] = None,   # (N, 3) uint8 or None
    mask: Optional[np.ndarray] = None,
    size: Tuple[int, int] = (480, 640),
    eye: Tuple[float, float, float] = (0.0, -0.4, -0.8),
    target: Tuple[float, float, float] = (0.0, 0.0, 0.8),
    fov_deg: float = 60.0,
    point_px: int = 2,
    edges: Optional[np.ndarray] = None,    # (E, 2) index pairs drawn as lines
    background: int = 16,
) -> np.ndarray:
    """Offscreen 3-D point/edge renderer — the headless stand-in for
    the reference's OpenGL viewer (``gui/gui3D.cpp``) and rviz cloud
    display. Software look-at camera + z-buffered point splatting in
    numpy; returns an (H, W, 3) uint8 RGB image."""
    h, w = size
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    if mask is not None:
        keep = np.asarray(mask, bool)
    else:
        keep = np.isfinite(pts).all(axis=1)
    if colors is None:
        # Color by depth (z) for shape cues.
        zc = pts[:, 2]
        zn = (zc - np.nanmin(zc)) / max(np.nanmax(zc) - np.nanmin(zc), 1e-9)
        colors = np.stack([255 * (1 - zn), 80 + 0 * zn, 255 * zn], axis=-1).astype(np.uint8)

    # Look-at view matrix (camera z toward target, y-ish down like optical frames).
    eye_v = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye_v
    fwd /= np.linalg.norm(fwd) + 1e-12
    up_hint = np.array([0.0, 1.0, 0.0]) if abs(fwd[1]) < 0.95 else np.array([0.0, 0.0, 1.0])
    right = np.cross(up_hint, fwd)
    right /= np.linalg.norm(right) + 1e-12
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])          # world -> camera rows
    cam = (pts - eye_v) @ R.T

    f = 0.5 * w / np.tan(np.deg2rad(fov_deg) / 2)
    z = cam[:, 2]
    keep = keep & (z > 1e-6)
    u = np.where(keep, f * cam[:, 0] / np.where(keep, z, 1.0) + w / 2, -1)
    v = np.where(keep, f * cam[:, 1] / np.where(keep, z, 1.0) + h / 2, -1)

    img = np.full((h, w, 3), background, np.uint8)
    zbuf = np.full((h, w), np.inf, np.float64)

    ui = np.round(u).astype(np.int64)
    vi = np.round(v).astype(np.int64)
    inb = keep & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    idx = np.flatnonzero(inb)
    # Far-to-near painter order, then z-test for exactness on ties.
    order = idx[np.argsort(-z[idx])]
    r = max(int(point_px) // 2, 0)
    for i in order:
        y0, y1 = max(vi[i] - r, 0), min(vi[i] + r + 1, h)
        x0, x1 = max(ui[i] - r, 0), min(ui[i] + r + 1, w)
        patch = zbuf[y0:y1, x0:x1]
        m = z[i] < patch
        patch[m] = z[i]
        img[y0:y1, x0:x1][m] = colors[i]

    if edges is not None:
        for a, b in np.asarray(edges):
            if inb[a] and inb[b]:
                _draw_line(img, (ui[a], vi[a]), (ui[b], vi[b]), (255, 255, 255), 1)
    return img


def landmarks_overlay(image: np.ndarray, landmarks: np.ndarray, mask: np.ndarray,
                      color=(60, 220, 60)) -> np.ndarray:
    import cv2

    out = np.ascontiguousarray(image.copy())
    for i in range(len(landmarks)):
        if bool(mask[i]):
            cv2.circle(out, (int(landmarks[i, 0]), int(landmarks[i, 1])), 2, color, -1)
    return out


def render_body_model(
    joints: np.ndarray,               # (J, 3) posed joint positions (m)
    parents: np.ndarray,              # (J,) kinematic-tree parents (-1 root)
    size: Tuple[int, int] = (480, 640),
    bone_radius: float = 0.045,       # capsule radius (m)
    samples_per_bone: int = 96,
    eye: Tuple[float, float, float] = (0.0, -0.5, -1.2),
    target: Optional[Tuple[float, float, float]] = None,
) -> np.ndarray:
    """Render a fitted kinematic body model as capsule limbs — the
    headless equivalent of the reference's Adam body-model viewer
    (``gui/guiAdam.cpp``: render the Adam mesh posed by Adam_FastFit).
    Consumes ``models/body_fit.BodyFitResult.joints`` + the
    ``BodyModel.parents`` tree: each bone becomes a ring-sampled
    capsule point cloud, z-buffered through :func:`render_points_3d`,
    with the skeleton edges overlaid."""
    joints = np.asarray(joints, np.float64)
    parents = np.asarray(parents)
    if target is None:
        target = tuple(joints.mean(axis=0))

    rng = np.random.RandomState(0)
    pts, cols = [], []
    palette = np.asarray(_COLORS, np.uint8)
    for j in range(1, len(parents)):
        a, b = joints[parents[j]], joints[j]
        t = np.linspace(0.0, 1.0, samples_per_bone)[:, None]
        axis = b - a
        # Ring offsets perpendicular to the bone: capsule surface dots.
        n = axis / (np.linalg.norm(axis) + 1e-9)
        u = np.cross(n, [0.0, 0.0, 1.0])
        if np.linalg.norm(u) < 1e-6:
            u = np.cross(n, [0.0, 1.0, 0.0])
        u /= np.linalg.norm(u) + 1e-9
        v = np.cross(n, u)
        phi = rng.rand(samples_per_bone) * 2 * np.pi
        rad = bone_radius * np.sqrt(rng.rand(samples_per_bone))
        ring = (np.cos(phi)[:, None] * u + np.sin(phi)[:, None] * v) * rad[:, None]
        pts.append(a + t * axis + ring)
        cols.append(np.repeat(palette[j % len(palette)][None], samples_per_bone, 0))
    cloud = np.concatenate(pts, axis=0)
    colors = np.concatenate(cols, axis=0)

    # Append the joints themselves so skeleton edges index them directly.
    base = len(cloud)
    cloud = np.concatenate([cloud, joints], axis=0)
    colors = np.concatenate(
        [colors, np.full((len(joints), 3), 255, np.uint8)], axis=0
    )
    edges = np.asarray(
        [[base + parents[j], base + j] for j in range(1, len(parents))]
    )
    return render_points_3d(
        cloud, colors=colors, size=size, eye=eye, target=target,
        point_px=3, edges=edges,
    )
