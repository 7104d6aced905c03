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


def landmarks_overlay(image: np.ndarray, landmarks: np.ndarray, mask: np.ndarray,
                      color=(60, 220, 60)) -> np.ndarray:
    import cv2

    out = np.ascontiguousarray(image.copy())
    for i in range(len(landmarks)):
        if bool(mask[i]):
            cv2.circle(out, (int(landmarks[i, 0]), int(landmarks[i, 1])), 2, color, -1)
    return out
