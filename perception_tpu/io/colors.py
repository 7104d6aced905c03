"""Named-color lookup for label visualization.

Capability parity with cv_bridge's ``rgb_colors`` module
(vision_opencv/cv_bridge/src/rgb_colors.cpp: ``getRGBColor``, a
146-entry named-color table indexed modulo 146, used by
``cvtColorForDisplay`` to colorize 32SC1 label images).

Rather than transcribing the reference table, the same 146 colors are
derived from the CSS3 extended color keywords (the reference's table is
scikit-image's copy of that list): the alphabetically sorted CSS4 names
minus the two alias duplicates (``cyan``==``aqua``,
``magenta``==``fuchsia``), which is exactly 146 entries in the same
alphabetical order the reference enumerates.
"""

from __future__ import annotations

import numpy as np

try:  # matplotlib ships the CSS4 keyword table; fall back to a tiny cycle.
    from matplotlib.colors import CSS4_COLORS as _CSS4

    _NAMES = sorted(n for n in _CSS4 if n not in ("cyan", "magenta"))
    _TABLE = np.array(
        [tuple(int(_CSS4[n][i : i + 2], 16) / 255.0 for i in (1, 3, 5)) for n in _NAMES],
        dtype=np.float64,
    )
except Exception:  # pragma: no cover
    _NAMES = ["red", "green", "blue", "yellow", "cyan", "magenta"]
    _TABLE = np.array(
        [(1, 0, 0), (0, 0.5, 0), (0, 0, 1), (1, 1, 0), (0, 1, 1), (1, 0, 1)],
        dtype=np.float64,
    )

N_COLORS = len(_TABLE)


def color_name(index: int) -> str:
    """Name of color ``index % N_COLORS`` (alphabetical CSS3 order)."""
    return _NAMES[int(index) % N_COLORS]


def get_rgb_color(index: int) -> np.ndarray:
    """RGB in [0, 1] for an integer label (wraps modulo the table size),
    mirroring ``rgb_colors::getRGBColor`` (rgb_colors.cpp:46)."""
    return _TABLE[int(index) % N_COLORS].copy()


def label_image_to_rgb8(labels: np.ndarray, background: int = -1) -> np.ndarray:
    """Colorize an integer label image (H, W) into (H, W, 3) uint8.

    Equivalent of cvtColorForDisplay's 32SC1 branch (cv_bridge.cpp):
    each label gets a distinct named color; ``background`` labels map
    to black.
    """
    labels = np.asarray(labels)
    idx = np.where(labels == background, 0, labels % N_COLORS)
    out = (_TABLE[idx] * 255.0 + 0.5).astype(np.uint8)
    out[labels == background] = 0
    return out
