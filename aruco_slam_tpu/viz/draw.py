"""Pure-numpy raster primitives for the 2D overlay sink.

Replaces cv2.line/cv2.circle drawing in the reference's 2D viewer
(reference viewers/viewer_2d.py:140-190) without a native dependency.
Host-side only — never on the device hot path.
"""

from __future__ import annotations

import numpy as np


def draw_circle(img: np.ndarray, center, radius: int, color) -> None:
    """Filled circle, in place. img: (H, W, 3) uint8."""
    h, w = img.shape[:2]
    cx, cy = int(round(center[0])), int(round(center[1]))
    if not (-radius < cx < w + radius and -radius < cy < h + radius):
        return
    y0, y1 = max(cy - radius, 0), min(cy + radius + 1, h)
    x0, x1 = max(cx - radius, 0), min(cx + radius + 1, w)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    m = (yy - cy) ** 2 + (xx - cx) ** 2 <= radius * radius
    img[y0:y1, x0:x1][m] = color


def draw_line(img: np.ndarray, p0, p1, color, thickness: int = 2) -> None:
    """Anti-alias-free thick line, in place."""
    h, w = img.shape[:2]
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    n = min(n, 8 * max(h, w))  # clamp run-away off-screen lines
    ts = np.linspace(0.0, 1.0, n)
    xs = np.round(x0 + (x1 - x0) * ts).astype(np.int64)
    ys = np.round(y0 + (y1 - y0) * ts).astype(np.int64)
    r = thickness // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            xi = xs + dx
            yi = ys + dy
            keep = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            img[yi[keep], xi[keep]] = color


def draw_polyline(img, pts, color, thickness=2) -> None:
    for a, b in zip(pts[:-1], pts[1:]):
        draw_line(img, a, b, color, thickness)
