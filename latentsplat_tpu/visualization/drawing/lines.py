"""Anti-aliased 2D line drawing.

Parity with reference src/visualization/drawing/lines.py:13-66: soft
("round"-capped) segments composited over an image, coordinates in
normalized [0,1] image space by default.
"""

from __future__ import annotations

import numpy as np

from .coordinate_conversion import generate_conversions
from .rendering import render_over_image


def draw_lines(
    image: np.ndarray,          # (h, w, 3) float [0,1]
    start: np.ndarray,          # (n, 2) xy
    end: np.ndarray,            # (n, 2) xy
    color: np.ndarray,          # (3,) or (n, 3)
    radius: float = 1.0,        # pixels
    x_range: tuple[float, float] = (0.0, 1.0),
    y_range: tuple[float, float] = (0.0, 1.0),
    supersample: int = 4,
) -> np.ndarray:
    start = np.atleast_2d(np.asarray(start, np.float32))
    end = np.atleast_2d(np.asarray(end, np.float32))
    color = np.asarray(color, np.float32)
    if color.ndim == 1:
        color = np.broadcast_to(color, (start.shape[0], 3))

    conv = generate_conversions(image.shape[:2], x_range, y_range)
    a = conv.world_to_pixel(start)   # (n, 2)
    b = conv.world_to_pixel(end)

    def distance_fn(points: np.ndarray):
        # distance from each sample to its nearest segment
        p = points[:, None, :]                       # (s, 1, 2)
        ab = (b - a)[None]                           # (1, n, 2)
        ap = p - a[None]                             # (s, n, 2)
        denom = np.maximum((ab * ab).sum(-1), 1e-12)
        t = np.clip((ap * ab).sum(-1) / denom, 0.0, 1.0)
        closest = a[None] + t[..., None] * ab
        d = np.linalg.norm(p - closest, axis=-1)     # (s, n)
        idx = np.argmin(d, axis=-1)
        return d[np.arange(d.shape[0]), idx], color[idx]

    return render_over_image(image, distance_fn, radius, supersample)
