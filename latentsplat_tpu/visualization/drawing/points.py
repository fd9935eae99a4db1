"""Anti-aliased 2D point drawing.

Parity with reference src/visualization/drawing/points.py:13-58.
"""

from __future__ import annotations

import numpy as np

from .coordinate_conversion import generate_conversions
from .rendering import render_over_image


def draw_points(
    image: np.ndarray,          # (h, w, 3) float [0,1]
    points: np.ndarray,         # (n, 2) xy
    color: np.ndarray,          # (3,) or (n, 3)
    radius: float = 1.0,        # pixels
    x_range: tuple[float, float] = (0.0, 1.0),
    y_range: tuple[float, float] = (0.0, 1.0),
    supersample: int = 4,
) -> np.ndarray:
    points = np.atleast_2d(np.asarray(points, np.float32))
    color = np.asarray(color, np.float32)
    if color.ndim == 1:
        color = np.broadcast_to(color, (points.shape[0], 3))

    conv = generate_conversions(image.shape[:2], x_range, y_range)
    centers = conv.world_to_pixel(points)

    def distance_fn(samples: np.ndarray):
        d = np.linalg.norm(samples[:, None, :] - centers[None], axis=-1)
        idx = np.argmin(d, axis=-1)
        return d[np.arange(d.shape[0]), idx], color[idx]

    return render_over_image(image, distance_fn, radius, supersample)
