"""World <-> pixel coordinate conversions for 2D drawing.

Parity with reference src/visualization/drawing/coordinate_conversion.py:
12-45: closures converting between normalized/world 2D coordinates and the
pixel grid of an image being drawn on.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np


class Conversions(NamedTuple):
    world_to_pixel: Callable[[np.ndarray], np.ndarray]
    pixel_to_world: Callable[[np.ndarray], np.ndarray]


def generate_conversions(
    shape: tuple[int, int],
    x_range: tuple[float, float] = (0.0, 1.0),
    y_range: tuple[float, float] = (0.0, 1.0),
) -> Conversions:
    h, w = shape
    x0, x1 = x_range
    y0, y1 = y_range

    def world_to_pixel(xy: np.ndarray) -> np.ndarray:
        x = (xy[..., 0] - x0) / (x1 - x0) * w
        y = (xy[..., 1] - y0) / (y1 - y0) * h
        return np.stack([x, y], axis=-1)

    def pixel_to_world(xy: np.ndarray) -> np.ndarray:
        x = xy[..., 0] / w * (x1 - x0) + x0
        y = xy[..., 1] / h * (y1 - y0) + y0
        return np.stack([x, y], axis=-1)

    return Conversions(world_to_pixel, pixel_to_world)
