"""Soft 2D drawing core: distance-field rasterization with supersampling.

Parity with reference src/visualization/drawing/rendering.py:11-155 (MSAA
soft drawing on tensors), simplified to dense numpy evaluation with k x k
supersampling — host-side visualization, not device compute.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

DistanceFn = Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]
# points (n, 2) -> (distance (n,), color (n, 3))


def generate_sample_grid(shape: tuple[int, int], supersample: int) -> np.ndarray:
    """Supersampled pixel-center coordinates, (h*k, w*k, 2) in xy order."""
    h, w = shape
    k = supersample
    ys = (np.arange(h * k) + 0.5) / k
    xs = (np.arange(w * k) + 0.5) / k
    grid = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return grid


def render(
    shape: tuple[int, int],
    distance_fn: DistanceFn,
    radius: float,
    supersample: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """Render a distance field -> (color (h, w, 3), alpha (h, w))."""
    h, w = shape
    k = supersample
    grid = generate_sample_grid(shape, k).reshape(-1, 2)
    distance, color = distance_fn(grid)
    alpha = np.clip(radius + 0.5 - distance, 0.0, 1.0)
    # Box-filter the supersamples.
    alpha = alpha.reshape(h, k, w, k).mean(axis=(1, 3))
    color = color.reshape(h, k, w, k, 3).mean(axis=(1, 3))
    return color, alpha


def render_over_image(
    image: np.ndarray,
    distance_fn: DistanceFn,
    radius: float,
    supersample: int = 4,
) -> np.ndarray:
    color, alpha = render(image.shape[:2], distance_fn, radius, supersample)
    return image * (1.0 - alpha[..., None]) + color * alpha[..., None]
