"""Camera frustum visualization: three axis-aligned projections.

Parity with reference src/visualization/drawing/cameras.py:14-196: compute
the frustum AABB, project cameras onto each axis pair, draw near/far planes
and the frustum edges with draw_lines, label each projection.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..annotation import add_label
from .lines import draw_lines


def unproject_frustum_corners(
    extrinsics: np.ndarray,   # (b, 4, 4)
    intrinsics: np.ndarray,   # (b, 3, 3) normalized
    depth: np.ndarray,        # (b,) or scalar
) -> np.ndarray:              # (b, 4, 3)
    b = extrinsics.shape[0]
    depth = np.broadcast_to(np.asarray(depth, np.float32), (b,))
    # Image corners in circular order.
    xy = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    xy_h = np.concatenate([xy, np.ones((4, 1), np.float32)], axis=-1)
    k_inv = np.linalg.inv(intrinsics)                   # (b, 3, 3)
    directions = np.einsum("bij,pj->bpi", k_inv, xy_h)  # camera-space rays
    directions = directions / directions[..., -1:]      # z-depth scaling
    directions = np.einsum("bij,bpj->bpi", extrinsics[:, :3, :3], directions)
    origins = extrinsics[:, None, :3, 3]
    return origins + depth[:, None, None] * directions


def compute_aabb(
    extrinsics: np.ndarray,
    intrinsics: np.ndarray,
    near: Optional[np.ndarray] = None,
    far: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray]:
    points = [extrinsics[:, :3, 3]]
    if near is not None:
        points.append(unproject_frustum_corners(extrinsics, intrinsics, near).reshape(-1, 3))
    if far is not None:
        points.append(unproject_frustum_corners(extrinsics, intrinsics, far).reshape(-1, 3))
    points = np.concatenate(points, axis=0)
    return points.min(axis=0), points.max(axis=0)


def compute_equal_aabb_with_margin(minima, maxima, margin: float = 0.1):
    midpoint = (maxima + minima) * 0.5
    span = (maxima - minima).max() * (1 + margin)
    return midpoint - 0.5 * span, midpoint + 0.5 * span


def draw_cameras(
    resolution: int,
    extrinsics: np.ndarray,   # (b, 4, 4)
    intrinsics: np.ndarray,   # (b, 3, 3)
    color: np.ndarray,        # (b, 3)
    near: Optional[np.ndarray] = None,
    far: Optional[np.ndarray] = None,
    margin: float = 0.1,
    frustum_scale: float = 0.05,
) -> list[np.ndarray]:
    """Three labeled axis-aligned projection images of the camera rig."""
    extrinsics = np.asarray(extrinsics, np.float32)
    intrinsics = np.asarray(intrinsics, np.float32)
    color = np.asarray(color, np.float32)

    minima, maxima = compute_aabb(extrinsics, intrinsics, near, far)
    scene_minima, scene_maxima = compute_equal_aabb_with_margin(minima, maxima, margin)
    span = (scene_maxima - scene_minima).max()

    corner_depth = span * frustum_scale
    frustum_corners = unproject_frustum_corners(extrinsics, intrinsics, corner_depth)
    near_corners = (
        unproject_frustum_corners(extrinsics, intrinsics, near)
        if near is not None else None
    )
    far_corners = (
        unproject_frustum_corners(extrinsics, intrinsics, far)
        if far is not None else None
    )

    projections = []
    for projected_axis in range(3):
        image = np.zeros((resolution, resolution, 3), np.float32)
        ix = (projected_axis + 1) % 3
        iy = (projected_axis + 2) % 3

        def project(points):
            return np.stack([points[..., ix], points[..., iy]], axis=-1)

        x_range = (scene_minima[ix], scene_maxima[ix])
        y_range = (scene_minima[iy], scene_maxima[iy])

        def lines(img, a, b2, col):
            return draw_lines(
                img, a.reshape(-1, 2), b2.reshape(-1, 2), col,
                radius=1.0, x_range=x_range, y_range=y_range,
            )

        gray = np.asarray([0.25, 0.25, 0.25])
        if near_corners is not None:
            pn = project(near_corners)
            image = lines(image, pn, np.roll(pn, 1, axis=1), gray)
        if far_corners is not None:
            pf = project(far_corners)
            image = lines(image, pf, np.roll(pf, 1, axis=1), gray)
        if near_corners is not None and far_corners is not None:
            image = lines(image, project(near_corners), project(far_corners), gray)

        origins = project(extrinsics[:, :3, 3])          # (b, 2)
        corners = project(frustum_corners)               # (b, 4, 2)
        b = origins.shape[0]
        start = np.concatenate(
            [np.repeat(origins[:, None], 4, axis=1), np.roll(corners, 1, axis=1)],
            axis=1,
        )                                                 # (b, 8, 2)
        end = np.concatenate([corners, corners], axis=1)  # (b, 8, 2)
        line_color = np.repeat(color[:, None], 8, axis=1).reshape(-1, 3)
        image = draw_lines(
            image, start.reshape(-1, 2), end.reshape(-1, 2), line_color,
            radius=1.0, x_range=x_range, y_range=y_range,
        )

        image = add_label(image, f"{'XYZ'[ix]}{'XYZ'[iy]} Projection")
        projections.append(image)
    return projections
