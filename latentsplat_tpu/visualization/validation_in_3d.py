"""3D validation visualizations: Gaussian projections + camera rigs.

Parity with reference src/visualization/validation_in_3d.py:26-116:
orthographic renders of the predicted Gaussians onto the three axis planes
(via the pulled-back-camera orthographic trick) and the context/target
camera frustum drawing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.rasterize.api import render_orthographic
from ..visualization.annotation import add_label
from ..visualization.drawing.cameras import (
    compute_equal_aabb_with_margin,
    draw_cameras,
)


def render_projections(
    gaussians,                 # model.types.Gaussians (batched)
    resolution: int,
    margin: float = 0.1,
    draw_label: bool = True,
    extra_label: str = "",
) -> np.ndarray:               # (b, 3, h', w', 3)
    means = np.asarray(gaussians.means)
    b = means.shape[0]
    minima = means.min(axis=1)
    maxima = means.max(axis=1)
    scene_minima, scene_maxima = compute_equal_aabb_with_margin(
        minima, maxima, margin=margin
    )

    projections = []
    for look_axis in range(3):
        right_axis = (look_axis + 1) % 3
        down_axis = (look_axis + 2) % 3

        extrinsics = np.zeros((b, 4, 4), np.float32)
        extrinsics[:, right_axis, 0] = 1
        extrinsics[:, down_axis, 1] = 1
        extrinsics[:, look_axis, 2] = 1
        extrinsics[:, right_axis, 3] = 0.5 * (
            scene_minima[:, right_axis] + scene_maxima[:, right_axis]
        )
        extrinsics[:, down_axis, 3] = 0.5 * (
            scene_minima[:, down_axis] + scene_maxima[:, down_axis]
        )
        extrinsics[:, look_axis, 3] = scene_minima[:, look_axis]
        extrinsics[:, 3, 3] = 1

        extents = scene_maxima - scene_minima
        far = extents[:, look_axis]
        near = np.zeros_like(far)
        width = extents[:, right_axis]
        height = extents[:, down_axis]

        out = render_orthographic(
            jnp.asarray(extrinsics),
            jnp.asarray(width),
            jnp.asarray(height),
            jnp.asarray(near),
            jnp.asarray(far),
            (resolution, resolution),
            jnp.zeros((b, 3), jnp.float32),
            gaussians.means,
            gaussians.covariances,
            gaussians.opacities,
            gaussian_color_sh=gaussians.color_harmonics,
            fov_degrees=10.0,
        )
        imgs = np.asarray(out.color)[:, 0].transpose(0, 2, 3, 1)  # (b, h, w, 3)
        if draw_label:
            label = f"{'XYZ'[right_axis]}{'XYZ'[down_axis]} Projection {extra_label}"
            imgs = np.stack([add_label(np.clip(x, 0, 1), label) for x in imgs])
        projections.append(imgs)

    # Pad to common size (labels can differ by a pixel).
    h = max(p.shape[1] for p in projections)
    w = max(p.shape[2] for p in projections)
    padded = [
        np.pad(p, ((0, 0), (0, h - p.shape[1]), (0, w - p.shape[2]), (0, 0)),
               constant_values=1.0)
        for p in projections
    ]
    return np.stack(padded, axis=1)


def render_cameras(batch: dict, resolution: int) -> list[np.ndarray]:
    """Context (white) + target (red) camera rig projections
    (ref: validation_in_3d.py:95-116)."""
    ctx = batch["context"]
    tgt = batch["target"]
    num_context = np.asarray(ctx["extrinsics"]).shape[1]
    num_target = np.asarray(tgt["extrinsics"]).shape[1]
    color = np.ones((num_context + num_target, 3), np.float32)
    color[num_context:, 1:] = 0

    return draw_cameras(
        resolution,
        np.concatenate(
            [np.asarray(ctx["extrinsics"])[0], np.asarray(tgt["extrinsics"])[0]]
        ),
        np.concatenate(
            [np.asarray(ctx["intrinsics"])[0], np.asarray(tgt["intrinsics"])[0]]
        ),
        color,
        np.concatenate([np.asarray(ctx["near"])[0], np.asarray(tgt["near"])[0]]),
        np.concatenate([np.asarray(ctx["far"])[0], np.asarray(tgt["far"])[0]]),
    )
