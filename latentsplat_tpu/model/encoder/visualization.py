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


def visualize_overlaps(
    context: dict,
    sampling,
    downscale: int = 1,
    is_monocular: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Valid-epipolar-sample masks per ordered view pair, green-tinted over
    the other view (ref: encoder_visualizer_epipolar.py:238-275)."""
    from ...misc.heterogeneous_pairings import generate_heterogeneous_index

    images = np.asarray(context["image"])[0]              # (v, h, w, 3)
    v, h, w = images.shape[:3]
    valid = np.asarray(sampling.valid)[0].astype(np.float32)  # (v, ov, ray)
    green = np.asarray([0.235, 0.706, 0.294], np.float32)

    ds = downscale
    valid = valid.reshape(v, -1, h // ds, w // ds)
    valid = valid.repeat(ds, axis=-2).repeat(ds, axis=-1)  # (v, ov, h, w)

    index, _ = generate_heterogeneous_index(v)
    rows = []
    for i in range(v):
        tinted = [
            valid[i, j, :, :, None] * (green + images[index[i, j]]) / 2
            for j in range(valid.shape[1])
        ]
        rows.append(hcat(images[i], *tinted))
    vis = add_label(vcat(*rows), "Context Overlaps")
    if is_monocular is not None:
        mono = np.asarray(is_monocular)[0].astype(np.float32)  # (v, h, w)
        mono_imgs = [np.repeat(m[:, :, None], 3, axis=-1) for m in mono]
        vis = hcat(vis, add_label(vcat(*mono_imgs), "Monocular?"))
    return add_border(vis)


def visualize_gaussians(
    context: dict,
    gaussians,
    gaussians_per_pixel: int,
) -> np.ndarray:
    """Per-sample grids of opacity, DC color (raw and opacity-weighted), and
    covariance determinant (ref: encoder_visualizer_epipolar.py:278-309).
    Gaussians are ordered (v h w spp) like the encoder emits them."""
    from ...visualization.color_map import apply_color_map

    images = np.asarray(context["image"])[0]              # (v, h, w, 3)
    v, h, w = images.shape[:3]
    spp = gaussians_per_pixel

    opac = np.asarray(gaussians.opacities)[0].reshape(v, h, w, spp)
    colors = np.asarray(gaussians.color_harmonics)[0, :, :, 0]  # DC component
    colors = colors.reshape(v, h, w, spp, 3)
    det = np.linalg.det(np.asarray(gaussians.covariances)[0])
    det = apply_color_map(det / max(det.max(), 1e-12), "inferno")
    det = det.reshape(v, h, w, spp, 3)

    def grid(x):  # (v, h, w, spp[, c]) -> rows per spp, cols per view
        return vcat(*[
            hcat(*[x[i, :, :, s] for i in range(v)]) for s in range(spp)
        ])

    opac_rgb = np.repeat(opac[..., None], 3, axis=-1)
    return add_border(
        hcat(
            add_label(hcat(*images), "Context"),
            add_label(grid(opac_rgb), "Opacities"),
            add_label(grid(colors * opac[..., None]), "Colors"),
            add_label(grid(colors), "Colors (Raw)"),
            add_label(grid(det), "Determinant"),
        )
    )


def _ray_and_sample_views(images, sampling, ray_indices):
    """Shared scaffolding: rays drawn in view 0, per-ray colors."""
    from ...visualization.colors import get_distinct_color

    xy_ray = np.asarray(sampling.xy_ray)[0, 0]            # (ray, 2)
    colors = np.asarray([get_distinct_color(i) for i in range(len(ray_indices))])
    ray_view = draw_points(
        images[0], xy_ray[ray_indices],
        np.zeros((len(ray_indices), 3)), radius=4.0,
    )
    ray_view = draw_points(ray_view, xy_ray[ray_indices], colors, radius=3.0)
    return ray_view, colors


def visualize_probabilities(
    context: dict,
    sampling,
    pdf: np.ndarray,          # (b, v, ray, sample)
    num_rays: int = 8,
) -> np.ndarray:
    """Per-sample pdf painted along the epipolar segments, raw and per-ray
    magnified (ref: encoder_visualizer_epipolar.py:310-381)."""
    images = np.asarray(context["image"])[0]
    n = np.asarray(sampling.xy_ray).shape[2]
    ray_indices = np.linspace(0, n - 1, num_rays).astype(int)
    ray_view, colors = _ray_and_sample_views(images, sampling, ray_indices)

    near = np.asarray(sampling.xy_sample_near)[0, 0, 0, ray_indices]
    far = np.asarray(sampling.xy_sample_far)[0, 0, 0, ray_indices]
    p = np.asarray(pdf)[0, 0, ray_indices]                # (r, s)

    def paint(weights):
        seg_colors = (weights[:, :, None] * colors[:, None, :]).reshape(-1, 3)
        return draw_lines(
            images[1 % images.shape[0]],
            near.reshape(-1, 2), far.reshape(-1, 2),
            seg_colors, radius=3.0,
        )

    magnified = p / np.maximum(p.max(axis=1, keepdims=True), 1e-12)
    return add_border(
        hcat(
            add_label(ray_view, "Rays"),
            add_label(paint(p), "Samples"),
            add_label(paint(magnified), "Samples (Magnified PDF)"),
        )
    )


def visualize_attention_maps(
    context: dict,
    sampling,
    attention: np.ndarray,    # (layer, head, ray, sample) for view 0 -> ov 0
    num_rays: int = 8,
) -> np.ndarray:
    """Cross-attention weights painted along the epipolar segments, one
    panel per (layer, head) (ref: encoder_visualizer_epipolar.py:137-210;
    hooks become `capture_attention` + a reshape on the caller side)."""
    images = np.asarray(context["image"])[0]
    n = np.asarray(sampling.xy_ray).shape[2]
    ray_indices = np.linspace(0, n - 1, num_rays).astype(int)
    ray_view, colors = _ray_and_sample_views(images, sampling, ray_indices)

    near = np.asarray(sampling.xy_sample_near)[0, 0, 0, ray_indices]
    far = np.asarray(sampling.xy_sample_far)[0, 0, 0, ray_indices]
    attention = np.asarray(attention)[:, :, ray_indices]

    layer_panels = []
    for il in range(attention.shape[0]):
        head_panels = []
        for ih in range(attention.shape[1]):
            w = attention[il, ih]                          # (r, s)
            seg_colors = (w[:, :, None] * colors[:, None, :]).reshape(-1, 3)
            head_panels.append(
                draw_lines(
                    images[1 % images.shape[0]],
                    near.reshape(-1, 2), far.reshape(-1, 2),
                    seg_colors, radius=2.0,
                )
            )
        layer_panels.append(add_label(vcat(*head_panels), f"Layer {il}"))
    keys = add_label(add_border(hcat(*layer_panels)), "Keys & Values")
    return add_border(hcat(add_label(ray_view, "Rays"), keys))


def visualize_epipolar_color_samples(
    context: dict,
    num_rays: int = 8,
    num_samples: int = 32,
) -> np.ndarray:
    """Epipolar samples colored by the RGB they sample from the other view
    (ref: encoder_visualizer_epipolar.py:474-536): runs the sampler over
    the raw images as features."""
    from .epipolar_sampler import sample_epipolar_features

    images = context["image"]
    sampling = sample_epipolar_features(
        images,
        context["extrinsics"],
        context["intrinsics"],
        context["near"],
        context["far"],
        num_samples=num_samples,
    )
    imgs = np.asarray(images)[0]
    n = np.asarray(sampling.xy_ray).shape[2]
    ray_indices = np.linspace(0, n - 1, num_rays).astype(int)
    ray_view, colors = _ray_and_sample_views(imgs, sampling, ray_indices)

    xy = np.asarray(sampling.xy_sample)[0, 0, 0, ray_indices].reshape(-1, 2)
    rgb = np.asarray(sampling.features)[0, 0, 0, ray_indices].reshape(-1, 3)
    ring = np.repeat(colors, num_samples, axis=0)
    sample_view = draw_points(imgs[1 % imgs.shape[0]], xy, ring, radius=4.0)
    sample_view = draw_points(sample_view, xy, rgb, radius=3.0)
    return add_border(
        hcat(add_label(ray_view, "Ray View"), add_label(sample_view, "Sample View"))
    )
