"""Data shims: crop / augmentation (host-side numpy) and bounds / patch
(device-side jnp, applied inside the train step like the reference's GPU
data shim, src/dataset/data_module.py:17-32 + encoder_epipolar.py:244-259).

Images are NHWC.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image


# -- host-side (numpy): crop + augmentation ---------------------------------


def _rescale_image(image: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """(h, w, 3) float [0,1] -> LANCZOS resize (ref: crop_shim.py:11-24)."""
    h, w = shape
    img8 = np.clip(image * 255.0, 0, 255).astype(np.uint8)
    resized = Image.fromarray(img8).resize((w, h), Image.LANCZOS)
    return np.asarray(resized).astype(np.float32) / 255.0


def _center_crop(images: np.ndarray, intrinsics: np.ndarray, shape):
    *_, h_in, w_in, _ = images.shape
    h_out, w_out = shape
    row = (h_in - h_out) // 2
    col = (w_in - w_out) // 2
    images = images[..., row : row + h_out, col : col + w_out, :]
    intrinsics = intrinsics.copy()
    intrinsics[..., 0, 0] *= w_in / w_out
    intrinsics[..., 1, 1] *= h_in / h_out
    return images, intrinsics


def rescale_and_crop(images: np.ndarray, intrinsics: np.ndarray, shape):
    """(v, h, w, 3) + (v, 3, 3) -> resize shorter side and center crop."""
    v, h_in, w_in, _ = images.shape
    h_out, w_out = shape
    assert h_out <= h_in and w_out <= w_in
    scale_factor = max(h_out / h_in, w_out / w_in)
    h_scaled = round(h_in * scale_factor)
    w_scaled = round(w_in * scale_factor)
    assert h_scaled == h_out or w_scaled == w_out
    images = np.stack([_rescale_image(im, (h_scaled, w_scaled)) for im in images])
    return _center_crop(images, intrinsics, shape)


def apply_crop_shim(example: dict, shape: tuple[int, int]) -> dict:
    out = dict(example)
    for key in ("context", "target"):
        views = dict(example[key])
        views["image"], views["intrinsics"] = rescale_and_crop(
            views["image"], views["intrinsics"], shape
        )
        out[key] = views
    return out


def _reflect_views(views: dict) -> dict:
    reflect = np.eye(4, dtype=np.float32)
    reflect[0, 0] = -1.0
    return {
        **views,
        "image": views["image"][..., ::-1, :].copy(),
        "extrinsics": reflect @ views["extrinsics"] @ reflect,
    }


def apply_augmentation_shim(example: dict, rng: np.random.Generator) -> dict:
    """50% horizontal flip with extrinsics reflection (ref: augmentation_shim.py)."""
    if rng.random() < 0.5:
        return example
    return {
        **example,
        "context": _reflect_views(example["context"]),
        "target": _reflect_views(example["target"]),
    }


# -- device-side (jnp): patch + bounds ---------------------------------------


def apply_patch_shim(batch: dict, patch_size: int) -> dict:
    """Center-crop images to a multiple of patch_size (ref: patch_shim.py)."""

    def per_views(views):
        h, w = views["image"].shape[-3:-1]
        assert h % 2 == 0 and w % 2 == 0
        h_new = (h // patch_size) * patch_size
        w_new = (w // patch_size) * patch_size
        row = (h - h_new) // 2
        col = (w - w_new) // 2
        image = views["image"][..., row : row + h_new, col : col + w_new, :]
        intrinsics = views["intrinsics"]
        scale = jnp.asarray(
            [[w / w_new, 1.0, 1.0], [1.0, h / h_new, 1.0], [1.0, 1.0, 1.0]],
            jnp.float32,
        )
        return {**views, "image": image, "intrinsics": intrinsics * scale}

    return {
        **batch,
        "context": per_views(batch["context"]),
        "target": per_views(batch["target"]),
    }


def compute_depth_for_disparity(
    extrinsics: jnp.ndarray,   # (b, v, 4, 4)
    intrinsics: jnp.ndarray,   # (b, v, 3, 3)
    image_shape: tuple[int, int],
    disparity: float,
    delta_min: float = 1e-6,
) -> jnp.ndarray:
    """Depth at which the max camera baseline subtends `disparity` pixels
    (ref: bounds_shim.py:9-37)."""
    origins = extrinsics[..., :3, 3]
    deltas = jnp.linalg.norm(origins[:, None] - origins[:, :, None], axis=-1)
    deltas = jnp.clip(deltas, delta_min, None)
    baselines = deltas.max(axis=(1, 2))

    h, w = image_shape
    pixel_size = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    # K[:2,:2]^-1 @ pixel_size for diagonal-dominant K.
    sizes = jnp.stack([pixel_size[0] / fx, pixel_size[1] / fy], axis=-1)
    mean_pixel_size = sizes.mean(axis=(1, 2))
    return baselines / (disparity * mean_pixel_size)


def apply_bounds_shim(batch: dict, near_disparity: float, far_disparity: float) -> dict:
    """Near/far from disparity heuristics over context baselines
    (ref: bounds_shim.py:40-83)."""
    context = batch["context"]
    b, cv = context["image"].shape[:2]
    h, w = context["image"].shape[-3:-1]
    near = compute_depth_for_disparity(
        context["extrinsics"], context["intrinsics"], (h, w), near_disparity
    )
    far = compute_depth_for_disparity(
        context["extrinsics"], context["intrinsics"], (h, w), far_disparity
    )
    target = batch["target"]
    tv = target["image"].shape[1]
    return {
        **batch,
        "context": {
            **context,
            "near": jnp.broadcast_to(near[:, None], (b, cv)),
            "far": jnp.broadcast_to(far[:, None], (b, cv)),
        },
        "target": {
            **target,
            "near": jnp.broadcast_to(near[:, None], (b, tv)),
            "far": jnp.broadcast_to(far[:, None], (b, tv)),
        },
    }
