"""High-level rendering API: the JAX/TPU equivalent of the reference's
`render_cuda` (src/model/decoder/cuda_splatting.py:56-167).

Differences by design (TPU-first):
  * The reference loops over views in Python, one CUDA launch each
    (cuda_splatting.py:124-162). Here the whole view batch is vmapped into a
    single compiled program.
  * Color SH (degree <= 4) is evaluated per-gaussian on the MXU (basis
    matmul) instead of inside the kernel; feature SH keeps the reference's
    outside-the-kernel evaluation (cuda_splatting.py:92-101) including the
    +0.5 offset. Color is offset by +0.5 and clamped at 0 exactly like the
    CUDA kernel's computeColorFromSH.
  * Scale-invariant pre-normalization by 1/near is preserved exactly
    (cuda_splatting.py:75-81).
"""

from __future__ import annotations

from math import isqrt
from typing import Literal, Optional

import jax
import jax.numpy as jnp

from ...geometry.conversions import depth_to_relative_disparity
from ...geometry.projection import invert_se3, homogenize_points
from ..sh import eval_sh
from .camera import project_gaussians_to_screen
from .dense import composite_dense
from .types import RenderOutput

DepthRenderingMode = Literal["depth", "disparity", "relative_disparity", "log"]

Backend = Literal["dense", "tiled"]


def render(
    extrinsics: jnp.ndarray,            # (B, 4, 4)
    intrinsics: jnp.ndarray,            # (B, 3, 3)
    near: jnp.ndarray,                  # (B,)
    far: jnp.ndarray,                   # (B,)
    image_shape: tuple[int, int],
    background_color: jnp.ndarray,      # (B, 3)
    gaussian_means: jnp.ndarray,        # (B, G, 3)
    gaussian_covariances: jnp.ndarray,  # (B, G, 3, 3)
    gaussian_opacities: jnp.ndarray,    # (B, G)
    gaussian_color_sh: Optional[jnp.ndarray] = None,      # (B, G, 3, d_sh)
    gaussian_feature_sh: Optional[jnp.ndarray] = None,    # (B, G, C, d_sh)
    scale_invariant: bool = True,
    use_sh: bool = True,
    backend: Backend = "tiled",
) -> RenderOutput:
    """Render gaussians to a batch of views."""
    assert gaussian_color_sh is not None or gaussian_feature_sh is not None
    if not use_sh:
        assert (gaussian_color_sh is None or gaussian_color_sh.shape[-1] == 1) and (
            gaussian_feature_sh is None or gaussian_feature_sh.shape[-1] == 1
        )

    if scale_invariant:
        # Pre-normalize the scene into a numerically safe range
        # (parity: cuda_splatting.py:75-81).
        scale = 1.0 / near
        extrinsics = extrinsics.at[..., :3, 3].multiply(scale[:, None])
        gaussian_covariances = gaussian_covariances * (scale[:, None, None, None] ** 2)
        gaussian_means = gaussian_means * scale[:, None, None]
        near = near * scale
        far = far * scale

    campos = extrinsics[:, :3, 3]

    has_color = gaussian_color_sh is not None
    has_feature = gaussian_feature_sh is not None
    n_color = 3 if has_color else 0

    def view_channels(means, color_sh, feature_sh, cam):
        """Per-view per-gaussian composited channel payload."""
        direction = means - cam[None, :]
        direction = direction / (
            jnp.linalg.norm(direction, axis=-1, keepdims=True) + 1e-12
        )
        parts = []
        if has_color:
            if use_sh:
                deg = isqrt(color_sh.shape[-1]) - 1
                col = eval_sh(deg, color_sh, direction) + 0.5
                # CUDA computeColorFromSH clamps at zero.
                col = jnp.maximum(col, 0.0)
            else:
                col = color_sh[..., 0]
            parts.append(col)
        if has_feature:
            if use_sh:
                deg = isqrt(feature_sh.shape[-1]) - 1
                # Parity with the Python-side feature SH path incl. +0.5
                # (cuda_splatting.py:92-101); no clamp for features.
                feat = eval_sh(deg, feature_sh, direction) + 0.5
            else:
                feat = feature_sh[..., 0]
            parts.append(feat)
        return jnp.concatenate(parts, axis=-1)

    def render_one(ext, intr, mns, covs, ops, c_sh, f_sh, cam, bg):
        channels = view_channels(mns, c_sh, f_sh, cam)
        sg = project_gaussians_to_screen(
            mns, covs, ops, channels, ext, intr, image_shape
        )
        n_ch = channels.shape[-1]
        bg_full = jnp.zeros((n_ch,), jnp.float32)
        if n_color:
            bg_full = bg_full.at[:n_color].set(bg)
        if backend == "dense":
            img, mask, depth = composite_dense(sg, image_shape, bg_full)
        else:
            from .tiled import composite_tiled

            img, mask, depth = composite_tiled(sg, image_shape, bg_full)
        return img, mask, depth

    imgs, masks, depths = jax.vmap(
        render_one,
        in_axes=(0, 0, 0, 0, 0, 0 if has_color else None,
                 0 if has_feature else None, 0, 0),
    )(
        extrinsics,
        intrinsics,
        gaussian_means,
        gaussian_covariances,
        gaussian_opacities,
        gaussian_color_sh,
        gaussian_feature_sh,
        campos,
        background_color,
    )

    color = imgs[:, :n_color] if has_color else None
    feature = imgs[:, n_color:] if imgs.shape[1] > n_color else None
    # NOTE depth is in the scale-normalized space when scale_invariant=True,
    # exactly like the reference (render_cuda never un-normalizes depth_map).
    return RenderOutput(color=color, feature=feature, mask=masks, depth=depths)


def render_depth(
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    image_shape: tuple[int, int],
    gaussian_means: jnp.ndarray,
    gaussian_covariances: jnp.ndarray,
    gaussian_opacities: jnp.ndarray,
    scale_invariant: bool = True,
    mode: DepthRenderingMode = "depth",
    backend: Backend = "tiled",
) -> jnp.ndarray:
    """Render depth by compositing per-gaussian depth as the payload.

    Parity: src/model/decoder/cuda_splatting.py:298-340 (renders camera-space
    z as a fake color).
    """
    w2c = invert_se3(extrinsics)
    cam_points = jnp.einsum(
        "bij,bgj->bgi", w2c, homogenize_points(gaussian_means)
    )
    fake_color = cam_points[..., 2]

    if mode == "disparity":
        fake_color = 1.0 / fake_color
    elif mode == "relative_disparity":
        fake_color = depth_to_relative_disparity(fake_color, near[:, None], far[:, None])
    elif mode == "log":
        fake_color = jnp.log(
            jnp.clip(fake_color, jnp.minimum(near, far)[:, None], None)
        )

    b = fake_color.shape[0]
    result = render(
        extrinsics,
        intrinsics,
        near,
        far,
        image_shape,
        jnp.zeros((b, 3), jnp.float32),
        gaussian_means,
        gaussian_covariances,
        gaussian_opacities,
        gaussian_color_sh=jnp.tile(fake_color[..., None, None], (1, 1, 3, 1)),
        scale_invariant=scale_invariant,
        use_sh=False,
        backend=backend,
    ).color
    return result.mean(axis=1)
