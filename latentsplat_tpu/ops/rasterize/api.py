"""High-level rendering API: the JAX/TPU equivalent of the reference's
`render_cuda` (src/model/decoder/cuda_splatting.py:56-167).

Differences by design (TPU-first):
  * The reference repeats the Gaussians per target view and loops Python
    over per-view CUDA launches (decoder_splatting_cuda.py:33-41 +
    cuda_splatting.py:124-162). Here Gaussians carry a scene axis and views
    a separate view axis: scenes are vmapped, views are lax.map'ed
    *sequentially* inside one compiled program. Sequential views cost no
    throughput (TPU grid programs execute serially per core anyway) and
    avoid materializing per-view copies of the Gaussian payload (with
    393k Gaussians x color SH deg 4, per-view duplication OOMs the chip).
  * Color SH (degree <= 4) is evaluated per-gaussian on the MXU (basis
    matmul) instead of inside the kernel; feature SH keeps the reference's
    outside-the-kernel evaluation (cuda_splatting.py:92-101) including the
    +0.5 offset. Color is offset by +0.5 and clamped at 0 exactly like the
    CUDA kernel's computeColorFromSH.
  * Scale-invariant pre-normalization by 1/near is preserved exactly
    (cuda_splatting.py:75-81), applied per view inside the view loop.
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
    extrinsics: jnp.ndarray,            # (B, V, 4, 4)
    intrinsics: jnp.ndarray,            # (B, V, 3, 3)
    near: jnp.ndarray,                  # (B, V)
    far: jnp.ndarray,                   # (B, V)
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
    max_tiles_per_gaussian: int = 9,
    pair_budget_factor: float = 4.0,
    remat: bool = False,
    precision: str = "exact",
) -> RenderOutput:
    """Render each scene's gaussians to its V views.

    Returns RenderOutput with color (B, V, 3, H, W), feature (B, V, C, H, W),
    mask/depth (B, V, H, W).

    `remat=True` rematerializes each view's render in the backward pass
    (jax.checkpoint around the per-view body): the tiled backend's custom
    VJP otherwise saves the sorted pair buffer per view (~pair_budget *
    (n_attr + 2) f32 rows, ~160 MB/view at the flagship scale), and
    lax.map stacks those residuals across views. Recomputing costs ~1
    extra rasterizer forward per view in the backward.
    """
    assert gaussian_color_sh is not None or gaussian_feature_sh is not None
    if not use_sh:
        assert (gaussian_color_sh is None or gaussian_color_sh.shape[-1] == 1) and (
            gaussian_feature_sh is None or gaussian_feature_sh.shape[-1] == 1
        )

    has_color = gaussian_color_sh is not None
    has_feature = gaussian_feature_sh is not None
    n_color = 3 if has_color else 0

    def view_channels(means, color_sh, feature_sh, cam):
        """Per-gaussian composited channel payload for one view."""
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
            parts.append(col.astype(jnp.float32))
        if has_feature:
            if use_sh:
                deg = isqrt(feature_sh.shape[-1]) - 1
                # Parity with the Python-side feature SH path incl. +0.5
                # (cuda_splatting.py:92-101); no clamp for features.
                feat = eval_sh(deg, feature_sh, direction) + 0.5
            else:
                feat = feature_sh[..., 0]
            parts.append(feat.astype(jnp.float32))
        return jnp.concatenate(parts, axis=-1)

    def render_scene(ext_v, intr_v, near_v, far_v, bg, mns, covs, ops, c_sh, f_sh):
        """One scene: sequential map over its views, gaussians shared."""
        if precision in ("fast", "fast_nocoef", "exact_bf16_sh"):
            # The SH tables (118 MB color + 56 MB features at the flagship
            # scale) are re-read once per view for the view-dependent
            # evaluation; bf16 storage halves that traffic. Cast once per
            # scene, outside the view loop. ("exact_bf16_sh" is the
            # diagnostic knob isolating this quantization on the exact
            # path — see tiled.DIAGNOSTIC_PRECISIONS.)
            c_sh = c_sh.astype(jnp.bfloat16) if c_sh is not None else None
            f_sh = f_sh.astype(jnp.bfloat16) if f_sh is not None else None
        n_ch = (3 if has_color else 0) + (
            f_sh.shape[-2] if has_feature else 0
        )
        bg_full = jnp.zeros((n_ch,), jnp.float32)
        if n_color:
            bg_full = bg_full.at[:n_color].set(bg)

        def render_one(view):
            ext, intr, nr, _fr = view
            cam = ext[:3, 3]
            # SH directions are scale-invariant; evaluate before normalizing.
            channels = view_channels(mns, c_sh, f_sh, cam)
            if scale_invariant:
                # Pre-normalize the scene into a numerically safe range
                # (parity: cuda_splatting.py:75-81).
                s = 1.0 / nr
                ext_s = ext.at[:3, 3].multiply(s)
                mns_s = mns * s
                covs_s = covs * (s * s)
            else:
                ext_s, mns_s, covs_s = ext, mns, covs
            sg = project_gaussians_to_screen(
                mns_s, covs_s, ops, channels, ext_s, intr, image_shape
            )
            if backend == "dense":
                return (
                    *composite_dense(sg, image_shape, bg_full),
                    jnp.zeros((), jnp.int32),
                )
            from .tiled import composite_tiled

            # with_dropped reuses the tile-rect counts composite_tiled
            # already computes — a second count_pair_overflow pass here
            # would re-run the whole ellipse-tile cull per view (~0.7
            # ms/view at the flagship scale, the r02->r03 regression).
            return composite_tiled(
                sg, image_shape, bg_full,
                max_tiles_per_gaussian=max_tiles_per_gaussian,
                pair_budget_factor=pair_budget_factor,
                precision=precision,
                with_dropped=True,
            )

        body = jax.checkpoint(render_one) if remat else render_one
        return jax.lax.map(body, (ext_v, intr_v, near_v, far_v))

    # Scenes are mapped sequentially as well (batch is 1-2 in practice and
    # TPU grid programs execute serially per core, so there's nothing to
    # gain from vmapping — and vmap-batched operands of a scalar-prefetch
    # pallas_call miscompile on TPU, while closed-over/mapped ones work).
    b = extrinsics.shape[0]
    scene_args = [
        extrinsics, intrinsics, near, far, background_color,
        gaussian_means, gaussian_covariances, gaussian_opacities,
    ]
    if has_color:
        scene_args.append(gaussian_color_sh)
    if has_feature:
        scene_args.append(gaussian_feature_sh)

    def scene_fn(args):
        ext_v, intr_v, near_v, far_v, bg, mns, covs, ops = args[:8]
        rest = list(args[8:])
        c_sh = rest.pop(0) if has_color else None
        f_sh = rest.pop(0) if has_feature else None
        return render_scene(ext_v, intr_v, near_v, far_v, bg, mns, covs, ops, c_sh, f_sh)

    if b == 1:
        one = scene_fn(tuple(x[0] for x in scene_args))
        imgs, masks, depths, dropped = jax.tree_util.tree_map(
            lambda x: x[None], one
        )
    else:
        imgs, masks, depths, dropped = jax.lax.map(scene_fn, tuple(scene_args))

    color = imgs[:, :, :n_color] if has_color else None
    feature = imgs[:, :, n_color:] if imgs.shape[2] > n_color else None
    # NOTE depth is in the scale-normalized space when scale_invariant=True,
    # exactly like the reference (render_cuda never un-normalizes depth_map).
    return RenderOutput(
        color=color, feature=feature, mask=masks, depth=depths,
        pairs_dropped=dropped,
    )


def render_depth(
    extrinsics: jnp.ndarray,            # (B, V, 4, 4)
    intrinsics: jnp.ndarray,            # (B, V, 3, 3)
    near: jnp.ndarray,                  # (B, V)
    far: jnp.ndarray,                   # (B, V)
    image_shape: tuple[int, int],
    gaussian_means: jnp.ndarray,        # (B, G, 3)
    gaussian_covariances: jnp.ndarray,  # (B, G, 3, 3)
    gaussian_opacities: jnp.ndarray,    # (B, G)
    scale_invariant: bool = True,
    mode: DepthRenderingMode = "depth",
    backend: Backend = "tiled",
) -> jnp.ndarray:
    """Render depth (B, V, H, W) by compositing per-gaussian depth as the
    payload.

    Parity: src/model/decoder/cuda_splatting.py:298-340 (renders camera-space
    z as a fake color). The per-view camera-space depth becomes a per-view
    1-channel "color" evaluated inside the view loop via a per-view SH DC
    coefficient, so we render V single-channel images in one pass per view.
    """
    b, v = extrinsics.shape[:2]
    # Camera-space z per (scene, view, gaussian).
    w2c = invert_se3(extrinsics)                       # (B, V, 4, 4)
    cam_points = jnp.einsum(
        "bvij,bgj->bvgi", w2c, homogenize_points(gaussian_means)
    )
    fake_color = cam_points[..., 2]                    # (B, V, G)

    if mode == "disparity":
        fake_color = 1.0 / fake_color
    elif mode == "relative_disparity":
        fake_color = depth_to_relative_disparity(
            fake_color, near[:, :, None], far[:, :, None]
        )
    elif mode == "log":
        fake_color = jnp.log(
            jnp.clip(fake_color, jnp.minimum(near, far)[:, :, None], None)
        )

    # Each (scene, view) has its own payload -> flatten views into the scene
    # axis for this renderer (payloads differ per view, so they can't be
    # shared anyway).
    def flat(x):
        return x.reshape(b * v, *x.shape[2:])

    def rep(x):
        return flat(jnp.broadcast_to(x[:, None], (b, v, *x.shape[1:])))

    result = render(
        flat(extrinsics)[:, None],
        flat(intrinsics)[:, None],
        flat(near)[:, None],
        flat(far)[:, None],
        image_shape,
        jnp.zeros((b * v, 3), jnp.float32),
        rep(gaussian_means),
        rep(gaussian_covariances),
        rep(gaussian_opacities),
        gaussian_color_sh=fake_color.reshape(b * v, -1)[..., None, None].repeat(3, axis=-2),
        scale_invariant=scale_invariant,
        use_sh=False,
        backend=backend,
    ).color  # (B*V, 1, 3, H, W)
    h, w = image_shape
    return result.mean(axis=2).reshape(b, v, h, w)


def render_orthographic(
    extrinsics: jnp.ndarray,            # (B, 4, 4) cam-to-world
    width: jnp.ndarray,                 # (B,) world-space view width
    height: jnp.ndarray,                # (B,) world-space view height
    near: jnp.ndarray,                  # (B,)
    far: jnp.ndarray,                   # (B,)
    image_shape: tuple[int, int],
    background_color: jnp.ndarray,      # (B, 3)
    gaussian_means: jnp.ndarray,        # (B, G, 3)
    gaussian_covariances: jnp.ndarray,  # (B, G, 3, 3)
    gaussian_opacities: jnp.ndarray,    # (B, G)
    gaussian_color_sh: Optional[jnp.ndarray] = None,
    gaussian_feature_sh: Optional[jnp.ndarray] = None,
    fov_degrees: float = 0.1,
    use_sh: bool = True,
    backend: Backend = "dense",
) -> RenderOutput:
    """Fake orthographic rendering for visualization.

    Parity with render_cuda_orthographic (cuda_splatting.py:170-292): pull
    the camera back far enough that the given world-space width subtends a
    tiny field of view, making the perspective projection effectively
    orthographic.
    """
    fov_x = jnp.deg2rad(fov_degrees)
    tan_fov_x = jnp.tan(0.5 * fov_x)
    distance_to_near = (0.5 * width) / tan_fov_x

    # Move the camera back along its look axis.
    look = extrinsics[..., :3, 2]
    origins = extrinsics[..., :3, 3] - look * distance_to_near[..., None]
    ext = extrinsics.at[..., :3, 3].set(origins)

    fx = distance_to_near / width                      # normalized focal
    fy = distance_to_near / height
    b = extrinsics.shape[0]
    intr = jnp.zeros((b, 3, 3), jnp.float32)
    intr = intr.at[:, 0, 0].set(fx).at[:, 1, 1].set(fy)
    intr = intr.at[:, 0, 2].set(0.5).at[:, 1, 2].set(0.5).at[:, 2, 2].set(1.0)

    return render(
        ext[:, None],
        intr[:, None],
        (near + distance_to_near)[:, None],
        (far + distance_to_near)[:, None],
        image_shape,
        background_color,
        gaussian_means,
        gaussian_covariances,
        gaussian_opacities,
        gaussian_color_sh,
        gaussian_feature_sh,
        scale_invariant=True,
        use_sh=use_sh,
        backend=backend,
    )
