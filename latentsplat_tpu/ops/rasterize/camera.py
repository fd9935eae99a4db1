"""Screen-space projection of 3D Gaussians (EWA splatting), pure jnp.

This replaces the preprocessing stage of the reference's CUDA rasterizer
(the external `latent-gaussian-rasterization` fork of Inria
diff-gaussian-rasterization, characterized at
src/model/decoder/cuda_splatting.py:124-158): per-Gaussian perspective
projection, EWA 2D covariance, low-pass filter, near/frustum culling, and
3-sigma screen radius. It is dense, vectorized XLA (fully differentiable
via autodiff) — the sequential compositing is the only part that needs a
hand-written kernel.

Semantics preserved from the standard 3DGS pipeline:
  * near-plane cull at z <= 0.2 (scene is pre-normalized by 1/near so this
    equals 0.2 * near; see api.render's scale_invariant handling, parity
    with cuda_splatting.py:75-81);
  * frustum guard band 1.3 * tan(fov/2) when evaluating the Jacobian;
  * 2D covariance low-pass: += 0.3 * I;
  * radius = ceil(3 * sqrt(max eigenvalue)).

Improvements over the reference path: arbitrary principal points are
supported exactly (the CUDA path builds its projection matrix from FOV only,
src/model/decoder/cuda_splatting.py:19-46, implicitly assuming a centered
principal point).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...geometry.projection import invert_se3
from .types import ScreenGaussians

# Alpha below this contributes nothing (CUDA uses 1/255).
ALPHA_THRESHOLD = 1.0 / 255.0
# Opacity saturation inside the compositor (CUDA uses 0.99).
ALPHA_CLAMP = 0.99
# Near-plane cull in (scale-normalized) camera space.
NEAR_CULL_Z = 0.2
# Low-pass filter added to the 2D covariance diagonal.
COV2D_BLUR = 0.3


def project_gaussians_to_screen(
    means: jnp.ndarray,         # (G, 3) world
    covariances: jnp.ndarray,   # (G, 3, 3) world
    opacities: jnp.ndarray,     # (G,)
    channels: jnp.ndarray,      # (G, C) payload to composite
    extrinsics: jnp.ndarray,    # (4, 4) cam-to-world
    intrinsics: jnp.ndarray,    # (3, 3) normalized
    image_shape: tuple[int, int],
) -> ScreenGaussians:
    """Project one view's Gaussians to screen space. vmap over views/batch."""
    h, w = image_shape
    w2c = invert_se3(extrinsics)
    rot_w2c = w2c[:3, :3]

    # p_cam = W @ means + t, unrolled to (G,) elementwise ops (see the EWA
    # comment below for why).
    m0, m1, m2 = means[:, 0], means[:, 1], means[:, 2]
    p_x = rot_w2c[0, 0] * m0 + rot_w2c[0, 1] * m1 + rot_w2c[0, 2] * m2 + w2c[0, 3]
    p_y = rot_w2c[1, 0] * m0 + rot_w2c[1, 1] * m1 + rot_w2c[1, 2] * m2 + w2c[1, 3]
    z = rot_w2c[2, 0] * m0 + rot_w2c[2, 1] * m1 + rot_w2c[2, 2] * m2 + w2c[2, 3]

    # Pixel-space focal lengths / principal point. Normalized intrinsics have
    # pixel centers at (i + 0.5) / size, so pixel-index coordinates are
    # u * size - 0.5.
    fx = intrinsics[0, 0] * w
    fy = intrinsics[1, 1] * h
    cx = intrinsics[0, 2] * w
    cy = intrinsics[1, 2] * h

    safe_z = jnp.where(z > 1e-6, z, 1e-6)
    mean2d = jnp.stack(
        [
            fx * p_x / safe_z + cx - 0.5,
            fy * p_y / safe_z + cy - 0.5,
        ],
        axis=-1,
    )

    # EWA: J @ W @ Sigma @ W^T @ J^T with the perspective Jacobian evaluated
    # at clamped view coordinates (1.3x frustum guard band). The products
    # are unrolled to elementwise (G,) arithmetic: XLA lowers batched tiny
    # matmuls (G x 2x3 x 3x3) to near-scalar MXU work — the unrolled form is
    # ~15x faster at the flagship scale (measured on v5e).
    tan_fov_x = 0.5 * w / fx
    tan_fov_y = 0.5 * h / fy
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    tx = jnp.clip(p_x / safe_z, -lim_x, lim_x) * safe_z
    ty = jnp.clip(p_y / safe_z, -lim_y, lim_y) * safe_z

    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z
    # Jacobian rows: j0 = [fx/z, 0, -fx tx/z^2], j1 = [0, fy/z, -fy ty/z^2].
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    # T = J @ W rows as (G, 3): t0 = j00*W0 + j02*W2, t1 = j11*W1 + j12*W2.
    t0 = j00[:, None] * rot_w2c[0][None] + j02[:, None] * rot_w2c[2][None]
    t1 = j11[:, None] * rot_w2c[1][None] + j12[:, None] * rot_w2c[2][None]
    # cov2d = T Sigma T^T with Sigma symmetric: row combos then dot.
    s0, s1, s2 = covariances[:, 0, :], covariances[:, 1, :], covariances[:, 2, :]
    st0 = t0[:, 0:1] * s0 + t0[:, 1:2] * s1 + t0[:, 2:3] * s2  # Sigma @ t0
    st1 = t1[:, 0:1] * s0 + t1[:, 1:2] * s1 + t1[:, 2:3] * s2
    c00 = jnp.sum(t0 * st0, axis=-1) + COV2D_BLUR
    c01 = jnp.sum(t0 * st1, axis=-1)
    c11 = jnp.sum(t1 * st1, axis=-1) + COV2D_BLUR
    # PSD margin: clamp the correlation to |rho| <= 0.99 so the CONIC stays
    # strictly positive-definite even after fast mode's bf16 payload
    # rounding (relative err 2^-9 per element; 0.99^2 < 1 - 3*2^-9). A PSD
    # conic makes the splat quadratic `power` <= 0 EVERYWHERE, so the
    # compositor needs no power>0 wraparound guard (the guard's per-chunk
    # cost was part of the r04 fast-render regression; NOTES.md round-5).
    # Only near-degenerate splats (|rho| > 0.99 — beyond an 1:50+ aspect
    # after the COV2D_BLUR floor) are altered, and every consumer (dense
    # oracle, tiled exact/fast, training backward) sees the same clamped
    # conic, preserving oracle bit-parity.
    c01_max = 0.99 * jnp.sqrt(jnp.maximum(c00 * c11, 0.0))
    c01 = jnp.clip(c01, -c01_max, c01_max)

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c11 / safe_det, -c01 / safe_det, c00 / safe_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # Culling: behind near plane, degenerate covariance, or fully transparent.
    valid = (z > NEAR_CULL_Z) & det_ok & (opacities * 1.0 > ALPHA_THRESHOLD)
    # Off-screen cull (whole radius-rect outside the image).
    valid &= (mean2d[..., 0] + radius >= -0.5) & (mean2d[..., 0] - radius <= w - 0.5)
    valid &= (mean2d[..., 1] + radius >= -0.5) & (mean2d[..., 1] - radius <= h - 0.5)

    radius = jnp.where(valid, radius, 0.0)
    opacity = jnp.where(valid, opacities, 0.0)

    # Threshold-aware per-axis extents, strictly tighter than the 3-sigma
    # circle's bounding square (which the reference CUDA rasterizer uses):
    # minimizing the quadratic form over dy at fixed dx gives
    # min_dy qf(d) = dx^2 / c00, so alpha >= ALPHA_THRESHOLD requires
    # |dx| <= sqrt(2 ln(255 o) c00) (same for y with c11). Pixels beyond the
    # extent are provably zeroed by the compositor's alpha threshold (and by
    # the dense oracle's), so tile rects built from extents are bit-exact
    # while emitting fewer pairs. The +1e-3 log margin and +0.01 px pad
    # cover f32 rounding drift vs the kernel's per-pixel alpha evaluation.
    log_op = jnp.log(255.0 * jnp.maximum(opacities, 1e-12)) + 1e-3
    two_lo = 2.0 * jnp.maximum(log_op, 0.0)
    ext_x = jnp.minimum(radius, jnp.sqrt(two_lo * jnp.maximum(c00, 0.0)) + 0.01)
    ext_y = jnp.minimum(radius, jnp.sqrt(two_lo * jnp.maximum(c11, 0.0)) + 0.01)
    extent = jnp.where(valid[:, None], jnp.stack([ext_x, ext_y], axis=-1), 0.0)

    return ScreenGaussians(
        mean2d=mean2d,
        conic=conic,
        depth=z,
        radius=radius,
        opacity=opacity,
        channels=channels,
        extent=extent,
    )
