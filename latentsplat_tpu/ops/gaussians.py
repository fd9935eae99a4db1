"""Quaternion -> rotation matrix and Gaussian covariance construction.

Parity with reference src/model/encoder/common/gaussians.py:8-44
(scipy xyzw quaternion order).
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(..., 4) xyzw quaternions -> (..., 3, 3) rotation matrices."""
    i, j, k, r = (quaternions[..., n] for n in range(4))
    two_s = 2.0 / ((quaternions * quaternions).sum(axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*o.shape[:-1], 3, 3)


def build_covariance(scale: jnp.ndarray, rotation_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T from per-axis scales and an xyzw quaternion.

    scale: (..., 3); rotation_xyzw: (..., 4) -> (..., 3, 3).
    """
    rotation = quaternion_to_matrix(rotation_xyzw)
    # R @ diag(s^2) @ R^T without materializing the diagonal matrix.
    rs = rotation * (scale**2)[..., None, :]
    return rs @ jnp.swapaxes(rotation, -1, -2)


def covariance_to_scale_rotation(
    covariances: jnp.ndarray,  # (..., 3, 3)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of build_covariance: Sigma = R S S R^T -> (scales, quat_xyzw).

    Used for PLY export of predicted Gaussians (the Inria viewer stores
    scale + rotation, not covariance). Eigendecomposition; the sign/order
    ambiguity is irrelevant for rendering.
    """
    eigvals, eigvecs = jnp.linalg.eigh(covariances)
    scales = jnp.sqrt(jnp.clip(eigvals, 1e-20, None))
    # Ensure right-handed rotations (det +1) by flipping the last axis.
    det = jnp.linalg.det(eigvecs)
    eigvecs = eigvecs.at[..., :, 2].multiply(jnp.sign(det)[..., None])

    # Rotation matrix -> quaternion (xyzw), numerically robust branch-free
    # variant evaluated in float64-free jnp.
    m = eigvecs
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    qw = jnp.sqrt(jnp.clip(1.0 + t, 1e-12, None)) / 2.0
    qx = (m[..., 2, 1] - m[..., 1, 2]) / jnp.clip(4.0 * qw, 1e-8, None)
    qy = (m[..., 0, 2] - m[..., 2, 0]) / jnp.clip(4.0 * qw, 1e-8, None)
    qz = (m[..., 1, 0] - m[..., 0, 1]) / jnp.clip(4.0 * qw, 1e-8, None)
    quat = jnp.stack([qx, qy, qz, qw], axis=-1)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return scales, quat
