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
