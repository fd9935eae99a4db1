"""Depth <-> relative-disparity conversions.

Parity with reference src/model/encoder/epipolar/conversions.py:5-27.
"""

from __future__ import annotations

import jax.numpy as jnp


def relative_disparity_to_depth(
    relative_disparity: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Relative disparity (0 = near, 1 = far) -> depth."""
    disp_near = 1.0 / (near + eps)
    disp_far = 1.0 / (far + eps)
    return 1.0 / ((1.0 - relative_disparity) * (disp_near - disp_far) + disp_far + eps)


def depth_to_relative_disparity(
    depth: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Depth -> relative disparity (0 = near, 1 = far)."""
    disp_near = 1.0 / (near + eps)
    disp_far = 1.0 / (far + eps)
    disp = 1.0 / (depth + eps)
    return 1.0 - (disp - disp_far) / (disp_near - disp_far + eps)
