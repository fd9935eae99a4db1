"""Pytree types for the rasterizer."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ScreenGaussians:
    """Per-view screen-space Gaussians after projection + culling.

    All arrays share the leading gaussian axis G. Produced by
    `project_gaussians_to_screen`; consumed by the dense and tiled
    compositors.
    """

    mean2d: jnp.ndarray      # (G, 2) pixel coordinates (pixel i center = i)
    conic: jnp.ndarray       # (G, 3) upper-tri of inverse 2D covariance (a, b, c)
    depth: jnp.ndarray       # (G,) camera-space z
    radius: jnp.ndarray      # (G,) float 3-sigma screen radius (0 if culled)
    opacity: jnp.ndarray     # (G,) in [0, 1]
    channels: jnp.ndarray    # (G, C) per-gaussian composited payload
                             # (color / features / anything)
    # (G, 2) threshold-aware per-axis half-extents (<= radius): pixels with
    # |dx| > extent[0] or |dy| > extent[1] provably fall below
    # ALPHA_THRESHOLD, so tile rects built from the extents drop corner and
    # edge tiles bit-exactly (the compositor zeroes those alphas anyway).
    # Optional for backward compatibility; None falls back to the radius.
    extent: Optional[jnp.ndarray] = None

    @property
    def num_gaussians(self) -> int:
        return self.mean2d.shape[0]

    @property
    def num_channels(self) -> int:
        return self.channels.shape[-1]


@struct.dataclass
class RenderOutput:
    """Rasterizer output, matching the reference rasterizer's return surface
    (src/model/decoder/cuda_splatting.py:49-54): color image, feature map,
    accumulated alpha mask, expected depth.

    Leading batch dims mirror the inputs (e.g. (batch*view, ...)).
    """

    color: Optional[jnp.ndarray]    # (..., 3, H, W) or None
    feature: Optional[jnp.ndarray]  # (..., C, H, W) or None
    mask: jnp.ndarray               # (..., H, W) accumulated alpha
    depth: jnp.ndarray              # (..., H, W) expected depth
    # Tile pairs dropped by the tiled backend's static pair budget, per
    # rendered view (0 everywhere unless the scene exceeds
    # pair_budget_factor * G; surfaced so real runs can detect silent
    # truncation). None for the dense backend.
    pairs_dropped: Optional[jnp.ndarray] = None  # (..., ) int32
