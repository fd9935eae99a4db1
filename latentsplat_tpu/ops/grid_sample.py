"""Bilinear grid sampling (gather-based, jit/vmap-friendly).

Functional twin of torch.nn.functional.grid_sample with mode='bilinear',
padding_mode='zeros', align_corners=False — the exact configuration the
reference uses for epipolar feature sampling
(src/model/encoder/epipolar/epipolar_sampler.py:99-105) — operating on
channel-last (HWC) images, this framework's native layout.

TPU note: implemented as four gathers + lerp weights; for the epipolar
sampler's access pattern (32 samples/ray over a small feature map) this is
bandwidth-bound and fuses well in XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `image` at normalized coordinates.

    Args:
      image: (H, W, C).
      coords: (..., 2) xy in [-1, 1]; (-1, -1) is the top-left corner of the
        top-left pixel (align_corners=False semantics).

    Returns:
      (..., C) sampled values, zero outside the image.
    """
    h, w, _ = image.shape
    x = (coords[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (coords[..., 1] + 1.0) * (h / 2.0) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix_c = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        vals = image[iy_c, ix_c]  # (..., C)
        return vals * inside[..., None]

    return (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
