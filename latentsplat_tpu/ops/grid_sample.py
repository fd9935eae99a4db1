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

import jax
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


def grid_sample_2d_mxu(
    image: jnp.ndarray, coords: jnp.ndarray, block: int = 4096
) -> jnp.ndarray:
    """grid_sample_2d semantics via blocked one-hot indicator MATMULS.

    TPU gathers serialize per row and their backward is a scatter-add (the
    measured epipolar-sampler cost, NOTES.md round-5 ledger: ~66 ms fwd+bwd
    at the flagship shape for ~zero FLOPs). This variant builds, per block
    of `block` samples, the (block, H*W) bilinear-weight indicator — the
    outer product of the 1-D x/y hat weights, since bilinear factors — and
    contracts it with the flattened image on the MXU. AD of the matmul
    gives the transposed matmul for d/d image: NO scatter anywhere.

    Matches grid_sample_2d (align_corners=False, zeros padding) to f32
    rounding; out-of-range corners drop out because their one-hot row is
    all zero.
    """
    h, w, c = image.shape
    shape = coords.shape[:-1]
    n = 1
    for s in shape:
        n *= int(s)
    xy = coords.reshape(n, 2)
    pad = (-n) % block
    if pad:
        # Padded coords sample out of range -> zero rows, discarded below.
        xy = jnp.concatenate(
            [xy, jnp.full((pad, 2), -10.0, xy.dtype)], axis=0
        )
    flat = image.reshape(h * w, c)
    iota_x = jnp.arange(w, dtype=jnp.float32)[None, :]
    iota_y = jnp.arange(h, dtype=jnp.float32)[None, :]

    def one_block(xy_b):
        x = (xy_b[:, 0] + 1.0) * (w / 2.0) - 0.5
        y = (xy_b[:, 1] + 1.0) * (h / 2.0) - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        rows = (iota_x == x0[:, None]) * (1.0 - wx1)[:, None] + (
            iota_x == (x0 + 1.0)[:, None]
        ) * wx1[:, None]                                   # (B, W)
        cols = (iota_y == y0[:, None]) * (1.0 - wy1)[:, None] + (
            iota_y == (y0 + 1.0)[:, None]
        ) * wy1[:, None]                                   # (B, H)
        ind = (cols[:, :, None] * rows[:, None, :]).reshape(-1, h * w)
        return jnp.dot(ind, flat)                          # (B, C)

    out = jax.lax.map(one_block, xy.reshape(-1, block, 2))
    return out.reshape(-1, c)[:n].reshape(*shape, c)
