"""Bilinear image resize with align_corners=True semantics.

jax.image.resize implements half-pixel sampling only; the reference relies
on torch's align_corners=True in the backbone feature upsampling
(src/model/encoder/backbone/backbone_resnet.py:84-91) and the VAE skip
connections (src/model/autoencoder/autoencoder_kl.py:108-116), so we provide
an exact equivalent (separable lerp along each axis).
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int):
    if out_size == 1 or in_size == 1:
        idx = jnp.zeros((out_size,), jnp.int32)
        return idx, idx, jnp.zeros((out_size,), jnp.float32)
    pos = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    lo = jnp.clip(jnp.floor(pos), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = pos - lo.astype(jnp.float32)
    return lo, hi, w


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_hw: tuple[int, int]
) -> jnp.ndarray:
    """Resize (..., H, W, C) -> (..., out_h, out_w, C), align_corners=True."""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    if (h, w) == (out_h, out_w):
        return x

    lo_y, hi_y, wy = _axis_weights(h, out_h)
    lo_x, hi_x, wx = _axis_weights(w, out_w)

    top = jnp.take(x, lo_y, axis=-3)
    bottom = jnp.take(x, hi_y, axis=-3)
    x = top * (1.0 - wy)[:, None, None] + bottom * wy[:, None, None]

    left = jnp.take(x, lo_x, axis=-2)
    right = jnp.take(x, hi_x, axis=-2)
    return left * (1.0 - wx)[:, None] + right * wx[:, None]
