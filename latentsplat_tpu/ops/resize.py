"""Antialiased bilinear resize (torchvision `resize(antialias=True)` twin).

The reference rescales target images and rendered latents between the
supersampled render resolution and the VAE latent resolution with
torchvision's antialiased bilinear resize (src/model/model_wrapper.py:266-274).
This implements the same separable triangle-filter resampling: for
downscaling, the filter support is stretched by the scale ratio; for
upscaling it reduces to ordinary bilinear interpolation (half-pixel
coordinates).

Implemented as two dense (out x in) sampling-matrix contractions — small
matrices (image-sized), MXU-friendly, fully differentiable.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic (out, in) triangle-filter sampling matrix."""
    ratio = in_size / out_size
    support = max(1.0, ratio)
    centers = (np.arange(out_size) + 0.5) * ratio - 0.5  # input coords
    idx = np.arange(in_size)
    dist = np.abs(idx[None, :] - centers[:, None]) / support
    weights = np.clip(1.0 - dist, 0.0, None)
    weights /= weights.sum(axis=1, keepdims=True)
    return weights.astype(np.float32)


def resize_antialias(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Resize (..., H, W, C) images to (..., out_h, out_w, C)."""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    if (h, w) == (out_h, out_w):
        return x
    m_h = jnp.asarray(_resize_matrix(h, out_h))
    m_w = jnp.asarray(_resize_matrix(w, out_w))
    x = jnp.einsum("oh,...hwc->...owc", m_h, x)
    x = jnp.einsum("ow,...hwc->...hoc", m_w, x)
    return x
