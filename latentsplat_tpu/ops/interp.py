"""Torch-parity image resizes.

jax.image.resize implements half-pixel sampling only; the reference relies
on torch's align_corners=True in the backbone feature upsampling
(src/model/encoder/backbone/backbone_resnet.py:84-91) and the VAE skip
connections (src/model/autoencoder/autoencoder_kl.py:108-116), so we provide
an exact equivalent (separable lerp along each axis). DINO's positional
embedding interpolation is torch bicubic (cubic convolution a=-0.75,
half-pixel centers, border replication) with an explicit scale_factor —
`resize_bicubic_torch` reproduces it via separable (out, in) sampling-matrix
contractions.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


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


@lru_cache(maxsize=64)
def _bicubic_matrix(
    in_size: int, out_size: int, scale: float | None, a: float
) -> np.ndarray:
    """(out, in) sampling matrix of torch F.interpolate(mode='bicubic',
    align_corners=False).

    `scale` overrides out_size/in_size as the coordinate scale: torch uses
    the caller's scale_factor verbatim when one is given, which is how
    DINO's +0.1 fudge (vision_transformer.py interpolate_pos_encoding)
    slightly shifts the sampling grid. Out-of-range taps replicate the
    border, exactly like torch's upsample_bicubic2d.
    """
    s = scale if scale is not None else out_size / in_size
    centers = (np.arange(out_size) + 0.5) / s - 0.5
    i0 = np.floor(centers).astype(np.int64)
    t = centers - i0

    def kernel(d):
        d = np.abs(d)
        return np.where(
            d <= 1.0,
            (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0,
            np.where(d < 2.0, a * (d**3 - 5.0 * d**2 + 8.0 * d - 4.0), 0.0),
        )

    weights = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    for off in (-1, 0, 1, 2):
        idx = np.clip(i0 + off, 0, in_size - 1)
        np.add.at(weights, (rows, idx), kernel(off - t))
    return weights.astype(np.float32)


def resize_bicubic_torch(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    scales: tuple[float, float] | None = None,
    a: float = -0.75,
) -> jnp.ndarray:
    """Resize (..., H, W, C) -> (..., out_h, out_w, C) with torch bicubic
    semantics (align_corners=False). `scales` = explicit (scale_h, scale_w)
    as passed to torch's scale_factor; None derives them from the sizes."""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    s_h, s_w = scales if scales is not None else (None, None)
    m_h = jnp.asarray(_bicubic_matrix(h, out_h, s_h, a))
    m_w = jnp.asarray(_bicubic_matrix(w, out_w, s_w, a))
    x = jnp.einsum("oh,...hwc->...owc", m_h, x)
    return jnp.einsum("ow,...hwc->...hoc", m_w, x)
