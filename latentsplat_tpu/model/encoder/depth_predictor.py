"""Monocular depth predictor (flax.linen).

Parity with reference src/model/encoder/epipolar/depth_predictor_monocular.py:
per-pixel discrete pdf over disparity buckets + per-bucket sigmoid offsets;
stochastic inverse-CDF sampling or deterministic top-k; bucket+offset ->
relative disparity -> depth; opacity from pdf (optionally
transmittance-corrected).

RNG is explicit: stochastic sampling draws from linen's "sample" rng stream.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...geometry import relative_disparity_to_depth
from ...ops.distributions import gather_discrete_topk, sample_discrete_distribution


class DepthPredictorMonocular(nn.Module):
    d_in: int
    num_samples: int   # disparity buckets
    num_surfaces: int
    use_transmittance: bool

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,   # (b, v, r, c)
        near: jnp.ndarray,       # (b, v)
        far: jnp.ndarray,        # (b, v)
        deterministic: bool,
        gaussians_per_pixel: int,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (depth, opacity), each (b, v, r, srf, spp)."""
        s = self.num_samples
        srf = self.num_surfaces

        y = nn.relu(features)
        y = nn.Dense(2 * s * srf, name="projection")(y)
        # Feature layout (dpt, srf, 2) matches the reference's rearrange
        # "... (dpt srf c) -> c ... srf dpt" for weight-conversion parity.
        y = y.reshape(*y.shape[:-1], s, srf, 2)
        pdf_raw = y[..., 0]
        offset_raw = y[..., 1]
        pdf = nn.softmax(jnp.moveaxis(pdf_raw, -2, -1), axis=-1)      # (..., srf, dpt)
        offset = nn.sigmoid(jnp.moveaxis(offset_raw, -2, -1))

        if deterministic:
            index, pdf_i = gather_discrete_topk(pdf, gaussians_per_pixel)
        else:
            key = self.make_rng("sample")
            index, pdf_i = sample_discrete_distribution(key, pdf, gaussians_per_pixel)

        offset_i = jnp.take_along_axis(offset, index, axis=-1)
        relative_disparity = (index.astype(jnp.float32) + offset_i) / s
        depth = relative_disparity_to_depth(
            relative_disparity,
            near[:, :, None, None, None],
            far[:, :, None, None, None],
        )

        if self.use_transmittance:
            partial = jnp.cumsum(pdf, axis=-1)
            partial = jnp.concatenate(
                [jnp.zeros_like(partial[..., :1]), partial[..., :-1]], axis=-1
            )
            opacity_all = pdf / (1.0 - partial + 1e-10)
            opacity = jnp.take_along_axis(opacity_all, index, axis=-1)
        else:
            opacity = pdf_i

        return depth, opacity
