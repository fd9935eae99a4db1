"""Alternative depth-distribution machinery (off the main path).

Parity with the reference's unused-but-shipped modules
(src/model/encoder/epipolar/distribution.py:9-45 and
src/model/encoder/common/{depth_predictor.py,sampler.py}): a QK-attention
distribution head and a categorical sampler over it. The shipped
experiments use DepthPredictorMonocular instead (encoder_epipolar.py:81);
these exist for the same ablation surface the reference keeps.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.distributions import sample_discrete_distribution


class AttentionDistribution(nn.Module):
    """Softmax QK attention as a discrete distribution over keys
    (ref: distribution.py:9-45)."""

    dim_inner: int = 64

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,   # (b, q, d_q)
        keys: jnp.ndarray,      # (b, k, d_k)
        force_last_token: Optional[jnp.ndarray] = None,  # (b,) bool
    ) -> jnp.ndarray:           # (b, q, k)
        q = nn.Dense(self.dim_inner, use_bias=False, name="to_q")(queries)
        k = nn.Dense(self.dim_inner, use_bias=False, name="to_k")(keys)
        weights = nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q, k) * self.dim_inner**-0.5, axis=-1
        )
        if force_last_token is None:
            return weights
        last = jnp.zeros((keys.shape[1],)).at[-1].set(1.0)
        mask = force_last_token[:, None, None]
        return jnp.where(mask, last, weights)


class DistributionDepthPredictor(nn.Module):
    """Depth from an attention distribution over per-sample tokens
    (ref: common/depth_predictor.py:10-45): sample or argmax a bucket, then
    convert the bucket's candidate depth."""

    dim_inner: int = 64

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,          # (b, q, d_q) per-ray tokens
        keys: jnp.ndarray,             # (b, k, d_k) per-sample tokens
        candidate_depths: jnp.ndarray,  # (b, q, k)
        deterministic: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        pdf = AttentionDistribution(self.dim_inner, name="distribution")(
            queries, keys
        )
        b, q, k = pdf.shape
        flat = pdf.reshape(b * q, k)
        if deterministic:
            index = jnp.argmax(flat, axis=-1)
            density = jnp.take_along_axis(flat, index[:, None], axis=-1)[:, 0]
        else:
            assert rng is not None
            index, density = sample_discrete_distribution(rng, flat, 1)
            index = index.reshape(-1)
            density = density.reshape(-1)
        depth = jnp.take_along_axis(
            candidate_depths.reshape(b * q, k), index[:, None], axis=-1
        )[:, 0]
        return depth.reshape(b, q), density.reshape(b, q)
