"""Epipolar cross-attention transformer (flax.linen, NHWC).

Parity with reference src/model/encoder/epipolar/epipolar_transformer.py:
optional conv down/up-scaling, per-sample triangulated depth -> relative
disparity -> sinusoidal PE added to the sampled features, a cross-attention
transformer whose query is the per-pixel token and keys/values are the
epipolar samples, and a ConvFeedForward (image self-attention + 7x7 convs on
the unflattened grid) in place of the MLP.

Generalization over the reference: the (other_view, sample) axes are fused
into one key/value axis, so more than 2 context views work (the reference's
rearrange at epipolar_transformer.py:130 hardcodes ov == 1).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ...geometry import depth_to_relative_disparity, get_depth
from ...misc.heterogeneous_pairings import generate_heterogeneous_index
from ..encodings import positional_encoding
from ..transformer import Transformer
from .epipolar_sampler import EpipolarSampling, sample_epipolar_features
from .image_self_attention import ImageSelfAttention, ImageSelfAttentionCfg


@dataclass
class EpipolarTransformerCfg:
    self_attention: ImageSelfAttentionCfg
    num_octaves: int
    num_layers: int
    num_heads: int
    num_samples: int
    d_dot: int
    d_mlp: int
    downscale: int


class ConvFeedForward(nn.Module):
    """ImageSelfAttention + 7x7 convs acting on the image grid."""

    cfg: ImageSelfAttentionCfg
    d_in: int
    d_hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, b: int, v: int, h: int, w: int) -> jnp.ndarray:
        # x: (b*v*h*w, 1, c) tokens -> image grid.
        c = x.shape[-1]
        grid = x.reshape(b * v, h, w, c)
        attended = ImageSelfAttention(self.cfg, c, c, name="self_attention")(grid)
        y = grid + attended
        y = nn.Conv(self.d_hidden, (7, 7), padding=3)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.d_in, (7, 7), padding=3)(y)
        return y.reshape(b * v * h * w, 1, self.d_in)


class EpipolarTransformer(nn.Module):
    cfg: EpipolarTransformerCfg
    d_in: int

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,   # (b, v, h, w, c)
        extrinsics: jnp.ndarray,
        intrinsics: jnp.ndarray,
        near: jnp.ndarray,
        far: jnp.ndarray,
    ) -> tuple[jnp.ndarray, EpipolarSampling]:
        c = self.cfg
        b, v, h0, w0, _ = features.shape

        if c.downscale > 1:
            ds = c.downscale
            features = nn.Conv(
                self.d_in, (ds, ds), strides=(ds, ds), name="downscaler"
            )(features.reshape(b * v, h0, w0, self.d_in))
            features = features.reshape(b, v, h0 // ds, w0 // ds, self.d_in)
        h, w = features.shape[2], features.shape[3]

        sampling = sample_epipolar_features(
            features, extrinsics, intrinsics, near, far, c.num_samples
        )

        if c.num_octaves > 0:
            _, index_v = generate_heterogeneous_index(v)
            # Triangulated depth of every epipolar sample along its source
            # ray (ref: epipolar_transformer.py:101-124).
            depths = get_depth(
                sampling.origins[:, :, None, :, None],      # (b, v, 1, r, 1, 3)
                sampling.directions[:, :, None, :, None],
                sampling.xy_sample,                          # (b, v, ov, r, s, 2)
                extrinsics[:, index_v][:, :, :, None, None],
                intrinsics[:, index_v][:, :, :, None, None],
            )
            nf_shape = near[:, :, None, None, None]
            depths = jnp.clip(depths, nf_shape, far[:, :, None, None, None])
            depths = depth_to_relative_disparity(
                depths, nf_shape, far[:, :, None, None, None]
            )
            pe = positional_encoding(depths[..., None], c.num_octaves)
            pe = nn.Dense(self.d_in, name="depth_encoding")(pe)
            q = sampling.features + pe
        else:
            q = sampling.features

        # Cross attention: each pixel token attends over its (ov * s)
        # epipolar samples.
        ov, s = q.shape[2], q.shape[4]
        kv = q.transpose(0, 1, 3, 2, 4, 5).reshape(b * v * h * w, ov * s, self.d_in)
        x = features.reshape(b * v * h * w, 1, self.d_in)

        def make_ff():
            return ConvFeedForward(c.self_attention, self.d_in, c.d_mlp)

        x = Transformer(
            dim=self.d_in,
            depth=c.num_layers,
            heads=c.num_heads,
            dim_head=c.d_dot,
            mlp_dim=c.d_mlp,
            selfatt=False,
            kv_dim=self.d_in,
            feed_forward_factory=make_ff,
            name="transformer",
        )(x, z=kv, b=b, v=v, h=h, w=w)
        features = x.reshape(b, v, h, w, self.d_in)

        if c.downscale > 1:
            ds = c.downscale
            y = nn.ConvTranspose(
                self.d_in, (ds, ds), strides=(ds, ds), name="upscaler"
            )(features.reshape(b * v, h, w, self.d_in))
            r = nn.Conv(self.d_in * 2, (7, 7), padding=3, name="refine_0")(y)
            r = nn.gelu(r, approximate=False)
            r = nn.Conv(self.d_in, (7, 7), padding=3, name="refine_1")(r)
            y = r + y
            features = y.reshape(b, v, h0, w0, self.d_in)

        return features, sampling
