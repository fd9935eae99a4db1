"""Patchwise image self-attention (flax.linen, NHWC).

Parity with reference src/model/encoder/epipolar/image_self_attention.py:
patch-embed conv + 2D positional encoding -> self-attention transformer ->
conv-transpose back to pixel resolution.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ...geometry import sample_image_grid
from ..encodings import positional_encoding
from ..transformer import Transformer


@dataclass
class ImageSelfAttentionCfg:
    patch_size: int
    num_octaves: int
    num_layers: int
    num_heads: int
    d_token: int
    d_dot: int
    d_mlp: int


class ImageSelfAttention(nn.Module):
    cfg: ImageSelfAttentionCfg
    d_in: int
    d_out: int

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, d_in) -> (B, H, W, d_out)."""
        c = self.cfg
        p = c.patch_size
        tokens = nn.Conv(c.d_token, (p, p), strides=(p, p), name="patch_embed")(image)
        tokens = nn.relu(tokens)
        b, nh, nw, _ = tokens.shape

        xy, _ = sample_image_grid((nh, nw))
        pe = positional_encoding(xy, c.num_octaves)
        pe = nn.Dense(c.d_token, name="pe_proj")(pe)
        tokens = tokens + pe[None]

        tokens = tokens.reshape(b, nh * nw, c.d_token)
        tokens = Transformer(
            dim=c.d_token,
            depth=c.num_layers,
            heads=c.num_heads,
            dim_head=c.d_dot,
            mlp_dim=c.d_mlp,
            name="transformer",
        )(tokens)
        tokens = tokens.reshape(b, nh, nw, c.d_token)
        return nn.ConvTranspose(
            self.d_out, (p, p), strides=(p, p), name="resampler"
        )(tokens)
