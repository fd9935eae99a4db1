"""Pix2Pix PatchGAN discriminator (flax.linen, NHWC).

Parity with reference src/model/discriminator/discriminator_patch_gan.py:
4x4 stride-2 convs, BatchNorm, LeakyReLU(0.2), 1-channel logit map.

TPU-native normalization note: the reference's BatchNorm2d only ever runs in
train mode here (the discriminator is never evaluated with running stats),
so this implementation normalizes with the current batch statistics and
keeps only the affine parameters — numerically identical to train-mode
BatchNorm, stateless, and pure under jit. When the batch axis is sharded
over a mesh, XLA turns the batch reduction into a cross-device collective
(i.e. sync-BN; the reference's DDP BatchNorm is per-device, an
implementation detail rather than a modeled behavior).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass
class DiscriminatorPatchGanCfg:
    name: str = "patch_gan"
    model: str = "kl_f8"
    base_dim: int = 64
    max_dim_mult: int = 8
    n_layers: int = 3
    downscale_factor: int = 2
    kernel_size: int = 4
    padding: int = 1
    leaky_relu_neg_slope: float = 0.2
    pretrained: bool = True


class BatchNormTrain(nn.Module):
    """Train-mode batch normalization: batch statistics + affine params."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = x.mean(axis=(0, 1, 2), keepdims=True)
        var = x.var(axis=(0, 1, 2), keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class DiscriminatorPatchGan(nn.Module):
    cfg: DiscriminatorPatchGanCfg
    d_in: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, d_in) -> (B, H/2^n, W/2^n, 1) patch logits."""
        c = self.cfg
        k = (c.kernel_size, c.kernel_size)
        s = (c.downscale_factor, c.downscale_factor)
        pad = c.padding

        def lrelu(v):
            return nn.leaky_relu(v, negative_slope=c.leaky_relu_neg_slope)

        y = nn.Conv(c.base_dim, k, strides=s, padding=pad, name="conv_0")(x)
        y = lrelu(y)

        dim_mult = 1
        for n in range(1, c.n_layers):
            dim_mult = min(c.downscale_factor**n, c.max_dim_mult)
            ch = c.base_dim * dim_mult
            y = nn.Conv(ch, k, strides=s, padding=pad, use_bias=False,
                        name=f"conv_{n}")(y)
            y = BatchNormTrain(ch, name=f"bn_{n}")(y)
            y = lrelu(y)

        dim_mult = min(c.downscale_factor**c.n_layers, c.max_dim_mult)
        ch = c.base_dim * dim_mult
        y = nn.Conv(ch, k, strides=(1, 1), padding=pad, use_bias=False,
                    name=f"conv_{c.n_layers}")(y)
        y = BatchNormTrain(ch, name=f"bn_{c.n_layers}")(y)
        y = lrelu(y)
        return nn.Conv(1, k, strides=(1, 1), padding=pad, name="conv_out")(y)

    @property
    def downscale_factor(self) -> int:
        return self.cfg.downscale_factor**self.cfg.n_layers
