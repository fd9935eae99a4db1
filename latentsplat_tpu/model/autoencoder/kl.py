"""KL-regularized VAE (Stable-Diffusion f8-style) in flax.linen (NHWC).

Re-implementation of the LDM/diffusers AutoencoderKL architecture wrapped
by the reference (src/model/autoencoder/autoencoder_kl.py:39-200), including
latentSplat's extension: per-up-block zero-init 1x1 skip convolutions fed
with a bilinearly resized skip tensor (rendered color + latent sample),
added to the feature map before each decoder up block
(autoencoder_kl.py:61-74,96-123).

Architecture (kl_f8): encoder conv_in -> 4 down blocks (layers_per_block
resnets + strided downsample, none on the last) -> mid (resnet, single-head
attention, resnet) -> norm/silu/conv_out to 2*latent moments -> 1x1
quant_conv. Decoder mirrors it with layers_per_block+1 resnets per up block
and nearest-2x + conv upsampling. Module names mirror diffusers' state-dict
layout so released `.pt` weights convert mechanically.

Pretrained weights: pass a converted checkpoint to the trainer's parameter
loader (`latentsplat_tpu.training.pretrained`); this module only defines the
architecture (no network access in this environment).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from ...ops.distributions import DiagonalGaussian
from ...ops.interp import resize_bilinear_align_corners
from .base import Autoencoder


def _groups(channels: int) -> int:
    """32 groups for production widths; degrade gracefully for tiny test nets."""
    import math

    return math.gcd(32, channels)


@dataclass
class AutoencoderKLCfg:
    name: str = "kl"
    model: str = "kl_f8"
    down_block_types: List[str] = field(
        default_factory=lambda: ["DownEncoderBlock2D"] * 4
    )
    up_block_types: List[str] = field(default_factory=lambda: ["UpDecoderBlock2D"] * 4)
    block_out_channels: List[int] = field(
        default_factory=lambda: [128, 256, 512, 512]
    )
    layers_per_block: int = 2
    latent_channels: int = 4
    skip_connections: bool = False
    skip_extra: bool = True
    skip_zero: bool = True
    pretrained: bool = True


class ResnetBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=_groups(x.shape[-1]), epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (the SD VAE mid-block attention)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=_groups(x.shape[-1]), epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        attn = nn.softmax(
            jnp.einsum("bic,bjc->bij", q, k) * (c**-0.5), axis=-1
        )
        y = jnp.einsum("bij,bjc->bic", attn, v)
        y = nn.Dense(c, name="to_out")(y)
        return x + y.reshape(b, h, w, c)


class Downsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        # Diffusers pads (0, 1) on each spatial dim before a stride-2 valid conv.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID", name="conv"
        )(x)


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


class VaeEncoder(nn.Module):
    cfg: AutoencoderKLCfg
    d_in: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        chans = c.block_out_channels
        h = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(x)
        for i, ch in enumerate(chans):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, name=f"down_{i}_resnet_{j}")(h)
            if i < len(chans) - 1:
                h = Downsample(ch, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(chans[-1], name="mid_resnet_0")(h)
        h = AttnBlock(chans[-1], name="mid_attn")(h)
        h = ResnetBlock(chans[-1], name="mid_resnet_1")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1, name="conv_out")(h)


class VaeDecoder(nn.Module):
    cfg: AutoencoderKLCfg
    d_out: int
    d_skip: int

    @nn.compact
    def __call__(self, z, skip_z=None):
        c = self.cfg
        chans = list(reversed(c.block_out_channels))
        h = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(z)
        h = ResnetBlock(chans[0], name="mid_resnet_0")(h)
        h = AttnBlock(chans[0], name="mid_attn")(h)
        h = ResnetBlock(chans[0], name="mid_resnet_1")(h)
        for i, ch in enumerate(chans):
            if c.skip_connections:
                assert skip_z is not None, "decoder expects skip_z"
                resized = resize_bilinear_align_corners(skip_z, h.shape[1:3])
                init = (
                    nn.initializers.zeros
                    if c.skip_zero
                    else nn.initializers.lecun_normal()
                )
                h = h + nn.Conv(
                    h.shape[-1], (1, 1), kernel_init=init,
                    bias_init=nn.initializers.zeros, name=f"skip_conv_{i}"
                )(resized)
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock(ch, name=f"up_{i}_resnet_{j}")(h)
            if i < len(chans) - 1:
                h = Upsample(ch, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.d_out, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL(Autoencoder):
    cfg: AutoencoderKLCfg
    d_in: int = 3
    d_skip_extra: int = 0

    @property
    def d_skip(self) -> int:
        d = self.cfg.latent_channels
        if self.cfg.skip_extra:
            d += self.d_skip_extra
        return d

    def setup(self):
        # Submodules live in setup so both `encode` and `decode` can be
        # called independently via apply(method=...).
        self.vae_encoder = VaeEncoder(self.cfg, self.d_in, name="encoder")
        self.quant_conv = nn.Conv(
            2 * self.cfg.latent_channels, (1, 1), name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.latent_channels, (1, 1), name="post_quant_conv"
        )
        self.vae_decoder = VaeDecoder(self.cfg, self.d_in, self.d_skip, name="decoder")

    def encode(self, images: jnp.ndarray) -> DiagonalGaussian:
        """[0,1] images (..., h, w, c) -> latent posterior (any batch dims)."""
        batch_dims = images.shape[:-3]
        x = 2.0 * images - 1.0
        x = x.reshape(-1, *images.shape[-3:])
        moments = self.quant_conv(self.vae_encoder(x))
        moments = moments.reshape(*batch_dims, *moments.shape[1:])
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(
        self, z: jnp.ndarray, skip_z: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Latents (..., h', w', z) [+ skip (..., H, W, d_skip)] -> [0,1] images."""
        batch_dims = z.shape[:-3]
        z_flat = z.reshape(-1, *z.shape[-3:])
        skip_flat = (
            skip_z.reshape(-1, *skip_z.shape[-3:]) if skip_z is not None else None
        )
        y = self.vae_decoder(self.post_quant_conv(z_flat), skip_flat)
        y = (y + 1.0) / 2.0
        return y.reshape(*batch_dims, *y.shape[1:])

    def __call__(self, images: jnp.ndarray, skip_z: Optional[jnp.ndarray] = None):
        """Init-path: encode then decode the mode."""
        posterior = self.encode(images)
        z = posterior.mode()
        return self.decode(z, skip_z)

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.cfg.block_out_channels) - 1)

    @property
    def d_latent(self) -> int:
        return self.cfg.latent_channels

    @property
    def expects_skip(self) -> bool:
        return self.cfg.skip_connections

    @property
    def expects_skip_extra(self) -> bool:
        return self.cfg.skip_extra

    @property
    def last_layer_param_path(self):
        return ("decoder", "conv_out", "kernel")
