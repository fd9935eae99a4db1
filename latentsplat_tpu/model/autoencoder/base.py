"""Autoencoder interface (parity: reference src/model/autoencoder/autoencoder.py:12-60).

Implementations are flax.linen modules exposing two apply methods,
`encode(images) -> DiagonalGaussian` and `decode(z, skip_z) -> images`,
plus static properties describing the latent space. Images and latents are
channel-last.
"""

from __future__ import annotations

import flax.linen as nn


class Autoencoder(nn.Module):
    @property
    def downscale_factor(self) -> int:
        raise NotImplementedError

    @property
    def d_latent(self) -> int:
        raise NotImplementedError

    @property
    def expects_skip(self) -> bool:
        raise NotImplementedError

    @property
    def expects_skip_extra(self) -> bool:
        raise NotImplementedError

    @property
    def last_layer_param_path(self):
        """Path (tuple of names) of the adaptive-GAN anchor kernel, or None."""
        return None
