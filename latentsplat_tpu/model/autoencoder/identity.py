"""Identity autoencoder for pixel-space ablations.

Parity with reference src/model/autoencoder/autoencoder_id.py:17-59:
RGB passthrough, downscale 1, zero-variance posterior.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ...ops.distributions import DiagonalGaussian
from .base import Autoencoder


@dataclass
class AutoencoderIdCfg:
    name: str = "id"
    skip_connections: bool = False


class AutoencoderId(Autoencoder):
    cfg: AutoencoderIdCfg
    d_in: int = 3
    d_skip_extra: int = 0

    def encode(self, images: jnp.ndarray) -> DiagonalGaussian:
        return DiagonalGaussian(images)

    def decode(self, z: jnp.ndarray, skip_z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return z

    def __call__(self, images: jnp.ndarray):
        # For linen init compatibility (no parameters).
        return self.decode(self.encode(images).mode())

    @property
    def downscale_factor(self) -> int:
        return 1

    @property
    def d_latent(self) -> int:
        return self.d_in

    @property
    def expects_skip(self) -> bool:
        return False

    @property
    def expects_skip_extra(self) -> bool:
        return False
