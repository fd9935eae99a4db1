"""Model-level pytree types.

Parity with reference src/model/types.py:9-58 — `Gaussians`,
`VariationalGaussians` (whose feature harmonics are a DiagonalGaussian over
SH coefficients), and the `Prediction`/`GroundTruth` loss containers.
Images are NHWC throughout this framework (TPU-native layout), i.e.
(batch, view, height, width, channel).
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.distributions import DiagonalGaussian

VariationalMode = Literal["none", "gaussians", "latents"]


@struct.dataclass
class Gaussians:
    means: jnp.ndarray                           # (batch, gaussian, 3)
    covariances: jnp.ndarray                     # (batch, gaussian, 3, 3)
    opacities: jnp.ndarray                       # (batch, gaussian)
    color_harmonics: Optional[jnp.ndarray] = None    # (b, g, 3, d_color_sh)
    feature_harmonics: Optional[jnp.ndarray] = None  # (b, g, c, d_feature_sh)


@struct.dataclass
class VariationalGaussians:
    """Gaussians whose feature harmonics form a diagonal Gaussian posterior."""

    means: jnp.ndarray
    covariances: jnp.ndarray
    opacities: jnp.ndarray
    color_harmonics: Optional[jnp.ndarray] = None
    feature_harmonics: Optional[DiagonalGaussian] = None  # over (b, g, c, d_sh)

    def _with_features(self, feature_harmonics) -> Gaussians:
        return Gaussians(
            self.means,
            self.covariances,
            self.opacities,
            self.color_harmonics,
            feature_harmonics,
        )

    def flatten(self) -> Gaussians:
        """Pack mean+logvar along the channel axis (reference types.py:25-26)."""
        return self._with_features(self.feature_harmonics.params(axis=-2))

    def mode(self) -> Gaussians:
        return self._with_features(self.feature_harmonics.mode())

    def sample(self, key: jax.Array) -> Gaussians:
        return self._with_features(self.feature_harmonics.sample(key))


@struct.dataclass
class Prediction:
    image: Optional[jnp.ndarray] = None          # (b, v, h, w, c)
    posterior: Optional[DiagonalGaussian] = None
    depth: Optional[jnp.ndarray] = None          # (b, v, h, w)
    logits_fake: Optional[jnp.ndarray] = None    # (b, v, h', w', 1)
    logits_real: Optional[jnp.ndarray] = None
    # Predicted color-SH coefficients (gaussian supervision site only):
    # carried for magnitude regularization — the exact-mode collapse grows
    # |color SH| exponentially along the compositor's cancellation null
    # space (NOTES.md round-5 ledger).
    harmonics: Optional[jnp.ndarray] = None      # (b, g, 3, d_sh)


@struct.dataclass
class GroundTruth:
    image: Optional[jnp.ndarray] = None          # (b, v, h, w, c)
    near: Optional[jnp.ndarray] = None           # (b, v)
    far: Optional[jnp.ndarray] = None            # (b, v)
