"""Raw feature vector -> world-space Gaussian parameters.

Parity with reference src/model/encoder/common/gaussian_adapter.py:32-139:
sigmoid-mapped scales scaled by depth and a pixel-size multiplier,
normalized xyzw quaternions, SH coefficients biased towards DC at init via
fixed masks, covariance built in camera space and rotated into world space,
means from ray origin + direction * depth, and SH rotated into the world
frame. No learnable parameters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry import get_world_rays
from ...ops.gaussians import build_covariance
from ...ops.sh import rotate_sh


@dataclass
class GaussianAdapterCfg:
    gaussian_scale_min: float
    gaussian_scale_max: float
    color_sh_degree: int
    feature_sh_degree: int


class AdapterGaussians(NamedTuple):
    means: jnp.ndarray              # (..., 3)
    covariances: jnp.ndarray        # (..., 3, 3)
    scales: jnp.ndarray             # (..., 3) camera-frame (viz/ply only)
    rotations: jnp.ndarray          # (..., 4) camera-frame (viz/ply only)
    color_harmonics: jnp.ndarray    # (..., 3, d_color_sh)
    feature_harmonics: jnp.ndarray  # (..., C, d_feature_sh)
    opacities: jnp.ndarray          # (...)


def _sh_mask(degree: int) -> np.ndarray:
    """DC-biased init mask (ref: gaussian_adapter.py:44-61)."""
    mask = np.ones(((degree + 1) ** 2,), np.float32)
    for deg in range(1, degree + 1):
        mask[deg**2 : (deg + 1) ** 2] = 0.1 * 0.25**deg
    return mask


class GaussianAdapter:
    def __init__(self, cfg: GaussianAdapterCfg, n_feature_channels: int):
        self.cfg = cfg
        self.n_feature_channels = n_feature_channels
        self.color_sh_mask = jnp.asarray(_sh_mask(cfg.color_sh_degree))
        self.feature_sh_mask = jnp.asarray(_sh_mask(cfg.feature_sh_degree))

    @property
    def d_color_sh(self) -> int:
        return (self.cfg.color_sh_degree + 1) ** 2

    @property
    def d_feature_sh(self) -> int:
        return (self.cfg.feature_sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        return 7 + 3 * self.d_color_sh + self.n_feature_channels * self.d_feature_sh

    def __call__(
        self,
        extrinsics: jnp.ndarray,    # (*#batch, 4, 4)
        intrinsics: jnp.ndarray,    # (*#batch, 3, 3)
        coordinates: jnp.ndarray,   # (*#batch, 2)
        depths: jnp.ndarray,        # (*#batch)
        opacities: jnp.ndarray,     # (*#batch)
        raw_gaussians: jnp.ndarray, # (*#batch, d_in)
        image_shape: tuple[int, int],
        eps: float = 1e-8,
    ) -> AdapterGaussians:
        cfg = self.cfg
        splits = np.cumsum([3, 4, 3 * self.d_color_sh])
        scales, rotations, color_sh, feature_sh = jnp.split(
            raw_gaussians, splits.tolist(), axis=-1
        )

        # Scale: sigmoid in [min, max], times depth and pixel-size multiplier.
        h, w = image_shape
        scales = cfg.gaussian_scale_min + (
            cfg.gaussian_scale_max - cfg.gaussian_scale_min
        ) * jax.nn.sigmoid(scales)
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], dtype=jnp.float32)
        multiplier = self.get_scale_multiplier(intrinsics, pixel_size)
        scales = scales * depths[..., None] * multiplier[..., None]

        rotations = rotations / (
            jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps
        )

        color_sh = color_sh.reshape(*color_sh.shape[:-1], 3, self.d_color_sh)
        feature_sh = feature_sh.reshape(
            *feature_sh.shape[:-1], self.n_feature_channels, self.d_feature_sh
        )
        color_sh = (
            jnp.broadcast_to(color_sh, (*opacities.shape, 3, self.d_color_sh))
            * self.color_sh_mask
        )
        feature_sh = (
            jnp.broadcast_to(
                feature_sh,
                (*opacities.shape, self.n_feature_channels, self.d_feature_sh),
            )
            * self.feature_sh_mask
        )

        covariances = build_covariance(scales, rotations)
        c2w_rotations = extrinsics[..., :3, :3]
        covariances = c2w_rotations @ covariances @ jnp.swapaxes(c2w_rotations, -1, -2)

        origins, directions = get_world_rays(coordinates, extrinsics, intrinsics)
        means = origins + directions * depths[..., None]

        return AdapterGaussians(
            means=means,
            covariances=covariances,
            color_harmonics=rotate_sh(color_sh, c2w_rotations[..., None, :, :]),
            feature_harmonics=rotate_sh(feature_sh, c2w_rotations[..., None, :, :]),
            opacities=opacities,
            scales=scales,
            rotations=jnp.broadcast_to(rotations, (*scales.shape[:-1], 4)),
        )

    def get_scale_multiplier(
        self,
        intrinsics: jnp.ndarray,
        pixel_size: jnp.ndarray,
        multiplier: float = 0.1,
    ) -> jnp.ndarray:
        """0.1 * (K[0:2,0:2]^-1 @ pixel_size) summed (ref: gaussian_adapter.py:116-127)."""
        a = intrinsics[..., 0, 0]
        b = intrinsics[..., 0, 1]
        c = intrinsics[..., 1, 0]
        d = intrinsics[..., 1, 1]
        det = a * d - b * c
        inv_row0 = jnp.stack([d, -b], axis=-1) / det[..., None]
        inv_row1 = jnp.stack([-c, a], axis=-1) / det[..., None]
        k_inv = jnp.stack([inv_row0, inv_row1], axis=-2)
        xy_multipliers = multiplier * jnp.einsum("...ij,j->...i", k_inv, pixel_size)
        return xy_multipliers.sum(axis=-1)
