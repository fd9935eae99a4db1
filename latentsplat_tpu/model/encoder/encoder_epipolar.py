"""The epipolar encoder: context images -> variational 3D Gaussians.

Parity with reference src/model/encoder/encoder_epipolar.py:51-268:
backbone -> ReLU+Linear projection -> epipolar transformer -> optional
high-res skip -> monocular depth sampling (gaussians_per_pixel) ->
to_gaussians head -> sub-pixel xy offsets -> GaussianAdapter -> opacity via
the warm-up pdf mapping -> flatten (v, ray, surface, sample) into a single
Gaussian axis; feature harmonics become a DiagonalGaussian when variational.

Context dict layout (NHWC): image (b, v, h, w, 3), extrinsics (b, v, 4, 4),
intrinsics (b, v, 3, 3) normalized, near/far (b, v).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...geometry import sample_image_grid
from ...ops.distributions import DiagonalGaussian
from ..types import VariationalGaussians
from .backbone import BackboneCfg, get_backbone
from .depth_predictor import DepthPredictorMonocular
from .epipolar_transformer import EpipolarTransformer, EpipolarTransformerCfg
from .gaussian_adapter import GaussianAdapter, GaussianAdapterCfg


@dataclass
class OpacityMappingCfg:
    initial: float
    final: float
    warm_up: int


@dataclass
class EncoderEpipolarCfg:
    name: str
    d_backbone: int
    d_feature: int
    num_monocular_samples: int
    num_surfaces: int
    predict_opacity: bool
    backbone: BackboneCfg
    near_disparity: float
    gaussian_adapter: GaussianAdapterCfg
    apply_bounds_shim: bool
    epipolar_transformer: EpipolarTransformerCfg
    opacity_mapping: OpacityMappingCfg
    gaussians_per_pixel: int
    use_epipolar_transformer: bool
    use_transmittance: bool


class EncoderEpipolar(nn.Module):
    cfg: EncoderEpipolarCfg
    d_in: int
    n_feature_channels: int
    scale_factor: Fraction
    variational: bool

    @property
    def adapter(self) -> GaussianAdapter:
        # Parameter-free helper (not a submodule); variational Gaussians
        # carry mean+logvar feature SH (ref: encoder_epipolar.py:87-90).
        return GaussianAdapter(
            self.cfg.gaussian_adapter,
            2 * self.n_feature_channels if self.variational else self.n_feature_channels,
        )

    def map_pdf_to_opacity(self, pdf: jnp.ndarray, global_step) -> jnp.ndarray:
        """Warm-up-scheduled pdf -> opacity mapping (ref: encoder_epipolar.py:113-126)."""
        cfg = self.cfg.opacity_mapping
        step = jnp.asarray(global_step, jnp.float32)
        x = cfg.initial + jnp.minimum(step / max(cfg.warm_up, 1), 1.0) * (
            cfg.final - cfg.initial
        )
        exponent = 2.0**x
        return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))

    @nn.compact
    def __call__(
        self,
        context: dict,
        global_step,
        features: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ) -> VariationalGaussians:
        cfg = self.cfg
        b, v = context["image"].shape[:2]

        if features is None:
            features = context["image"].reshape(b * v, *context["image"].shape[2:])
        backbone = get_backbone(
            cfg.backbone, self.d_in, cfg.d_backbone, self.scale_factor
        )
        features = backbone(features)
        h, w = features.shape[1], features.shape[2]
        features = nn.Dense(cfg.d_feature, name="backbone_projection")(
            nn.relu(features)
        )
        features = features.reshape(b, v, h, w, cfg.d_feature)

        if cfg.use_epipolar_transformer:
            features, sampling = EpipolarTransformer(
                cfg.epipolar_transformer, cfg.d_feature, name="epipolar_transformer"
            )(features, context["extrinsics"], context["intrinsics"],
              context["near"], context["far"])

        if self.scale_factor == 1 and (h, w) == context["image"].shape[2:4]:
            # High-resolution skip (only when no downscaling,
            # ref: encoder_epipolar.py:104-111,157-161). When the encoder
            # consumes AE latents the feature grid sits at latent
            # resolution and the image-resolution skip cannot apply (the
            # reference never combines encode_latents with scale 1 either).
            skip = context["image"].reshape(b * v, *context["image"].shape[2:])
            skip = nn.Conv(cfg.d_feature, (7, 7), padding=3,
                           name="high_resolution_skip")(skip)
            skip = nn.relu(skip)
            features = features + skip.reshape(b, v, h, w, cfg.d_feature)

        # Depth sampling.
        features = features.reshape(b, v, h * w, cfg.d_feature)
        gpp = 1 if deterministic else cfg.gaussians_per_pixel
        depths, densities = DepthPredictorMonocular(
            cfg.d_feature,
            cfg.num_monocular_samples,
            cfg.num_surfaces,
            cfg.use_transmittance,
            name="depth_predictor",
        )(features, context["near"], context["far"], deterministic, gpp)

        # Gaussian head.
        raw = nn.Dense(
            cfg.num_surfaces * (2 + self.adapter.d_in), name="to_gaussians"
        )(nn.relu(features))
        raw = raw.reshape(b, v, h * w, cfg.num_surfaces, 2 + self.adapter.d_in)

        xy_ray, _ = sample_image_grid((h, w))
        xy_ray = xy_ray.reshape(h * w, 1, 2)
        offset_xy = nn.sigmoid(raw[..., :2])
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
        xy_ray = xy_ray[None, None] + (offset_xy - 0.5) * pixel_size

        gpp_cfg = cfg.gaussians_per_pixel
        gaussians = self.adapter(
            context["extrinsics"][:, :, None, None, None],
            context["intrinsics"][:, :, None, None, None],
            xy_ray[:, :, :, :, None],                        # (b, v, r, srf, 1, 2)
            depths,
            self.map_pdf_to_opacity(densities, global_step) / gpp_cfg,
            raw[..., None, 2:],                              # (b, v, r, srf, 1, ch)
            (h, w),
        )

        # Optional per-pixel opacity multiplier (ref: encoder_epipolar.py:209-214).
        if cfg.predict_opacity:
            op = nn.Dense(1, name="to_opacity")(nn.relu(features))
            opacity_multiplier = nn.sigmoid(op)[..., None]   # (b, v, r, 1, 1)
        else:
            opacity_multiplier = 1.0

        def flatten_g(x):
            # (b, v, r, srf, spp, ...) -> (b, v*r*srf*spp, ...)
            return x.reshape(b, -1, *x.shape[5:])

        feature_harmonics = flatten_g(gaussians.feature_harmonics)
        feature_dist = (
            DiagonalGaussian.from_params(feature_harmonics, axis=-2)
            if self.variational
            else DiagonalGaussian(feature_harmonics)
        )
        return VariationalGaussians(
            means=flatten_g(gaussians.means),
            covariances=flatten_g(gaussians.covariances),
            opacities=flatten_g(opacity_multiplier * gaussians.opacities),
            color_harmonics=flatten_g(gaussians.color_harmonics),
            feature_harmonics=feature_dist,
        )

    @property
    def last_layer_param_path(self) -> tuple[str, str]:
        """Path of the adaptive-GAN-weight anchor (ref: encoder_epipolar.py:266-268)."""
        return ("to_gaussians", "kernel")
