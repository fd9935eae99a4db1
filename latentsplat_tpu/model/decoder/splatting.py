"""Splatting decoder: Gaussians -> target-view renders.

Parity with reference src/model/decoder/decoder_splatting_cuda.py:20-119,
redesigned TPU-first: instead of repeating Gaussians per view and looping
CUDA launches (decoder_splatting_cuda.py:33-41), the scene batch is vmapped
and each scene's views are rendered sequentially inside one compiled
program, sharing the Gaussian payload across views (see ops/rasterize/api).

Key semantic carried over exactly: the rendered feature posterior. When
variational, feature channels pack mean+logvar; otherwise logvar :=
log(1 - stop_grad(mask)) so empty pixels have ~unit variance around the
zero background (decoder_splatting_cuda.py:43-48).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ...ops.distributions import DiagonalGaussian
from ...ops.rasterize import render, render_depth
from ...ops.rasterize.api import Backend, DepthRenderingMode
from ..types import Gaussians


@dataclass
class DecoderSplattingCfg:
    name: str = "splatting"
    backend: Backend = "tiled"
    # Per-gaussian tile-duplication cap (3x3 rect default). Splats larger
    # than the cap are truncated; smaller caps cut pair-sort time.
    max_tiles_per_gaussian: int = 9
    # Static pair-buffer bound = factor * G for the tiled backend
    # (real scenes measure ~2.4 pairs/gaussian at 256 px).
    pair_budget_factor: float = 4.0
    # Rematerialize each view's render in the backward pass instead of
    # saving its sorted pair buffer (~160 MB/view at the flagship scale);
    # costs ~1 extra rasterizer forward per view in the backward.
    remat: bool = False
    # "fast" rides sorted rasterizer attributes at half precision (f16
    # tile-relative coordinates, bf16 conic/opacity/channels) for ~33%
    # less pair-sort payload; "exact" keeps geometry rows f32.
    precision: str = "exact"


@struct.dataclass
class DecoderOutput:
    color: Optional[jnp.ndarray]                       # (b, v, h, w, 3)
    feature_posterior: Optional[DiagonalGaussian]      # over (b, v, h, w, c)
    mask: jnp.ndarray                                  # (b, v, h, w)
    depth: jnp.ndarray                                 # (b, v, h, w)
    # Tile pairs dropped by the tiled backend's static pair budget (b, v);
    # nonzero means the render silently truncated (log it!).
    pairs_dropped: Optional[jnp.ndarray] = None


class DecoderSplatting:
    def __init__(
        self,
        cfg: DecoderSplattingCfg,
        background_color=(0.0, 0.0, 0.0),
        variational: bool = False,
    ):
        self.cfg = cfg
        self.background_color = jnp.asarray(background_color, jnp.float32)
        self.variational = variational

    def __call__(
        self,
        gaussians: Gaussians,
        extrinsics: jnp.ndarray,   # (b, v, 4, 4)
        intrinsics: jnp.ndarray,   # (b, v, 3, 3)
        near: jnp.ndarray,         # (b, v)
        far: jnp.ndarray,          # (b, v)
        image_shape: tuple[int, int],
        depth_mode: Optional[DepthRenderingMode] = None,
        return_colors: bool = True,
        return_features: bool = True,
    ) -> DecoderOutput:
        b, v = extrinsics.shape[:2]
        h, w = image_shape

        color_sh = gaussians.color_harmonics if return_colors else None
        feature_sh = gaussians.feature_harmonics if return_features else None
        assert color_sh is not None or feature_sh is not None

        # Gaussians carry only the scene axis; the renderer shares them
        # across that scene's views (no per-view duplication).
        out = render(
            extrinsics,
            intrinsics,
            near,
            far,
            image_shape,
            jnp.broadcast_to(self.background_color, (b, 3)),
            gaussians.means,
            gaussians.covariances,
            gaussians.opacities,
            color_sh,
            feature_sh,
            backend=self.cfg.backend,
            max_tiles_per_gaussian=self.cfg.max_tiles_per_gaussian,
            pair_budget_factor=self.cfg.pair_budget_factor,
            remat=self.cfg.remat,
            precision=self.cfg.precision,
        )

        # (b, v, c, h, w) -> (b, v, h, w, c).
        color = (
            out.color.transpose(0, 1, 3, 4, 2) if out.color is not None else None
        )
        mask = out.mask
        depth = out.depth

        if out.feature is not None:
            features = out.feature.transpose(0, 1, 3, 4, 2)
            if self.variational:
                posterior = DiagonalGaussian.from_params(features, axis=-1)
            else:
                # Background = 0 = mean; unit variance on empty pixels
                # (ref: decoder_splatting_cuda.py:43-48).
                logvar = jnp.log1p(-jax.lax.stop_gradient(mask))[..., None]
                logvar = jnp.broadcast_to(logvar, features.shape)
                posterior = DiagonalGaussian(features, logvar)
        else:
            posterior = None

        dec = DecoderOutput(
            color=color, feature_posterior=posterior, mask=mask, depth=depth,
            pairs_dropped=out.pairs_dropped,
        )
        if depth_mode is not None and depth_mode != "depth":
            dec = dec.replace(
                depth=self.render_special_depth(
                    gaussians, extrinsics, intrinsics, near, far, image_shape, depth_mode
                )
            )
        return dec

    def render_special_depth(
        self,
        gaussians: Gaussians,
        extrinsics, intrinsics, near, far,
        image_shape: tuple[int, int],
        mode: DepthRenderingMode = "depth",
    ) -> jnp.ndarray:
        return render_depth(
            extrinsics, intrinsics, near, far,
            image_shape,
            gaussians.means, gaussians.covariances, gaussians.opacities,
            mode=mode, backend=self.cfg.backend,
        )
