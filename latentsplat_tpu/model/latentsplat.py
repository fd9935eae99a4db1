"""LatentSplat: the assembled model (autoencoder + encoder + decoder +
discriminator + LPIPS) and its forward passes.

Plays the role of the reference's ModelWrapper glue
(src/model/model_wrapper.py:132-984) minus the Lightning machinery: a plain
container of flax module definitions with pure functions for the generator
forward pass; optimization lives in latentsplat_tpu.training.step.

Parameter layout:
  params = {
    "generator": {"encoder": ..., "autoencoder": ...},
    "discriminator": {...} | absent,
    "lpips": {...}  (frozen),
  }
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..loss.lpips import LPIPS
from ..misc.fraction_utils import get_integer
from ..ops.resize import resize_antialias
from .autoencoder import get_autoencoder
from .decoder import get_decoder
from .discriminator import get_discriminator
from .encoder import get_encoder
from .types import VariationalGaussians


@dataclass
class LatentSplat:
    """Module bundle. `model_cfg` is a config.ModelCfg."""

    cfg: Any                      # ModelCfg
    background_color: tuple

    def __post_init__(self):
        cfg = self.cfg
        self.autoencoder = get_autoencoder(cfg.autoencoder, d_in=3, d_skip_extra=3)
        self.encoder = get_encoder(
            cfg.encoder,
            d_in=self.autoencoder.d_latent if cfg.encode_latents else 3,
            n_feature_channels=self.autoencoder.d_latent,
            scale_factor=Fraction(
                cfg.supersampling_factor,
                1 if cfg.encode_latents else self.autoencoder.downscale_factor,
            ),
            variational=cfg.variational != "none",
        )
        self.decoder = get_decoder(
            cfg.decoder, self.background_color, cfg.variational == "latents"
        )
        self.discriminator = (
            get_discriminator(cfg.discriminator) if cfg.discriminator else None
        )
        self.lpips = LPIPS()

    # -- scale bookkeeping (ref: model_wrapper.py:316-319,266-274) ----------
    @property
    def scale_factor(self) -> Fraction:
        return Fraction(
            self.cfg.supersampling_factor, self.autoencoder.downscale_factor
        )

    @staticmethod
    def scaled_size(scale: Fraction, size) -> tuple[int, ...]:
        return tuple(get_integer(scale * s) for s in size)

    @staticmethod
    def rescale(x: jnp.ndarray, scale: Fraction) -> jnp.ndarray:
        """Antialiased NHWC resize by an exact rational factor."""
        h, w = x.shape[-3], x.shape[-2]
        out = LatentSplat.scaled_size(scale, (h, w))
        return resize_antialias(x, out)

    # -- initialization ------------------------------------------------------
    def init_params(self, key: jax.Array, example_batch: dict) -> Dict[str, Any]:
        k_enc, k_ae, k_disc, k_lpips, k_sample = jax.random.split(key, 5)
        context = example_batch["context"]
        b, v, h, w, _ = context["image"].shape

        init_features = None
        if self.cfg.encode_latents:
            # The encoder consumes AE latents, not pixels: init with the
            # latent channel count / resolution or the backbone's input
            # conv gets image-shaped parameters.
            ds = self.autoencoder.downscale_factor
            init_features = jnp.zeros(
                (b * v, h // ds, w // ds, self.autoencoder.d_latent)
            )
        # Every .init runs under jit: flax init executed eagerly dispatches
        # thousands of single ops, which costs minutes over a remote-TPU
        # tunnel (~25 ms/dispatch) where one compiled call takes seconds.
        enc_vars = jax.jit(
            lambda rngs, ctx, feats: self.encoder.init(
                rngs, ctx, 0, features=feats
            )
        )({"params": k_enc, "sample": k_sample}, context, init_features)
        gen = {"encoder": enc_vars["params"]}

        if self.autoencoder_has_params:
            fake_skip = (
                jnp.zeros((1, h, w, self.autoencoder.d_skip))
                if self.autoencoder.expects_skip
                else None
            )
            ae_vars = jax.jit(self.autoencoder.init)(
                k_ae, jnp.zeros((1, h, w, 3)), fake_skip
            )
            gen["autoencoder"] = ae_vars["params"]

        params = {"generator": gen}

        if self.discriminator is not None:
            disc_vars = jax.jit(self.discriminator.init)(
                k_disc, jnp.zeros((1, h, w, 3))
            )
            params["discriminator"] = disc_vars["params"]

        lpips_vars = jax.jit(self.lpips.init)(
            k_lpips, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
        )
        params["lpips"] = lpips_vars["params"]
        return params

    @property
    def autoencoder_has_params(self) -> bool:
        return self.cfg.autoencoder.name != "id"

    # -- functional component application ------------------------------------
    def apply_encoder(
        self,
        gen_params,
        context: dict,
        global_step,
        rng: Optional[jax.Array],
        features=None,
        deterministic: bool = False,
    ) -> VariationalGaussians:
        rngs = {} if deterministic or rng is None else {"sample": rng}
        if features is not None:
            # Latent features arrive (b, v, h', w', c) from ae_encode; the
            # encoder consumes a flattened view axis like the image path.
            features = features.reshape((-1,) + features.shape[-3:])
        return self.encoder.apply(
            {"params": gen_params["encoder"]},
            context,
            global_step,
            features=features,
            deterministic=deterministic,
            rngs=rngs,
        )

    def ae_encode(self, gen_params, images):
        if not self.autoencoder_has_params:
            return self.autoencoder.encode(images)
        return self.autoencoder.apply(
            {"params": gen_params["autoencoder"]}, images,
            method=type(self.autoencoder).encode,
        )

    def ae_decode(self, gen_params, z, skip_z=None):
        if not self.autoencoder_has_params:
            return self.autoencoder.decode(z, skip_z)
        return self.autoencoder.apply(
            {"params": gen_params["autoencoder"]}, z, skip_z,
            method=type(self.autoencoder).decode,
        )

    def discriminate(self, disc_params, images):
        assert self.discriminator is not None
        b, v = images.shape[:2]
        logits = self.discriminator.apply(
            {"params": disc_params}, images.reshape(b * v, *images.shape[2:])
        )
        return logits.reshape(b, v, *logits.shape[1:])

    def lpips_fn(self, lpips_params):
        def fn(pred, target):
            return self.lpips.apply({"params": lpips_params}, pred, target)

        return fn

    def last_layer_path(self) -> tuple[str, ...]:
        """Adaptive-GAN-weight anchor: autoencoder conv_out kernel, else the
        encoder's to_gaussians kernel (ref: model_wrapper.py:233-241)."""
        if self.autoencoder_has_params:
            return ("autoencoder", *self.autoencoder.last_layer_param_path)
        return ("encoder", *self.encoder.last_layer_param_path)
