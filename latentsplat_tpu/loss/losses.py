"""Config-driven loss system (pure functions + static-graph step gating).

Parity with reference src/loss/: per-loss `weight` and `apply_after_step`
(loss.py:13-17), loss groups mapping 1:1 to supervision sites
(loss_group.py:14-113), hinge/vanilla discriminator losses with the 1/2
fake+real split (loss_discriminator.py:19-65), generator loss
-E[logits_fake] (loss_generator.py:25-30), KL (loss_kl.py), MSE/L1, LPIPS,
and edge-aware depth smoothness (loss_depth.py:20-52).

TPU-first translation: the reference gates losses with Python `if
global_step < apply_after_step` (loss.py:50-56). Here gating is a
`jnp.where(step >= apply_after_step, weight, 0)` factor, so the pjit'd train
step is one static graph for all steps; group-level activity (which model
branches run at all) stays a host-side static decision (see
LossGroup.is_active) exactly like the reference's `get_active_loss_groups`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Literal, Optional, Tuple

import jax
import jax.numpy as jnp

from ..model.types import GroundTruth, Prediction


@dataclass
class LossCfg:
    name: str
    weight: float = 1.0
    apply_after_step: int = 0


@dataclass
class LossDiscriminatorCfg(LossCfg):
    name: str = "discriminator"
    loss: Literal["hinge", "vanilla"] = "hinge"


@dataclass
class LossGroupCfg:
    nll: Optional[List[LossCfg]] = None
    generator: Optional[LossCfg] = None
    discriminator: Optional[LossDiscriminatorCfg] = None


@dataclass
class LossesCfg:
    gaussian: Optional[LossGroupCfg] = None
    context: Optional[LossGroupCfg] = None
    target_autoencoder: Optional[LossGroupCfg] = None
    target_render_latent: Optional[LossGroupCfg] = None
    target_render_image: Optional[LossGroupCfg] = None
    target_combined: Optional[LossGroupCfg] = None


# -- individual losses -------------------------------------------------------


def loss_mse(prediction: Prediction, gt: GroundTruth, lpips_fn) -> jnp.ndarray:
    return jnp.mean((prediction.image - gt.image) ** 2)


def loss_l1(prediction: Prediction, gt: GroundTruth, lpips_fn) -> jnp.ndarray:
    return jnp.mean(jnp.abs(prediction.image - gt.image))


def loss_kl(prediction: Prediction, gt: GroundTruth, lpips_fn) -> jnp.ndarray:
    return jnp.mean(prediction.posterior.kl())


def loss_lpips(prediction: Prediction, gt: GroundTruth, lpips_fn) -> jnp.ndarray:
    assert lpips_fn is not None, "lpips loss requires an LPIPS apply function"
    pred = prediction.image.reshape(-1, *prediction.image.shape[-3:])
    target = gt.image.reshape(-1, *gt.image.shape[-3:])
    return jnp.mean(lpips_fn(pred, target))


def loss_depth_smoothness(
    prediction: Prediction, gt: GroundTruth, lpips_fn,
    sigma_image: Optional[float] = None, use_second_derivative: bool = False,
) -> jnp.ndarray:
    """Edge-aware depth smoothness (ref: loss_depth.py:20-52); NHWC images."""
    near = jnp.log(gt.near)[..., None, None]
    far = jnp.log(gt.far)[..., None, None]
    depth = jnp.clip(jnp.log(jnp.maximum(prediction.depth, 1e-10)), near, far)
    depth = (depth - near) / (far - near)

    depth_dx = jnp.diff(depth, axis=-1)
    depth_dy = jnp.diff(depth, axis=-2)
    if use_second_derivative:
        depth_dx = jnp.diff(depth_dx, axis=-1)
        depth_dy = jnp.diff(depth_dy, axis=-2)

    if sigma_image is not None:
        color = gt.image  # (b, v, h, w, c)
        color_dx = jnp.max(jnp.diff(color, axis=-2), axis=-1)
        color_dy = jnp.max(jnp.diff(color, axis=-3), axis=-1)
        if use_second_derivative:
            color_dx = jnp.maximum(color_dx[..., :, 1:], color_dx[..., :, :-1])
            color_dy = jnp.maximum(color_dy[..., 1:, :], color_dy[..., :-1, :])
        depth_dx = depth_dx * jnp.exp(-color_dx * sigma_image)
        depth_dy = depth_dy * jnp.exp(-color_dy * sigma_image)

    return jnp.mean(jnp.abs(depth_dx)) + jnp.mean(jnp.abs(depth_dy))


def loss_sh_l2(prediction: Prediction, gt: GroundTruth, lpips_fn) -> jnp.ndarray:
    """Mean squared color-SH coefficient (gaussian site). Overlapping
    Gaussians can cancel — the composited image is invariant to opposite-
    sign coefficient growth, so nothing in the reference objective bounds
    |SH|; this pins the null space (no reference equivalent; added for the
    exact-mode collapse, NOTES.md round-5 ledger)."""
    assert prediction.harmonics is not None
    return jnp.mean(prediction.harmonics**2)


def loss_generator(prediction: Prediction) -> jnp.ndarray:
    return -jnp.mean(prediction.logits_fake)


def hinge_d_loss(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.relu(1.0 + logits))


def vanilla_d_loss(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.softplus(logits))


_NLL_LOSSES: Dict[str, Callable] = {
    "mse": loss_mse,
    "l1": loss_l1,
    "kl": loss_kl,
    "lpips": loss_lpips,
    "depth": loss_depth_smoothness,
    "sh_l2": loss_sh_l2,
}


def _gate(step, apply_after_step: int) -> jnp.ndarray:
    return (jnp.asarray(step) >= apply_after_step).astype(jnp.float32)


class LossGroup:
    """One supervision site's losses (nll + optional generator/discriminator)."""

    def __init__(self, name: str, cfg: Optional[LossGroupCfg]):
        self.name = name
        self.cfg = cfg or LossGroupCfg()

    # -- static activity (host side; decides which graph branches exist) ----
    def is_active(self, step: int) -> bool:
        active = any(l.apply_after_step <= step for l in (self.cfg.nll or []))
        return active or self.is_generator_active(step) or self.is_discriminator_active(step)

    @property
    def has_generator_loss(self) -> bool:
        return self.cfg.generator is not None

    @property
    def has_discriminator_loss(self) -> bool:
        return self.cfg.discriminator is not None

    def is_generator_active(self, step: int) -> bool:
        return (
            self.cfg.generator is not None
            and self.cfg.generator.apply_after_step <= step
        )

    def is_discriminator_active(self, step: int) -> bool:
        return (
            self.cfg.discriminator is not None
            and self.cfg.discriminator.apply_after_step <= step
        )

    # -- traced loss evaluation ---------------------------------------------
    def nll_total(
        self,
        prediction: Prediction,
        gt: Optional[GroundTruth],
        step,
        lpips_fn=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Sum of weighted, step-gated nll losses + unweighted log dict."""
        total = jnp.asarray(0.0)
        logs: Dict[str, jnp.ndarray] = {}
        for loss_cfg in self.cfg.nll or []:
            fn = _NLL_LOSSES[loss_cfg.name]
            value = fn(prediction, gt, lpips_fn)
            gate = _gate(step, loss_cfg.apply_after_step)
            logs[f"{self.name}/{loss_cfg.name}"] = value * gate
            total = total + loss_cfg.weight * gate * value
        return total, logs

    def generator_total(
        self, prediction: Prediction, step
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Weighted, gated generator loss (adaptive weight applied by caller)."""
        assert self.has_generator_loss
        value = loss_generator(prediction)
        gate = _gate(step, self.cfg.generator.apply_after_step)
        return self.cfg.generator.weight * gate * value, {
            f"{self.name}/generator": value * gate
        }

    def discriminator_total(
        self, prediction: Prediction, step
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Hinge/vanilla fake+real halves (ref: loss_discriminator.py:44-65)."""
        assert self.has_discriminator_loss
        cfg = self.cfg.discriminator
        fn = hinge_d_loss if cfg.loss == "hinge" else vanilla_d_loss
        loss_fake = fn(prediction.logits_fake)
        loss_real = fn(-prediction.logits_real)
        gate = _gate(step, cfg.apply_after_step)
        total = cfg.weight / 2.0 * gate * (loss_fake + loss_real)
        return total, {
            f"{self.name}/discriminator/fake": loss_fake * gate,
            f"{self.name}/discriminator/real": loss_real * gate,
        }


def get_loss_group(name: str, cfg: Optional[LossGroupCfg]) -> LossGroup:
    return LossGroup(name, cfg)


def adaptive_gan_weight(
    nll_grad_leaf: jnp.ndarray, g_grad_leaf: jnp.ndarray
) -> jnp.ndarray:
    """|grad nll| / |grad g| wrt the shared last layer, clamped to [0, 1]
    (ref: loss_group.py:33-44)."""
    weight = jnp.linalg.norm(nll_grad_leaf) / (jnp.linalg.norm(g_grad_leaf) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(weight, 0.0, 1.0))
