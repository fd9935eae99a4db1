"""Quick-tier coverage of training/step.py: abstract (eval_shape) wiring
checks of the FULL fused VAE-GAN train step — no jit compile, no FLOPs, so
they run in seconds where the real-step tests in test_train_step.py take
minutes of CPU compile each.

jax.eval_shape traces the entire step (encoder -> splat -> VAE decode ->
losses incl. adaptive-GAN probes -> both optimizer updates -> spike guard)
with abstract values, catching shape/dtype/pytree wiring bugs across the
whole graph.
"""

import jax
import jax.numpy as jnp

from latentsplat_tpu.config import (
    DiscriminatorOptimizerCfg,
    ModelCfg,
    OptimizerCfg,
)
from latentsplat_tpu.loss.losses import (
    LossCfg,
    LossDiscriminatorCfg,
    LossGroupCfg,
)
from latentsplat_tpu.model.autoencoder.kl import AutoencoderKLCfg
from latentsplat_tpu.model.decoder.splatting import DecoderSplattingCfg
from latentsplat_tpu.model.discriminator.patch_gan import DiscriminatorPatchGanCfg
from latentsplat_tpu.model.latentsplat import LatentSplat
from latentsplat_tpu.training.step import (
    TrainState,
    build_optimizers,
    make_step_flags,
    make_train_step,
)

from tests.test_encoder import tiny_cfg
from tests.test_train_step import make_batch, make_losses


def _full_cfgs():
    model_cfg = ModelCfg(
        autoencoder=AutoencoderKLCfg(
            block_out_channels=[8, 16],
            layers_per_block=1,
            latent_channels=2,
            skip_connections=True,
            skip_extra=True,
            skip_zero=True,
            pretrained=False,
        ),
        encoder=tiny_cfg(),
        decoder=DecoderSplattingCfg(backend="dense"),
        discriminator=DiscriminatorPatchGanCfg(
            base_dim=8, n_layers=2, pretrained=False
        ),
        encode_latents=False,
        supersampling_factor=2,
        variational="gaussians",
    )
    loss_cfgs = {
        "gaussian": LossGroupCfg(
            nll=[
                LossCfg(name="kl", weight=1e-4),
                LossCfg(name="sh_l2", weight=0.01),
            ]
        ),
        "target_render_image": LossGroupCfg(
            nll=[LossCfg(name="mse", weight=10.0)]
        ),
        "target_combined": LossGroupCfg(
            nll=[LossCfg(name="l1")],
            generator=LossCfg(name="generator", weight=0.5),
            discriminator=LossDiscriminatorCfg(loss="hinge"),
        ),
    }
    return model_cfg, loss_cfgs


def test_full_step_wiring_eval_shape():
    """The complete VAE-GAN step (GAN + kl + sh_l2 + spike guard) traces
    abstractly: output state mirrors input state's structure, every log is
    a float scalar."""
    model_cfg, loss_cfgs = _full_cfgs()
    model = LatentSplat(cfg=model_cfg, background_color=(0.0, 0.0, 0.0))
    losses = make_losses(loss_cfgs)
    batch = make_batch(jax.random.PRNGKey(0), hw=32)
    opt_gen, opt_disc = build_optimizers(
        model,
        OptimizerCfg(discriminator=DiscriminatorOptimizerCfg()),
        effective_batch_size=1,
    )
    flags = make_step_flags(losses, 0)
    assert flags.disc and flags.gen_gan and flags.gaussian
    step_fn = make_train_step(
        model, losses, opt_gen, opt_disc,
        skip_loss_spike_factor=3.0, skip_loss_spike_patience=5,
    )

    def whole(key, batch, rng):
        params = model.init_params(key, batch)
        state = TrainState(
            params_gen=params["generator"],
            params_disc=params["discriminator"],
            lpips_params=params["lpips"],
            opt_gen=opt_gen.init(params["generator"]),
            opt_disc=opt_disc.init(params["discriminator"]),
            step=jnp.zeros((), jnp.int32),
            gen_loss_ema=jnp.zeros(()),
            spike_skip_count=jnp.zeros((), jnp.int32),
        )
        return step_fn(state, batch, rng, flags)

    state_shape, logs_shape = jax.eval_shape(
        whole, jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1)
    )
    # Logs: all scalars, and the expected keys are present.
    for key, leaf in logs_shape.items():
        assert leaf.shape == (), f"log {key} is not a scalar: {leaf.shape}"
    for expected in (
        "generator/total",
        "discriminator/total",
        "gaussian/kl",
        "gaussian/sh_l2",
        "target_combined/adaptive_weight",
        "grad_norm/generator",
        "optimizer/loss_spike_skipped",
        "optimizer/loss_spike_forced",
        "diag/max_abs_color_sh",
        "diag/max_feature_logvar",
    ):
        assert expected in logs_shape, f"missing log {expected}"
    # State: step advances as an int32 scalar; guard state preserved.
    assert state_shape.step.shape == ()
    assert state_shape.gen_loss_ema.shape == ()
    assert state_shape.spike_skip_count.dtype == jnp.int32


def test_step_flags_activity_boundaries():
    """Host-side loss gating (the reference's get_active_loss_groups,
    model_wrapper.py:276-284): a late-scheduled GAN pair toggles both
    generator and discriminator flags at its boundary."""
    _, loss_cfgs = _full_cfgs()
    loss_cfgs["target_combined"] = LossGroupCfg(
        nll=[LossCfg(name="l1")],
        generator=LossCfg(name="generator", apply_after_step=100),
        discriminator=LossDiscriminatorCfg(loss="hinge", apply_after_step=100),
    )
    losses = make_losses(loss_cfgs)
    early = make_step_flags(losses, 0)
    late = make_step_flags(losses, 100)
    assert not early.gen_gan and not early.disc
    assert late.gen_gan == ("target_combined",)
    assert late.disc == ("target_combined",)
