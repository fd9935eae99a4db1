"""Encoder stack smoke + behavior tests."""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsplat_tpu.model.encoder import EncoderEpipolar, EncoderEpipolarCfg, OpacityMappingCfg
from latentsplat_tpu.model.encoder.backbone import BackboneResnetCfg
from latentsplat_tpu.model.encoder.epipolar_transformer import EpipolarTransformerCfg
from latentsplat_tpu.model.encoder.gaussian_adapter import GaussianAdapterCfg
from latentsplat_tpu.model.encoder.image_self_attention import ImageSelfAttentionCfg
from latentsplat_tpu.model.types import VariationalGaussians
from latentsplat_tpu.ops.distributions import DiagonalGaussian


def tiny_cfg(**overrides):
    cfg = EncoderEpipolarCfg(
        name="epipolar",
        d_backbone=32,
        d_feature=16,
        num_monocular_samples=8,
        num_surfaces=1,
        predict_opacity=False,
        backbone=BackboneResnetCfg(model="resnet18", num_layers=2),
        near_disparity=3.0,
        gaussian_adapter=GaussianAdapterCfg(
            gaussian_scale_min=0.5,
            gaussian_scale_max=15.0,
            color_sh_degree=1,
            feature_sh_degree=1,
        ),
        apply_bounds_shim=False,
        epipolar_transformer=EpipolarTransformerCfg(
            self_attention=ImageSelfAttentionCfg(
                patch_size=2, num_octaves=2, num_layers=1,
                num_heads=2, d_token=16, d_dot=8, d_mlp=16,
            ),
            num_octaves=2,
            num_layers=1,
            num_heads=2,
            num_samples=4,
            d_dot=8,
            d_mlp=16,
            downscale=2,
        ),
        opacity_mapping=OpacityMappingCfg(initial=0.0, final=0.0, warm_up=1),
        gaussians_per_pixel=2,
        use_epipolar_transformer=True,
        use_transmittance=False,
    )
    for k, v in overrides.items():
        object.__setattr__(cfg, k, v) if hasattr(cfg, "__frozen__") else setattr(cfg, k, v)
    return cfg


def make_context(key, b=1, v=2, hw=16):
    ks = jax.random.split(key, 2)
    ext = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, None], (b, v, 1, 1))
    # Second camera shifted along +x.
    ext = ext.at[:, 1, 0, 3].set(1.0)
    intr = jnp.tile(
        jnp.asarray([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])[None, None],
        (b, v, 1, 1),
    )
    return {
        "image": jax.random.uniform(ks[0], (b, v, hw, hw, 3)),
        "extrinsics": ext,
        "intrinsics": intr,
        "near": jnp.full((b, v), 0.5),
        "far": jnp.full((b, v), 100.0),
    }


@pytest.fixture(scope="module")
def encoder_and_params():
    cfg = tiny_cfg()
    enc = EncoderEpipolar(
        cfg=cfg, d_in=3, n_feature_channels=3,
        scale_factor=Fraction(1, 1), variational=True,
    )
    ctx = make_context(jax.random.PRNGKey(0))
    params = enc.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        ctx, 0,
    )
    return enc, params, ctx


@pytest.mark.slow
def test_encoder_shapes(encoder_and_params):
    enc, params, ctx = encoder_and_params
    out = enc.apply(params, ctx, 0, rngs={"sample": jax.random.PRNGKey(3)})
    assert isinstance(out, VariationalGaussians)
    b, v, hw = 1, 2, 16
    g = v * hw * hw * 1 * 2  # views * rays * surfaces * gaussians_per_pixel
    assert out.means.shape == (b, g, 3)
    assert out.covariances.shape == (b, g, 3, 3)
    assert out.opacities.shape == (b, g)
    assert out.color_harmonics.shape == (b, g, 3, 4)
    assert isinstance(out.feature_harmonics, DiagonalGaussian)
    assert out.feature_harmonics.mean.shape == (b, g, 3, 4)
    assert out.feature_harmonics.logvar is not None

    ops = np.asarray(out.opacities)
    assert (ops >= 0).all() and (ops <= 1).all()
    covs = np.asarray(out.covariances)
    np.testing.assert_allclose(covs, covs.transpose(0, 1, 3, 2), atol=1e-6)


def test_encoder_deterministic_mode(encoder_and_params):
    enc, params, ctx = encoder_and_params
    out1 = enc.apply(params, ctx, 0, deterministic=True)
    out2 = enc.apply(params, ctx, 0, deterministic=True)
    b, v, hw = 1, 2, 16
    g = v * hw * hw  # gaussians_per_pixel == 1 when deterministic
    assert out1.means.shape == (b, g, 3)
    np.testing.assert_allclose(
        np.asarray(out1.means), np.asarray(out2.means), atol=0
    )


def test_encoder_stochastic_depends_on_rng(encoder_and_params):
    enc, params, ctx = encoder_and_params
    o1 = enc.apply(params, ctx, 0, rngs={"sample": jax.random.PRNGKey(4)})
    o2 = enc.apply(params, ctx, 0, rngs={"sample": jax.random.PRNGKey(5)})
    assert np.abs(np.asarray(o1.means) - np.asarray(o2.means)).max() > 1e-6


def test_opacity_mapping_identity_at_zero_exponent():
    cfg = tiny_cfg()
    enc = EncoderEpipolar(
        cfg=cfg, d_in=3, n_feature_channels=3,
        scale_factor=Fraction(1, 1), variational=True,
    )
    pdf = jnp.asarray([0.0, 0.3, 1.0])
    out = enc.map_pdf_to_opacity(pdf, 0)
    # initial = final = 0 -> exponent 1 -> identity mapping.
    np.testing.assert_allclose(np.asarray(out), np.asarray(pdf), atol=1e-6)


@pytest.mark.slow
def test_backbone_vit_shapes():
    """The `vit` backbone (reference backbone_vit.py) produces the same
    output surface as the dino one: (B, H*sf, W*sf, d_out)."""
    from latentsplat_tpu.model.encoder.backbone import (
        BackboneVitCfg, get_backbone,
    )

    cfg = BackboneVitCfg(model="dino_vits16", upscale_mode="interpolate")
    bb = get_backbone(cfg, 3, 8, Fraction(1, 2))
    x = jnp.zeros((1, 32, 32, 3))
    params = bb.init(jax.random.PRNGKey(0), x)
    y = bb.apply(params, x)
    assert y.shape == (1, 16, 16, 8)
    # 768-wide MLP hidden layers regardless of the 384-dim vits trunk
    # (hardcoded in the reference).
    k = params["params"]["Dense_0"]["kernel"]
    assert k.shape == (384, 768)
