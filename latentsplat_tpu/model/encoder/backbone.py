"""Image backbones (flax.linen, NHWC).

Functional parity with reference src/model/encoder/backbone/:
  * BackboneResNet — ResNet stages with InstanceNorm (the reference swaps
    BatchNorm->InstanceNorm, backbone_resnet.py:157-166), per-stage 1x1
    projections to d_out, align_corners=True bilinear upsample and sum
    (backbone_resnet.py:72-99).
  * BackboneDino — DINO-style ViT (ViT-B/8 by default: 768 dim, 12 layers,
    12 heads) with global-token and local-token MLP heads whose outputs are
    summed after upsampling (backbone_dino.py:33-86). Architecture matches
    facebookresearch/dino so released weights can be converted; pretrained
    loading is gated behind a checkpoint path (no network in this
    environment).
  * BackboneVit — the reference's HF-ViTModel variant (backbone_vit.py:27-103):
    same DINO trunks, 768-wide token-MLP heads, interpolate upscaling default.
  * BackboneEnsemble — sum of component backbones (backbone __init__.py:31-56).

All backbones: (B, H, W, d_in) -> (B, H*sf, W*sf, d_out).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from fractions import Fraction
from typing import List, Literal, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...misc.fraction_utils import get_integer
from ...ops.interp import resize_bicubic_torch, resize_bilinear_align_corners


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclass
class BackboneResnetCfg:
    name: Literal["resnet"] = "resnet"
    model: Literal["resnet18", "resnet34", "resnet50", "dino_resnet50"] = "resnet50"
    num_layers: int = 4
    use_first_pool: bool = False


@dataclass
class BackboneDinoCfg:
    name: Literal["dino"] = "dino"
    model: Literal["dino_vits16", "dino_vits8", "dino_vitb16", "dino_vitb8"] = (
        "dino_vitb8"
    )
    upscale_mode: Literal["interpolate", "repeat"] = "repeat"


@dataclass
class BackboneVitCfg:
    """HF-ViTModel-flavored backbone (reference backbone_vit.py:15-24):
    same DINO-pretrained trunks, but fixed 768-wide token MLP heads and
    `interpolate` upscaling by default."""

    name: Literal["vit"] = "vit"
    model: Literal["dino_vits16", "dino_vits8", "dino_vitb16", "dino_vitb8"] = (
        "dino_vitb8"
    )
    upscale_mode: Literal["interpolate", "repeat"] = "interpolate"


@dataclass
class BackboneEnsembleCfg:
    name: Literal["ensemble"] = "ensemble"
    components: List["SingleBackboneCfg"] = field(default_factory=list)


SingleBackboneCfg = Union[BackboneResnetCfg, BackboneDinoCfg, BackboneVitCfg]
BackboneCfg = Union[SingleBackboneCfg, BackboneEnsembleCfg, List[SingleBackboneCfg]]


_RESNET_SPECS = {
    # (block type, per-stage block counts, stage widths, embedding width)
    "resnet18": ("basic", (2, 2, 2, 2), (64, 128, 256, 512), 64),
    "resnet34": ("basic", (3, 4, 6, 3), (64, 128, 256, 512), 64),
    "resnet50": ("bottleneck", (3, 4, 6, 3), (256, 512, 1024, 2048), 64),
    "dino_resnet50": ("bottleneck", (3, 4, 6, 3), (256, 512, 1024, 2048), 64),
}

_VIT_SPECS = {
    # (patch, dim, depth, heads)
    "dino_vits16": (16, 384, 12, 6),
    "dino_vits8": (8, 384, 12, 6),
    "dino_vitb16": (16, 768, 12, 12),
    "dino_vitb8": (8, 768, 12, 12),
}


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel spatial normalization (affine=False)."""
    mean = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))


class BasicBlock(nn.Module):
    width: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(x)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.width, (3, 3), padding=1, use_bias=False)(y)
        y = _instance_norm(y)
        if residual.shape[-1] != self.width or self.stride != 1:
            residual = nn.Conv(self.width, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = _instance_norm(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    width: int  # output width (4x inner)
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        inner = self.width // 4
        residual = x
        y = nn.Conv(inner, (1, 1), use_bias=False)(x)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(inner, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(y)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.width, (1, 1), use_bias=False)(y)
        y = _instance_norm(y)
        if residual.shape[-1] != self.width or self.stride != 1:
            residual = nn.Conv(self.width, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = _instance_norm(residual)
        return nn.relu(y + residual)


class BackboneResnet(nn.Module):
    cfg: BackboneResnetCfg
    d_in: int
    d_out: int
    scale_factor: Fraction

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        block_kind, depths, widths, embed = _RESNET_SPECS[self.cfg.model]
        block_cls = BasicBlock if block_kind == "basic" else BottleneckBlock
        h, w = x.shape[-3], x.shape[-2]
        out_hw = (get_integer(self.scale_factor * h), get_integer(self.scale_factor * w))

        # Stem (embedder): 7x7/2 conv (+ optional pool, off by default like
        # the reference's use_first_pool=False).
        y = nn.Conv(embed, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        y = nn.relu(_instance_norm(y))
        if self.cfg.use_first_pool:
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        total = resize_bilinear_align_corners(
            nn.Conv(self.d_out, (1, 1), name="proj_stem")(y), out_hw
        )
        for i in range(self.cfg.num_layers):
            stride = 1 if i == 0 else 2
            for b in range(depths[i]):
                y = block_cls(widths[i], stride if b == 0 else 1)(y)
            total = total + resize_bilinear_align_corners(
                nn.Conv(self.d_out, (1, 1), name=f"proj_{i}")(y), out_hw
            )
        return total


class ViTBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = nn.Dense(self.dim * 4)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim)(y)
        return x + y


class DinoViT(nn.Module):
    """DINO ViT trunk returning the full token sequence (cls + patches)."""

    patch_size: int
    dim: int
    depth: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        p = self.patch_size
        tokens = nn.Conv(self.dim, (p, p), strides=(p, p), name="patch_embed")(x)
        nh, nw = tokens.shape[1], tokens.shape[2]
        tokens = tokens.reshape(b, nh * nw, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        cls = jnp.broadcast_to(cls, (b, 1, self.dim))

        # Learned positional embedding defined on a base grid, interpolated
        # to the actual token grid with torch-bicubic (a = -0.75) including
        # DINO's +0.1 scale fudge — numeric parity with DINO's
        # interpolate_pos_encoding (torch.hub vision_transformer.py, used by
        # reference backbone_dino.py:213-287).
        base = 224 // p
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, base * base + 1, self.dim)
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        patch_pos = patch_pos.reshape(1, base, base, self.dim)
        if (nh, nw) != (base, base):
            patch_pos = resize_bicubic_torch(
                patch_pos, (nh, nw),
                scales=((nh + 0.1) / base, (nw + 0.1) / base),
            )
        patch_pos = patch_pos.reshape(1, nh * nw, self.dim)

        tokens = jnp.concatenate([cls + cls_pos, tokens + patch_pos], axis=1)
        for i in range(self.depth):
            tokens = ViTBlock(self.dim, self.heads, name=f"block_{i}")(tokens)
        return nn.LayerNorm(epsilon=1e-6)(tokens)


class BackboneDino(nn.Module):
    cfg: BackboneDinoCfg
    d_in: int
    d_out: int
    scale_factor: Fraction

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.d_in == 3
        patch, dim, depth, heads = _VIT_SPECS[self.cfg.model]
        b, h, w, _ = x.shape
        assert h % patch == 0 and w % patch == 0

        tokens = DinoViT(patch, dim, depth, heads, name="dino")(x)
        global_token = nn.Sequential(
            [nn.Dense(dim), nn.relu, nn.Dense(self.d_out)], name="global_mlp"
        )(tokens[:, 0])
        local_tokens = nn.Sequential(
            [nn.Dense(dim), nn.relu, nn.Dense(self.d_out)], name="local_mlp"
        )(tokens[:, 1:])

        nh, nw = h // patch, w // patch
        local = local_tokens.reshape(b, nh, nw, self.d_out)
        out_hw = (get_integer(self.scale_factor * h), get_integer(self.scale_factor * w))
        if self.cfg.upscale_mode == "interpolate":
            local = resize_bilinear_align_corners(local, out_hw)
        elif self.cfg.upscale_mode == "repeat":
            reps = get_integer(self.scale_factor * patch)
            local = jnp.repeat(jnp.repeat(local, reps, axis=1), reps, axis=2)
        else:
            raise ValueError(f"unknown upscale_mode {self.cfg.upscale_mode}")
        return local + global_token[:, None, None, :]


class BackboneVit(nn.Module):
    """Parity with reference BackboneViT (backbone_vit.py:27-103): the same
    ViT trunk as the DINO backbone (the reference wraps HF ViTModel loaded
    from the facebook/dino-* weights), but with 768-wide hidden layers in
    the global/local token MLPs (hardcoded in the reference regardless of
    model width) and `interpolate` upscaling by default."""

    cfg: BackboneVitCfg
    d_in: int
    d_out: int
    scale_factor: Fraction

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.d_in == 3
        patch, dim, depth, heads = _VIT_SPECS[self.cfg.model]
        b, h, w, _ = x.shape
        assert h % patch == 0 and w % patch == 0

        tokens = DinoViT(patch, dim, depth, heads, name="vit")(x)
        global_token = nn.Sequential(
            [nn.Dense(768), nn.relu, nn.Dense(self.d_out)], name="global_mlp"
        )(tokens[:, 0])
        local_tokens = nn.Sequential(
            [nn.Dense(768), nn.relu, nn.Dense(self.d_out)], name="local_mlp"
        )(tokens[:, 1:])

        nh, nw = h // patch, w // patch
        local = local_tokens.reshape(b, nh, nw, self.d_out)
        out_hw = (get_integer(self.scale_factor * h), get_integer(self.scale_factor * w))
        if self.cfg.upscale_mode == "interpolate":
            local = resize_bilinear_align_corners(local, out_hw)
        elif self.cfg.upscale_mode == "repeat":
            reps = get_integer(self.scale_factor * patch)
            local = jnp.repeat(jnp.repeat(local, reps, axis=1), reps, axis=2)
        else:
            raise ValueError(f"unknown upscale_mode {self.cfg.upscale_mode}")
        return local + global_token[:, None, None, :]


class BackboneEnsemble(nn.Module):
    cfg: BackboneEnsembleCfg
    d_in: int
    d_out: int
    scale_factor: Fraction

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        total = None
        for i, sub in enumerate(self.cfg.components):
            module = _BACKBONES[sub.name](
                sub, self.d_in, self.d_out, self.scale_factor, name=f"component_{i}"
            )
            y = module(x)
            total = y if total is None else total + y
        return total


_BACKBONES = {
    "resnet": BackboneResnet,
    "dino": BackboneDino,
    "vit": BackboneVit,
    "ensemble": BackboneEnsemble,
}


def get_backbone(
    cfg: BackboneCfg, d_in: int, d_out: int, scale_factor: Fraction, name: str = "backbone"
) -> nn.Module:
    if isinstance(cfg, list):
        cfg = BackboneEnsembleCfg(components=cfg)
    return _BACKBONES[cfg.name](cfg, d_in, d_out, scale_factor, name=name)
