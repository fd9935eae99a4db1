"""torch -> JAX pretrained-weight converters.

The reference initializes from released torch checkpoints: the finetuned LDM
VAE + discriminator (`pretrained/{autoencoder,discriminator}/kl_f8.pt`,
src/constants.py:1-2, autoencoder_kl.py:58-60, discriminator_patch_gan.py:
91-93), the DINO ViT-B/8 backbone (torch.hub, backbone_dino.py:213-287), the
LPIPS VGG16 (lpips pkg, loss_lpips.py:19-36), and full latentSplat Lightning
checkpoints (README.md:47-51). These converters map those state dicts onto
this package's flax parameter trees so released weights reproduce reference
renders. All converters take plain {name: np.ndarray} dicts — load with
`load_torch_state_dict` (torch CPU) or np.load.

Layout conventions:
  torch Conv2d weight (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)
  torch Linear weight (out, in)         -> flax Dense kernel (in, out)
  torch norm weight/bias               -> flax scale/bias
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# Loading + primitive layout conversions
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Load a .pt/.ckpt file into numpy (torch CPU required)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in, kh, kw) -> (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w)


def _conv(sd, name):
    return {"kernel": conv_kernel(sd[f"{name}.weight"]),
            "bias": sd[f"{name}.bias"]}


def _conv_nobias(sd, name):
    return {"kernel": conv_kernel(sd[f"{name}.weight"])}


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _dense_or_1x1(sd, name):
    """A torch layer that is either Linear or a 1x1 Conv2d -> flax Dense."""
    w = sd[f"{name}.weight"]
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    out = {"kernel": dense_kernel(w)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL layout -> model.autoencoder.kl)
# ---------------------------------------------------------------------------


def _resnet(sd, prefix) -> dict:
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    elif f"{prefix}.nin_shortcut.weight" in sd:  # LDM naming
        out["conv_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return out


def _attn(sd, prefix) -> dict:
    """Diffusers mid-block attention (new Linear or legacy 1x1-conv names)."""
    names = (
        ("group_norm", "to_q", "to_k", "to_v", "to_out.0")
        if f"{prefix}.to_q.weight" in sd
        else ("group_norm", "query", "key", "value", "proj_attn")
    )
    gn, q, k, v, o = names
    return {
        "group_norm": _norm(sd, f"{prefix}.{gn}"),
        "to_q": _dense_or_1x1(sd, f"{prefix}.{q}"),
        "to_k": _dense_or_1x1(sd, f"{prefix}.{k}"),
        "to_v": _dense_or_1x1(sd, f"{prefix}.{v}"),
        "to_out": _dense_or_1x1(sd, f"{prefix}.{o}"),
    }


def convert_autoencoder_kl(
    sd: Dict[str, np.ndarray],
    num_blocks: int = 4,
    layers_per_block: int = 2,
) -> dict:
    """diffusers AutoencoderKL state dict -> flax params for AutoencoderKL.

    Skip convolutions (latentSplat's addition) are NOT in LDM checkpoints;
    the caller keeps their zero init (autoencoder_kl.py:61-74).
    """
    p = lambda key: sd[key]  # noqa: E731 (assert-style access)
    encoder = {"conv_in": _conv(sd, "encoder.conv_in")}
    for i in range(num_blocks):
        for j in range(layers_per_block):
            encoder[f"down_{i}_resnet_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}"
            )
        if i < num_blocks - 1:
            encoder[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    encoder["mid_resnet_0"] = _resnet(sd, "encoder.mid_block.resnets.0")
    encoder["mid_attn"] = _attn(sd, "encoder.mid_block.attentions.0")
    encoder["mid_resnet_1"] = _resnet(sd, "encoder.mid_block.resnets.1")
    encoder["conv_norm_out"] = _norm(sd, "encoder.conv_norm_out")
    encoder["conv_out"] = _conv(sd, "encoder.conv_out")

    decoder = {"conv_in": _conv(sd, "decoder.conv_in")}
    decoder["mid_resnet_0"] = _resnet(sd, "decoder.mid_block.resnets.0")
    decoder["mid_attn"] = _attn(sd, "decoder.mid_block.attentions.0")
    decoder["mid_resnet_1"] = _resnet(sd, "decoder.mid_block.resnets.1")
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            decoder[f"up_{i}_resnet_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}"
            )
        if i < num_blocks - 1:
            decoder[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    decoder["conv_norm_out"] = _norm(sd, "decoder.conv_norm_out")
    decoder["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# PatchGAN discriminator (taming-transformers NLayerDiscriminator)
# ---------------------------------------------------------------------------


def convert_discriminator_patch_gan(sd: Dict[str, np.ndarray]) -> dict:
    """`main.{idx}.*` sequential layout -> {conv_i, bn_i, conv_out}.

    The torch module is Conv, LeakyReLU, then n_layers x (Conv, BatchNorm,
    LeakyReLU), then a final 1-channel Conv
    (ref discriminator_patch_gan.py:28-115).
    """
    prefix = "main."
    conv_ids = sorted(
        {
            int(k[len(prefix):].split(".")[0])
            for k in sd
            if k.startswith(prefix) and k.endswith(".weight")
            and sd[k].ndim == 4
        }
    )
    bn_ids = sorted(
        {
            int(k[len(prefix):].split(".")[0])
            for k in sd
            if k.startswith(prefix) and k.endswith(".running_mean")
        }
    )
    params = {}
    for n, idx in enumerate(conv_ids):
        name = "conv_out" if n == len(conv_ids) - 1 else f"conv_{n}"
        entry = {"kernel": conv_kernel(sd[f"{prefix}{idx}.weight"])}
        if f"{prefix}{idx}.bias" in sd:
            entry["bias"] = sd[f"{prefix}{idx}.bias"]
        params[name] = entry
    for n, idx in enumerate(bn_ids):
        params[f"bn_{n + 1}"] = {
            "scale": sd[f"{prefix}{idx}.weight"],
            "bias": sd[f"{prefix}{idx}.bias"],
        }
    return params


# ---------------------------------------------------------------------------
# LPIPS (lpips pkg, VGG16 variant)
# ---------------------------------------------------------------------------

# torchvision vgg16.features indices of the 13 convolutions.
_VGG16_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_lpips_vgg(sd: Dict[str, np.ndarray]) -> dict:
    """lpips-package state dict -> flax params for loss.lpips.LPIPS."""
    def find(fmt_options):
        for fmt in fmt_options:
            if fmt in sd:
                return sd[fmt]
        raise KeyError(fmt_options)

    vgg = {}
    for n, idx in enumerate(_VGG16_CONV_IDS):
        w = find([f"net.slices.{idx}.weight", f"net.features.{idx}.weight",
                  f"features.{idx}.weight"])
        b = find([f"net.slices.{idx}.bias", f"net.features.{idx}.bias",
                  f"features.{idx}.bias"])
        vgg[f"conv_{n}"] = {"kernel": conv_kernel(w), "bias": b}

    params = {"vgg": vgg}
    for i in range(5):
        w = find([f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight"])
        params[f"lin_{i}"] = {"kernel": conv_kernel(w)}
    return params


# ---------------------------------------------------------------------------
# DINO ViT (facebookresearch/dino)
# ---------------------------------------------------------------------------


def convert_dino_vit(sd: Dict[str, np.ndarray], num_heads: int) -> dict:
    """DINO ViT state dict -> flax params for BackboneDino's DinoViT trunk."""
    dim = sd["cls_token"].shape[-1]
    head_dim = dim // num_heads

    trunk = {
        "cls_token": sd["cls_token"].reshape(1, 1, dim),
        "pos_embed": sd["pos_embed"].reshape(1, -1, dim),
        "patch_embed": _conv(sd, "patch_embed.proj"),
    }
    depth = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    for i in range(depth):
        p = f"blocks.{i}"
        qkv_w = sd[f"{p}.attn.qkv.weight"]          # (3*dim, dim)
        qkv_b = sd.get(f"{p}.attn.qkv.bias")
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=0)  # each (dim, dim)

        def head_kernel(w):
            # (out=dim, in=dim) -> (in=dim, heads, head_dim)
            return dense_kernel(w).reshape(dim, num_heads, head_dim)

        def head_bias(b, part):
            if b is None:
                return np.zeros((num_heads, head_dim), np.float32)
            return np.split(b, 3)[part].reshape(num_heads, head_dim)

        proj_w = sd[f"{p}.attn.proj.weight"]        # (dim, dim)
        attn = {
            "query": {"kernel": head_kernel(q_w), "bias": head_bias(qkv_b, 0)},
            "key": {"kernel": head_kernel(k_w), "bias": head_bias(qkv_b, 1)},
            "value": {"kernel": head_kernel(v_w), "bias": head_bias(qkv_b, 2)},
            "out": {
                # (out=dim, in=dim) -> (heads, head_dim, dim)
                "kernel": dense_kernel(proj_w).reshape(num_heads, head_dim, dim),
                "bias": sd[f"{p}.attn.proj.bias"],
            },
        }
        trunk[f"block_{i}"] = {
            "LayerNorm_0": _norm(sd, f"{p}.norm1"),
            "MultiHeadDotProductAttention_0": attn,
            "LayerNorm_1": _norm(sd, f"{p}.norm2"),
            "Dense_0": {
                "kernel": dense_kernel(sd[f"{p}.mlp.fc1.weight"]),
                "bias": sd[f"{p}.mlp.fc1.bias"],
            },
            "Dense_1": {
                "kernel": dense_kernel(sd[f"{p}.mlp.fc2.weight"]),
                "bias": sd[f"{p}.mlp.fc2.bias"],
            },
        }
    trunk["LayerNorm_0"] = _norm(sd, "norm")
    return trunk


# ---------------------------------------------------------------------------
# Merging converted weights into a params tree
# ---------------------------------------------------------------------------


def merge_params(target: dict, source: dict, path: str = "") -> dict:
    """Recursively overlay `source` onto `target`, checking shapes."""
    out = dict(target)
    for k, v in source.items():
        if k not in target:
            raise KeyError(f"converted key {path}/{k} not in target params")
        if isinstance(v, dict):
            out[k] = merge_params(target[k], v, f"{path}/{k}")
        else:
            expected = np.asarray(target[k]).shape
            got = np.asarray(v).shape
            if expected != got:
                raise ValueError(
                    f"shape mismatch at {path}/{k}: target {expected}, got {got}"
                )
            out[k] = np.asarray(v, np.float32)
    return out


def load_pretrained_autoencoder(params_gen: dict, path: Path, **kw) -> dict:
    sd = load_torch_state_dict(path)
    converted = convert_autoencoder_kl(sd, **kw)
    return {
        **params_gen,
        "autoencoder": merge_params(params_gen["autoencoder"], converted),
    }


def load_pretrained_discriminator(params_disc: dict, path: Path) -> dict:
    sd = load_torch_state_dict(path)
    return merge_params(params_disc, convert_discriminator_patch_gan(sd))


def load_pretrained_lpips(lpips_params: dict, path: Path) -> dict:
    sd = load_torch_state_dict(path)
    return merge_params(lpips_params, convert_lpips_vgg(sd))


def load_pretrained_dino(
    params_gen: dict, path: Path, num_heads: int = 12
) -> dict:
    sd = load_torch_state_dict(path)
    trunk = convert_dino_vit(sd, num_heads)
    encoder = dict(params_gen["encoder"])
    backbone = dict(encoder["backbone"])
    backbone["dino"] = merge_params(backbone["dino"], trunk)
    encoder["backbone"] = backbone
    return {**params_gen, "encoder": encoder}


# ---------------------------------------------------------------------------
# Full latentSplat checkpoint (Lightning .ckpt from the official release)
# ---------------------------------------------------------------------------


def _srt_transformer(sd, prefix: str, num_layers: int, ff: str) -> dict:
    """Reference SRT Transformer (src/model/transformer/transformer.py:32-71):
    layers.{i}.0 = PreNorm(Attention), layers.{i}.1 = PreNorm(feed-forward).
    `ff` selects the feed-forward conversion: "mlp" (feed_forward.py net
    Sequential) or "conv" (the epipolar ConvFeedForward)."""
    out = {}
    for i in range(num_layers):
        attn = f"{prefix}.layers.{i}.0"
        out[f"norm_attn_{i}"] = _norm(sd, f"{attn}.norm")
        a = {}
        if f"{attn}.fn.to_qkv.weight" in sd:
            a["to_qkv"] = {"kernel": dense_kernel(sd[f"{attn}.fn.to_qkv.weight"])}
        else:
            a["to_q"] = {"kernel": dense_kernel(sd[f"{attn}.fn.to_q.weight"])}
            a["to_kv"] = {"kernel": dense_kernel(sd[f"{attn}.fn.to_kv.weight"])}
        if f"{attn}.fn.to_out.0.weight" in sd:
            a["to_out"] = {
                "kernel": dense_kernel(sd[f"{attn}.fn.to_out.0.weight"]),
                "bias": sd[f"{attn}.fn.to_out.0.bias"],
            }
        out[f"attn_{i}"] = a

        ffp = f"{prefix}.layers.{i}.1"
        out[f"norm_ff_{i}"] = _norm(sd, f"{ffp}.norm")
        if ff == "mlp":
            # feed_forward.py: net = Sequential(Linear, GELU, [Dropout], Linear)
            ids = sorted(
                int(k[len(ffp) + 8:].split(".")[0])
                for k in sd
                if k.startswith(f"{ffp}.fn.net.") and k.endswith(".weight")
            )
            out[f"ff_{i}"] = {
                "Dense_0": {
                    "kernel": dense_kernel(sd[f"{ffp}.fn.net.{ids[0]}.weight"]),
                    "bias": sd[f"{ffp}.fn.net.{ids[0]}.bias"],
                },
                "Dense_1": {
                    "kernel": dense_kernel(sd[f"{ffp}.fn.net.{ids[1]}.weight"]),
                    "bias": sd[f"{ffp}.fn.net.{ids[1]}.bias"],
                },
            }
        else:
            out[f"ConvFeedForward_{i}"] = _conv_feed_forward(sd, f"{ffp}.fn")
    return out


def _image_self_attention(sd, prefix: str) -> dict:
    num_layers = len(
        {
            k[len(prefix) + 20 :].split(".")[0]
            for k in sd
            if k.startswith(f"{prefix}.transformer.layers.")
        }
    )
    return {
        "pe_proj": {
            "kernel": dense_kernel(sd[f"{prefix}.positional_encoding.1.weight"]),
            "bias": sd[f"{prefix}.positional_encoding.1.bias"],
        },
        "patch_embed": _conv(sd, f"{prefix}.patch_embedder.0"),
        "transformer": _srt_transformer(
            sd, f"{prefix}.transformer", num_layers, ff="mlp"
        ),
        "resampler": _conv_transpose(sd, f"{prefix}.resampler"),
    }


def _conv_feed_forward(sd, prefix: str) -> dict:
    """ConvFeedForward (epipolar_transformer.py:155-183): layers =
    Sequential(Conv7x7, GELU, Dropout, Conv7x7, Dropout) + self_attention.
    The Dropouts put the second conv at sequential index 3 (caught by the
    full-encoder oracle test; index 2 would KeyError on real checkpoints)."""
    return {
        "self_attention": _image_self_attention(sd, f"{prefix}.self_attention"),
        "Conv_0": _conv(sd, f"{prefix}.layers.0"),
        "Conv_1": _conv(sd, f"{prefix}.layers.3"),
    }


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out).

    For the stride == kernel (non-overlapping) transposed convs used here,
    flax's gradient-based transpose matches torch with a spatial flip.
    """
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def _conv_transpose(sd, name):
    return {
        "kernel": conv_transpose_kernel(sd[f"{name}.weight"]),
        "bias": sd[f"{name}.bias"],
    }


def convert_latentsplat_encoder(
    sd: Dict[str, np.ndarray], num_heads: int = 12
) -> dict:
    """Reference EncoderEpipolar state dict (keys under `encoder.`) -> flax
    params for model.encoder.encoder_epipolar.EncoderEpipolar."""
    e = {}
    # Backbone: DINO trunk + global/local token MLPs (backbone_dino.py:33-43).
    dino_sd = {
        k[len("backbone.dino."):]: v
        for k, v in sd.items()
        if k.startswith("backbone.dino.")
    }
    backbone = {"dino": convert_dino_vit(dino_sd, num_heads)}
    for flax_name, torch_name in (
        ("Dense_0", "backbone.global_token_mlp.0"),
        ("Dense_1", "backbone.global_token_mlp.2"),
        ("Dense_2", "backbone.local_token_mlp.0"),
        ("Dense_3", "backbone.local_token_mlp.2"),
    ):
        backbone[flax_name] = _dense_or_1x1(sd, torch_name)
    e["backbone"] = backbone

    e["backbone_projection"] = _dense_or_1x1(sd, "backbone_projection.1")

    et = {}
    if "epipolar_transformer.downscaler.weight" in sd:
        et["downscaler"] = _conv(sd, "epipolar_transformer.downscaler")
        et["upscaler"] = _conv_transpose(sd, "epipolar_transformer.upscaler")
        et["refine_0"] = _conv(sd, "epipolar_transformer.upscale_refinement.0")
        et["refine_1"] = _conv(sd, "epipolar_transformer.upscale_refinement.2")
    if "epipolar_transformer.depth_encoding.1.weight" in sd:
        et["depth_encoding"] = _dense_or_1x1(sd, "epipolar_transformer.depth_encoding.1")
    num_layers = len(
        {
            k.split(".")[3]
            for k in sd
            if k.startswith("epipolar_transformer.transformer.layers.")
        }
    )
    et["transformer"] = _srt_transformer(
        sd, "epipolar_transformer.transformer", num_layers, ff="conv"
    )
    e["epipolar_transformer"] = et

    if "high_resolution_skip.0.weight" in sd:
        e["high_resolution_skip"] = _conv(sd, "high_resolution_skip.0")
    e["depth_predictor"] = {
        "projection": _dense_or_1x1(sd, "depth_predictor.projection.1")
    }
    e["to_gaussians"] = _dense_or_1x1(sd, "to_gaussians.1")
    return e


def convert_latentsplat_checkpoint(
    sd: Dict[str, np.ndarray], num_heads: int = 12
) -> dict:
    """Full released latentSplat Lightning checkpoint -> params overlay
    {"generator": {"encoder", "autoencoder"}, "discriminator"}.

    Apply with merge_params onto freshly initialized trees.
    """
    def subdict(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    out: dict = {"generator": {}}
    enc_sd = subdict("encoder.")
    if enc_sd:
        out["generator"]["encoder"] = convert_latentsplat_encoder(enc_sd, num_heads)

    ae_sd = subdict("autoencoder.model.")
    if ae_sd:
        ae = convert_autoencoder_kl(ae_sd)
        # Skip convolutions (autoencoder_kl.py:61-74): skip_convs.{0..3} map
        # onto decoder skip_conv_{i}; the reference's 5th entry is unused.
        for i in range(4):
            if f"autoencoder.skip_convs.{i}.weight" in sd:
                ae["decoder"][f"skip_conv_{i}"] = {
                    "kernel": conv_kernel(sd[f"autoencoder.skip_convs.{i}.weight"]),
                    "bias": sd[f"autoencoder.skip_convs.{i}.bias"],
                }
        out["generator"]["autoencoder"] = ae

    disc_sd = subdict("discriminator.")
    if any(k.startswith("main.") for k in disc_sd):
        out["discriminator"] = convert_discriminator_patch_gan(disc_sd)
    return out


# ---------------------------------------------------------------------------
# DISTS (DISTS_pytorch package)
# ---------------------------------------------------------------------------


def convert_dists(sd: Dict[str, np.ndarray]) -> dict:
    """DISTS_pytorch state dict -> flax params for evaluation.metrics.DISTSNet.

    The torch module holds VGG16 convs under stage1..stage5 sequential
    indices and learned per-channel weights alpha/beta of shape
    (1, sum_channels, 1, 1).
    """
    # Stage -> (sequential conv indices within the stage).
    stage_convs = {
        1: (0, 2),
        2: (1, 3),      # stage2: L2pool at 0
        3: (1, 3, 5),
        4: (1, 3, 5),
        5: (1, 3, 5),
    }
    params: dict = {}
    conv_n = 0
    for stage in range(1, 6):
        for idx in stage_convs[stage]:
            w = sd[f"stage{stage}.{idx}.weight"]
            b = sd[f"stage{stage}.{idx}.bias"]
            params[f"conv_{conv_n}"] = {"kernel": conv_kernel(w), "bias": b}
            conv_n += 1
    params["alpha"] = sd["alpha"].reshape(-1)
    params["beta"] = sd["beta"].reshape(-1)
    return params
