"""LPIPS perceptual distance (VGG16 backbone) in flax.linen (NHWC).

Architecture-faithful reimplementation of the `lpips` package's VGG variant
used by the reference (src/loss/loss_lpips.py:19-36): input scaling layer
(the LPIPS shift/scale constants after [0,1] -> [-1,1] normalization), VGG16
features tapped after each of the 5 conv stages, channel-unit-normalized
activations, squared differences weighted by learned 1x1 "lin" heads,
spatial mean, summed over stages.

Pretrained VGG+lin weights must be converted from the torch package
(`latentsplat_tpu.training.pretrained` has the converter); randomly
initialized weights still yield a valid smooth perceptual-ish metric for
smoke tests but are NOT LPIPS.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# LPIPS scaling layer constants (OpenAI/berkeley lpips v0.1).
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])

# VGG16 conv plan: (num convs, channels) per stage.
_VGG16_STAGES = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class Vgg16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        conv_idx = 0
        for stage, (n_convs, ch) in enumerate(_VGG16_STAGES):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
            if stage < len(_VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance between two [0, 1] NHWC image batches."""

    @nn.compact
    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        def scale(img):
            img = 2.0 * img - 1.0
            return (img - _SHIFT) / _SCALE

        vgg = Vgg16Features(name="vgg")
        feats_pred = vgg(scale(pred))
        feats_target = vgg(scale(target))

        total = 0.0
        for i, (fp, ft) in enumerate(zip(feats_pred, feats_target)):
            diff = (_unit_normalize(fp) - _unit_normalize(ft)) ** 2
            lin = nn.Conv(
                1, (1, 1), use_bias=False,
                kernel_init=nn.initializers.constant(
                    1.0 / _VGG16_STAGES[i][1]
                ),
                name=f"lin_{i}",
            )(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total  # (B,)
