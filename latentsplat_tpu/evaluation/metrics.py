"""Image quality metrics: PSNR, SSIM, LPIPS, DISTS (all jittable, NHWC).

Parity with reference src/evaluation/metrics.py:12-69:
  * PSNR: clip to [0,1], -10 log10(mse) per image.
  * SSIM: matches skimage.metrics.structural_similarity with win_size=11,
    gaussian_weights=True (sigma 1.5), data_range=1.0, sample covariance,
    computed per channel and averaged — but as one vectorized XLA program
    instead of a per-image scipy loop.
  * LPIPS: the flax VGG16 LPIPS in latentsplat_tpu.loss.lpips.
  * DISTS: VGG16 trunk with L2 ("energy-preserving") pooling; per-stage
    per-channel texture/structure similarity weighted by learned alpha/beta
    (architecture of the DISTS_pytorch package; weights convertible).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# PSNR
# ---------------------------------------------------------------------------


def compute_psnr(ground_truth: jnp.ndarray, predicted: jnp.ndarray) -> jnp.ndarray:
    """(..., h, w, c) -> (...,) PSNR in dB over [0, 1] images."""
    ground_truth = jnp.clip(ground_truth, 0.0, 1.0)
    predicted = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((ground_truth - predicted) ** 2, axis=(-3, -2, -1))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


# ---------------------------------------------------------------------------
# SSIM (skimage-compatible gaussian-weighted variant)
# ---------------------------------------------------------------------------


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter2d_separable(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """'valid' separable 2D filtering of (n, h, w) maps."""
    r = (k.shape[0] - 1) // 2
    x = x[:, None]  # NCHW with C=1
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    y = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID")
    return y[:, 0]


def compute_ssim(
    ground_truth: jnp.ndarray,
    predicted: jnp.ndarray,
    win_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """(..., h, w, c) -> (...,) mean SSIM, skimage gaussian_weights semantics."""
    batch_shape = ground_truth.shape[:-3]
    h, w, c = ground_truth.shape[-3:]
    gt = ground_truth.reshape(-1, h, w, c)
    pr = predicted.reshape(-1, h, w, c)
    # channels become independent maps
    gt = gt.transpose(0, 3, 1, 2).reshape(-1, h, w)
    pr = pr.transpose(0, 3, 1, 2).reshape(-1, h, w)

    kernel = _gaussian_kernel1d(sigma, (win_size - 1) // 2)
    filt = lambda x: _filter2d_separable(x, kernel)  # noqa: E731

    ux = filt(gt)
    uy = filt(pr)
    uxx = filt(gt * gt)
    uyy = filt(pr * pr)
    uxy = filt(gt * pr)

    # skimage sample-covariance normalization: NP/(NP-1) with NP = win^2.
    np_ = win_size**2
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    per_map = s.mean(axis=(-2, -1))
    return per_map.reshape(*batch_shape, c).mean(axis=-1) if batch_shape else per_map.reshape(c).mean()


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------


def compute_lpips(
    ground_truth: jnp.ndarray, predicted: jnp.ndarray, lpips_fn
) -> jnp.ndarray:
    """(..., h, w, c) -> (...,); lpips_fn from LatentSplat.lpips_fn or
    training.pretrained.load_lpips_fn."""
    batch_shape = ground_truth.shape[:-3]
    gt = ground_truth.reshape(-1, *ground_truth.shape[-3:])
    pr = predicted.reshape(-1, *predicted.shape[-3:])
    return lpips_fn(gt, pr).reshape(batch_shape)


# ---------------------------------------------------------------------------
# DISTS
# ---------------------------------------------------------------------------

_VGG16_STAGES = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


class _L2Pool(nn.Module):
    """Energy-preserving pooling: sqrt(avg_pool(x^2) * hann_norm)."""

    @nn.compact
    def __call__(self, x):
        # 3x3 hann-window weighted pooling with stride 2 (as in DISTS).
        w1d = jnp.hanning(5)[1:-1]
        win = jnp.outer(w1d, w1d)
        win = win / win.sum()
        kernel = win.reshape(3, 3, 1, 1)
        c = x.shape[-1]
        kernel = jnp.tile(kernel, (1, 1, 1, c))
        y = jax.lax.conv_general_dilated(
            (x * x).transpose(0, 3, 1, 2),
            kernel.transpose(3, 2, 0, 1),
            window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            feature_group_count=c,
        ).transpose(0, 2, 3, 1)
        return jnp.sqrt(jnp.maximum(y, 1e-12))


class DISTSNet(nn.Module):
    """DISTS metric network. __call__(x, y) with NHWC [0,1] images."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        convs = []
        conv_idx = 0
        for n_convs, ch in _VGG16_STAGES:
            for _ in range(n_convs):
                convs.append(nn.Conv(ch, (3, 3), padding=1, name=f"conv_{conv_idx}"))
                conv_idx += 1
        pools = [_L2Pool(name=f"pool_{s}") for s in range(1, len(_VGG16_STAGES))]

        def features(img):
            # Stage-0 features are the RAW [0,1] image (DISTS_pytorch
            # forward_once returns [x, relu1_2, ...] with x un-normalized);
            # only the VGG trunk sees the ImageNet normalization.
            feats = [img]
            h = (img - _IMAGENET_MEAN) / _IMAGENET_STD
            i = 0
            for stage, (n_convs, _) in enumerate(_VGG16_STAGES):
                if stage > 0:
                    h = pools[stage - 1](h)
                for _ in range(n_convs):
                    h = nn.relu(convs[i](h))
                    i += 1
                feats.append(h)
            return feats

        fx = features(x)
        fy = features(y)
        n_channels = [3] + [ch for _, ch in _VGG16_STAGES]
        total_ch = sum(n_channels)
        alpha = self.param("alpha", nn.initializers.constant(0.1), (total_ch,))
        beta = self.param("beta", nn.initializers.constant(0.1), (total_ch,))
        norm = jnp.sum(alpha) + jnp.sum(beta)

        c1 = 1e-6
        c2 = 1e-6
        dist1 = 0.0
        dist2 = 0.0
        offset = 0
        for k, ch in enumerate(n_channels):
            a = alpha[offset : offset + ch] / norm
            b = beta[offset : offset + ch] / norm
            offset += ch
            x_mean = fx[k].mean(axis=(1, 2))
            y_mean = fy[k].mean(axis=(1, 2))
            s1 = (2 * x_mean * y_mean + c1) / (x_mean**2 + y_mean**2 + c1)
            dist1 = dist1 + jnp.sum(a * s1, axis=-1)

            x_c = fx[k] - x_mean[:, None, None]
            y_c = fy[k] - y_mean[:, None, None]
            x_var = (x_c**2).mean(axis=(1, 2))
            y_var = (y_c**2).mean(axis=(1, 2))
            # Centered form: E[(x-mx)(y-my)], not E[xy] - mx my — the latter
            # cancels catastrophically for near-constant features and the
            # error dwarfs c2.
            xy_cov = (x_c * y_c).mean(axis=(1, 2))
            s2 = (2 * xy_cov + c2) / (x_var + y_var + c2)
            dist2 = dist2 + jnp.sum(b * s2, axis=-1)

        return 1.0 - (dist1 + dist2)


def compute_dists(
    ground_truth: jnp.ndarray, predicted: jnp.ndarray, dists_fn
) -> jnp.ndarray:
    """(..., h, w, c) -> (...,); dists_fn = lambda x, y -> per-image score."""
    batch_shape = ground_truth.shape[:-3]
    gt = ground_truth.reshape(-1, *ground_truth.shape[-3:])
    pr = predicted.reshape(-1, *predicted.shape[-3:])
    return dists_fn(gt, pr).reshape(batch_shape)
