"""Tests for evaluation metrics, index generation, and the metric computer."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsplat_tpu.evaluation.evaluation_index_generator import (
    CO3DEvaluationIndexGeneratorCfg,
    EvaluationIndexGeneratorCfg,
    generate_co3d_evaluation_index_for_scene,
    generate_evaluation_index_for_scene,
    load_index,
    save_index,
)
from latentsplat_tpu.evaluation.metrics import (
    DISTSNet,
    compute_psnr,
    compute_ssim,
)
from latentsplat_tpu.evaluation.types import IndexEntry


def test_psnr_known_value():
    gt = jnp.zeros((1, 8, 8, 3))
    pred = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20
    assert np.allclose(np.asarray(compute_psnr(gt, pred)), 20.0, atol=1e-4)


def test_psnr_identical_is_large():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 8, 8, 3)))
    assert float(compute_psnr(x, x).min()) > 100.0


def test_ssim_self_is_one_and_monotonic():
    rng = np.random.default_rng(0)
    gt = rng.uniform(size=(2, 48, 48, 3)).astype(np.float32)
    self_ssim = np.asarray(compute_ssim(jnp.asarray(gt), jnp.asarray(gt)))
    assert np.allclose(self_ssim, 1.0, atol=1e-5)
    prev = 1.0
    for noise in (0.05, 0.15, 0.4):
        pred = np.clip(gt + rng.normal(size=gt.shape) * noise, 0, 1).astype(np.float32)
        val = float(np.asarray(compute_ssim(jnp.asarray(gt), jnp.asarray(pred))).mean())
        assert val < prev
        prev = val


def _skimage_ssim_oracle(gt, pred, win_size=11, sigma=1.5, data_range=1.0):
    """Independent oracle replicating skimage.metrics.structural_similarity
    with gaussian_weights=True (the reference's exact configuration,
    src/evaluation/metrics.py:31-39): scipy gaussian_filter (sigma 1.5,
    truncate 3.5 -> 11-tap kernel, reflect padding), sample-covariance
    normalization NP/(NP-1) with NP = win^2, crop (win-1)//2 border, mean;
    channels computed independently and averaged (channel_axis semantics)."""
    from scipy.ndimage import gaussian_filter

    pad = (win_size - 1) // 2
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    cov_norm = win_size**2 / (win_size**2 - 1.0)

    def one_channel(x, y):
        filt = lambda a: gaussian_filter(  # noqa: E731
            a, sigma=sigma, truncate=3.5, mode="reflect"
        )
        ux, uy = filt(x), filt(y)
        vx = cov_norm * (filt(x * x) - ux * ux)
        vy = cov_norm * (filt(y * y) - uy * uy)
        vxy = cov_norm * (filt(x * y) - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        return s[pad:-pad, pad:-pad].mean()

    return np.mean(
        [
            one_channel(
                gt[..., ch].astype(np.float64), pred[..., ch].astype(np.float64)
            )
            for ch in range(gt.shape[-1])
        ]
    )


def test_ssim_matches_skimage_algorithm():
    """Pin compute_ssim to the reference's skimage semantics via an
    independent scipy implementation (skimage itself is not in this env)."""
    rng = np.random.default_rng(3)
    gt = rng.uniform(size=(3, 40, 56, 3)).astype(np.float32)
    pred = np.clip(
        gt + rng.normal(size=gt.shape) * np.asarray([0.02, 0.1, 0.35])[:, None, None, None],
        0,
        1,
    ).astype(np.float32)
    ours = np.asarray(compute_ssim(jnp.asarray(gt), jnp.asarray(pred)))
    for i in range(gt.shape[0]):
        want = _skimage_ssim_oracle(gt[i], pred[i])
        np.testing.assert_allclose(ours[i], want, atol=1e-5)


def test_ssim_analytic_closed_form_fixtures():
    """SSIM fixtures derived by hand from the formula, with ZERO shared code
    (no convolutions anywhere in the expected-value computation) — an oracle
    independent of both compute_ssim and the scipy replica above. Real
    scikit-image is absent from this environment, so these closed-form cases
    stand in for vendored skimage fixtures; they pin the exact same
    semantics (skimage structural_similarity, win_size=11,
    gaussian_weights=True, use_sample_covariance default True, data_range=1,
    valid-window crop):

    1. Constant images x=a, y=b: every window has means (a, b) and zero
       (co)variances, so SSIM = (2ab + C1) / (a^2 + b^2 + C1) exactly.
    2. y = s*x + t with x a linear ramp: filtering is linear and every
       VALID window is interior, so per-window means are the ramp values
       themselves, var_y = s^2 var_x, cov = s var_x, and var_x is the
       closed-form weighted variance of the truncated gaussian kernel:
       var_x = (alpha^2 + beta^2) * sum_k w_k k^2 for ramp
       x[i,j] = alpha*i + beta*j + gamma. The mean over windows is then a
       plain numpy average of a pointwise rational function of the ramp.
    """
    c1, c2 = 0.01**2, 0.03**2
    cov_norm = 121.0 / 120.0  # NP/(NP-1), NP = 11^2 (sample covariance)

    # -- Case 1: constants (three (a, b) pairs, one per channel) --
    pairs = [(0.25, 0.75), (0.1, 0.1), (0.0, 1.0)]
    h = w = 32
    gt = np.stack([np.full((h, w), a, np.float32) for a, _ in pairs], axis=-1)
    pr = np.stack([np.full((h, w), b, np.float32) for _, b in pairs], axis=-1)
    want = np.mean(
        [(2 * a * b + c1) / (a * a + b * b + c1) for a, b in pairs]
    )
    # atol 1e-4: f32 kernel normalization (sum = 1 +- 1e-7) leaks ~a^2*1e-7
    # into the zero variances, which sit next to C2 = 9e-4 in the structure
    # ratio. The semantics this fixture pins (crop, win, channel averaging,
    # cov_norm) all move the value by >= 1e-3 when wrong.
    got = float(np.asarray(compute_ssim(jnp.asarray(gt), jnp.asarray(pr))))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # -- Case 2: affine map of a linear ramp --
    # Truncated gaussian weights (sigma=1.5, radius=5), derived here from
    # the definition only (11 scalar terms, no filtering code).
    ks = np.arange(-5, 6, dtype=np.float64)
    wk = np.exp(-0.5 * (ks / 1.5) ** 2)
    wk /= wk.sum()
    kernel_var = float((wk * ks**2).sum())  # ~2.2434

    # Slope large enough that the window variance (~(alpha^2+beta^2)*2.24)
    # dominates f32 cancellation noise in uxx - ux^2 (~1e-7).
    alpha, beta, gamma = 0.02, -0.015, 0.4
    s_aff, t_aff = 0.9, 0.05
    ii, jj = np.mgrid[0:h, 0:w].astype(np.float64)
    x = alpha * ii + beta * jj + gamma
    gt2 = x.astype(np.float32)[..., None]
    pr2 = (s_aff * x + t_aff).astype(np.float32)[..., None]

    # Window centers of VALID filtering: i, j in [5, size-6].
    ux = x[5 : h - 5, 5 : w - 5]
    uy = s_aff * ux + t_aff
    vx = cov_norm * (alpha**2 + beta**2) * kernel_var
    vy = (s_aff**2) * vx
    vxy = s_aff * vx
    s_map = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    want2 = float(s_map.mean())
    got2 = float(np.asarray(compute_ssim(jnp.asarray(gt2), jnp.asarray(pr2))))
    np.testing.assert_allclose(got2, want2, atol=1e-4)


def test_ssim_structured_image_parity():
    """Same parity on a smooth structured (non-noise) pair, where local
    statistics behave very differently from white noise."""
    yy, xx = np.mgrid[0:48, 0:48] / 48.0
    gt = np.stack(
        [np.sin(6 * xx) * np.cos(4 * yy) * 0.5 + 0.5,
         xx * yy,
         np.clip(xx + yy, 0, 1)],
        axis=-1,
    ).astype(np.float32)
    pred = np.clip(gt * 0.9 + 0.03 * np.sin(20 * xx)[..., None], 0, 1).astype(
        np.float32
    )
    ours = float(np.asarray(compute_ssim(jnp.asarray(gt), jnp.asarray(pred))))
    want = _skimage_ssim_oracle(gt, pred)
    np.testing.assert_allclose(ours, want, atol=1e-5)


@pytest.mark.slow
def test_dists_self_is_zero():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    net = DISTSNet()
    params = net.init(jax.random.PRNGKey(0), gt, gt)
    assert abs(float(net.apply(params, gt, gt)[0])) < 1e-4
    noisy = jnp.clip(gt + 0.3 * jax.random.normal(jax.random.PRNGKey(1), gt.shape), 0, 1)
    assert float(net.apply(params, gt, noisy)[0]) > 1e-3


def _arc_cameras(v, spread=0.6):
    from latentsplat_tpu.dataset.synthetic import _look_at

    angles = np.linspace(-spread, spread, v)
    ext = np.stack(
        [
            _look_at(
                np.array([3.0 * np.sin(a), 0.0, -3.0 * np.cos(a) + 4.0], np.float32),
                np.array([0.0, 0.0, 4.0], np.float32),
            )
            for a in angles
        ]
    )
    intr = np.tile(
        np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (v, 1, 1)
    )
    return ext, intr


def test_evaluation_index_generator_re10k_style():
    ext, intr = _arc_cameras(24)
    cfg = EvaluationIndexGeneratorCfg(
        num_target_views=3,
        min_context_overlap=0.2,
        max_context_overlap=1.0,
        min_context_distance=4,
        max_context_distance=16,
        max_target_distance=6,
        intra_context=True,
        output_path="/tmp/eval_index_test",
    )
    rng = np.random.default_rng(0)
    entries = generate_evaluation_index_for_scene(cfg, ext, intr, (16, 16), rng)
    assert entries, "should find at least one context pair on a smooth arc"
    for e in entries:
        left, right = e.context
        assert right - left >= cfg.min_context_distance
        assert all(left <= t <= right for t in e.target)  # intra
        assert list(e.target) == sorted(e.target)


def test_evaluation_index_generator_extra_targets():
    ext, intr = _arc_cameras(24)
    cfg = EvaluationIndexGeneratorCfg(
        num_target_views=2,
        min_context_overlap=0.2,
        max_context_overlap=1.0,
        min_context_distance=3,
        max_context_distance=10,
        max_target_distance=8,
        intra_context=False,
        output_path="/tmp/eval_index_test",
    )
    entries = generate_evaluation_index_for_scene(
        cfg, ext, intr, (16, 16), np.random.default_rng(1)
    )
    if entries:
        left, right = entries[0].context
        assert all(t < left or t > right for t in entries[0].target)


def test_co3d_index_generator_circular():
    cfg = CO3DEvaluationIndexGeneratorCfg(
        num_target_views=3,
        min_context_distance=5,
        max_context_distance=15,
        intra_context=True,
        output_path="/tmp/eval_index_test",
        num_context_pairs_per_scene=4,
    )
    entries = generate_co3d_evaluation_index_for_scene(
        cfg, 40, np.random.default_rng(0)
    )
    assert entries
    for e in entries:
        assert all(0 <= t < 40 for t in e.target)
        assert all(0 <= c < 40 for c in e.context)


def test_index_save_load_roundtrip(tmp_path):
    index = {
        "scene_a": [IndexEntry(context=(0, 5), target=(1, 2, 3))],
        "scene_b": [IndexEntry(context=(2, 9), target=(4, 6))],
    }
    save_index(index, tmp_path)
    loaded = load_index(tmp_path / "evaluation_index.json")
    assert loaded["scene_a"][0].context == (0, 5)
    assert loaded["scene_b"][0].target == (4, 6)


def test_index_load_reference_single_entry_format(tmp_path):
    # The reference's shipped indices are {scene: {context, target} | null}.
    path = tmp_path / "evaluation_index.json"
    path.write_text(
        json.dumps({"s1": {"context": [0, 3], "target": [1, 2]}, "s2": None})
    )
    loaded = load_index(path)
    assert loaded["s1"][0].context == (0, 3)
    assert loaded["s2"] is None


def test_metric_computer_end_to_end(tmp_path):
    from latentsplat_tpu.evaluation.metric_computer import (
        EvaluationCfg,
        MethodCfg,
        MetricComputer,
    )
    from latentsplat_tpu.misc.image_io import save_image

    rng = np.random.default_rng(0)
    gt = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    method_dir = tmp_path / "ours"
    for i, idx in enumerate((3, 7)):
        noisy = np.clip(gt[i] + rng.normal(size=gt[i].shape) * 0.05, 0, 1)
        save_image(noisy, method_dir / "scene_x" / "0_9" / "color" / f"{idx:0>6}.png")

    cfg = EvaluationCfg(methods=[MethodCfg(name="Ours", key="ours", path=method_dir)])
    computer = MetricComputer(cfg)
    batch = {
        "scene": "scene_x",
        "context": {"index": np.asarray([0, 9])},
        "target": {"index": np.asarray([3, 7]), "image": gt[None]},
    }
    metrics = computer.step(batch, verbose=False)
    assert metrics is not None
    assert 20.0 < metrics["psnr_ours"] < 50.0
    assert 0.5 < metrics["ssim_ours"] <= 1.0
    computer.save_scores(tmp_path / "scores.json")
    assert (tmp_path / "scores.json").exists()
    means = computer.mean_scores()
    assert "ours" in means["psnr"]
