"""Rasterizer tests: dense oracle sanity, tiled-vs-dense parity, gradients
(SURVEY.md §4 item (b): forward+backward numerics vs a dense reference and
finite differences)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsplat_tpu.ops.gaussians import build_covariance
from latentsplat_tpu.ops.rasterize import (
    RenderOutput,
    composite_dense,
    project_gaussians_to_screen,
    render,
)
from latentsplat_tpu.ops.rasterize.tiled import composite_tiled

H = W = 32
INTRINSICS = jnp.asarray(
    [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], jnp.float32
)
EXTRINSICS = jnp.eye(4, dtype=jnp.float32)  # camera at origin looking +z


def make_gaussians(key, n, spread=0.6, z_range=(2.0, 6.0), n_channels=4):
    ks = jax.random.split(key, 6)
    xy = jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread)
    z = jax.random.uniform(ks[1], (n,), minval=z_range[0], maxval=z_range[1])
    means = jnp.concatenate([xy * z[:, None], z[:, None]], axis=-1)
    scales = jax.random.uniform(ks[2], (n, 3), minval=0.05, maxval=0.25)
    quats = jax.random.normal(ks[3], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    covs = build_covariance(scales, quats)
    ops = jax.random.uniform(ks[4], (n,), minval=0.3, maxval=0.95)
    channels = jax.random.uniform(ks[5], (n, n_channels))
    return means, covs, ops, channels


def project(means, covs, ops, channels):
    return project_gaussians_to_screen(
        means, covs, ops, channels, EXTRINSICS, INTRINSICS, (H, W)
    )


class TestProjection:
    def test_center_gaussian_projects_to_image_center(self):
        means = jnp.asarray([[0.0, 0.0, 4.0]])
        covs = jnp.eye(3)[None] * 0.01
        sg = project(means, covs, jnp.asarray([0.8]), jnp.ones((1, 1)))
        # cx = 0.5 normalized -> pixel index (W-1)/2 + eps = 15.5
        np.testing.assert_allclose(np.asarray(sg.mean2d[0]), [15.5, 15.5], atol=1e-4)
        assert float(sg.depth[0]) == pytest.approx(4.0)
        assert float(sg.radius[0]) > 0

    def test_behind_camera_culled(self):
        means = jnp.asarray([[0.0, 0.0, -1.0]])
        covs = jnp.eye(3)[None] * 0.01
        sg = project(means, covs, jnp.asarray([0.8]), jnp.ones((1, 1)))
        assert float(sg.radius[0]) == 0.0
        assert float(sg.opacity[0]) == 0.0

    def test_isotropic_cov2d(self):
        # Isotropic world covariance on-axis -> isotropic conic (b == 0).
        means = jnp.asarray([[0.0, 0.0, 4.0]])
        covs = jnp.eye(3)[None] * 0.04
        sg = project(means, covs, jnp.asarray([0.8]), jnp.ones((1, 1)))
        conic = np.asarray(sg.conic[0])
        assert conic[1] == pytest.approx(0.0, abs=1e-5)
        assert conic[0] == pytest.approx(conic[2], rel=1e-4)


class TestDense:
    def test_single_gaussian_peak_at_center(self):
        means = jnp.asarray([[0.0, 0.0, 4.0]])
        covs = jnp.eye(3)[None] * 0.04
        sg = project(means, covs, jnp.asarray([0.9]), jnp.ones((1, 1)))
        img, mask, depth = composite_dense(sg, (H, W))
        img = np.asarray(img[0])
        peak = np.unravel_index(img.argmax(), img.shape)
        assert peak in [(15, 15), (15, 16), (16, 15), (16, 16)]
        assert 0.0 <= mask.max() <= 1.0
        # expected depth at peak ~ alpha * z
        m = np.asarray(mask)
        d = np.asarray(depth)
        assert d[peak] == pytest.approx(4.0 * m[peak], rel=1e-3)

    def test_opacity_saturation(self):
        # Many overlapping opaque gaussians -> mask saturates towards 1.
        means = jnp.tile(jnp.asarray([[0.0, 0.0, 4.0]]), (20, 1))
        means = means + jnp.linspace(0, 0.1, 20)[:, None] * jnp.asarray([0, 0, 1.0])
        covs = jnp.tile(jnp.eye(3)[None] * 0.2, (20, 1, 1))
        sg = project(means, covs, jnp.full((20,), 0.9), jnp.ones((20, 1)))
        _, mask, _ = composite_dense(sg, (H, W))
        assert float(mask[15, 15]) > 0.999

    def test_front_to_back_order(self):
        # A red gaussian in front of a blue one: front dominates.
        means = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]])
        covs = jnp.tile(jnp.eye(3)[None] * 0.1, (2, 1, 1))
        channels = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        sg = project(means, covs, jnp.asarray([0.9, 0.9]), channels)
        img, _, _ = composite_dense(sg, (H, W))
        assert float(img[0, 15, 15]) > float(img[1, 15, 15])
        # ... and order of inputs must not matter (depth sort).
        sg2 = project(means[::-1], covs, jnp.asarray([0.9, 0.9]), channels[::-1])
        img2, _, _ = composite_dense(sg2, (H, W))
        np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-5)

    def test_background(self):
        sg = project(
            jnp.asarray([[0.0, 0.0, 4.0]]),
            jnp.eye(3)[None] * 1e-6,
            jnp.asarray([0.01]),
            jnp.ones((1, 2)),
        )
        bg = jnp.asarray([0.25, 0.75])
        img, mask, _ = composite_dense(sg, (H, W), bg)
        # Far corner: no contribution -> pure background.
        np.testing.assert_allclose(np.asarray(img[:, 0, 0]), [0.25, 0.75], atol=1e-5)


@pytest.mark.slow
class TestTiledVsDense:
    @pytest.mark.parametrize("n", [1, 7, 64, 300])
    def test_forward_match(self, n):
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(n), n)
        sg = project(means, covs, ops, channels)
        bg = jnp.asarray([0.1, 0.2, 0.3, 0.4])
        d_img, d_mask, d_depth = composite_dense(sg, (H, W), bg, tile_size=16)
        t_img, t_mask, t_depth = composite_tiled(sg, (H, W), bg, pack_channels=False)
        np.testing.assert_allclose(np.asarray(t_img), np.asarray(d_img), atol=2e-4)
        np.testing.assert_allclose(np.asarray(t_mask), np.asarray(d_mask), atol=2e-4)
        np.testing.assert_allclose(np.asarray(t_depth), np.asarray(d_depth), atol=2e-3)

    def test_gradients_match_dense(self):
        n = 40
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(7), n)
        bg = jnp.asarray([0.5, 0.1, 0.0, 0.2])
        target = jax.random.uniform(jax.random.PRNGKey(8), (4, H, W))

        def loss_fn(params, backend):
            means_, covs_, ops_, ch_ = params
            sg = project(means_, covs_, ops_, ch_)
            if backend == "dense":
                img, mask, depth = composite_dense(sg, (H, W), bg, tile_size=16)
            else:
                img, mask, depth = composite_tiled(sg, (H, W), bg, pack_channels=False)
            return ((img - target) ** 2).mean() + mask.mean() + 1e-3 * depth.mean()

        params = (means, covs, ops, channels)
        g_dense = jax.grad(lambda p: loss_fn(p, "dense"))(params)
        g_tiled = jax.grad(lambda p: loss_fn(p, "tiled"))(params)
        for gd, gt, name in zip(g_dense, g_tiled, ["means", "covs", "ops", "ch"]):
            gd, gt = np.asarray(gd), np.asarray(gt)
            scale = np.abs(gd).max() + 1e-8
            np.testing.assert_allclose(
                gt / scale, gd / scale, atol=5e-3,
                err_msg=f"gradient mismatch for {name}",
            )

    def test_gradient_finite_differences(self):
        n = 6
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(9), n)
        bg = jnp.zeros((4,))

        def loss_fn(op_vec):
            sg = project(means, covs, op_vec, channels)
            img, mask, _ = composite_tiled(sg, (H, W), bg, pack_channels=False)
            return (img**2).mean() + mask.mean()

        g = np.asarray(jax.grad(loss_fn)(ops))
        eps = 1e-3
        for i in range(n):
            delta = jnp.zeros_like(ops).at[i].set(eps)
            fd = (float(loss_fn(ops + delta)) - float(loss_fn(ops - delta))) / (2 * eps)
            assert g[i] == pytest.approx(fd, rel=0.05, abs=1e-5)


@pytest.mark.slow
class TestRenderAPI:
    def test_render_color_and_features(self):
        n = 50
        key = jax.random.PRNGKey(11)
        means, covs, ops, _ = make_gaussians(key, n)
        color_sh = jax.random.normal(jax.random.fold_in(key, 1), (n, 3, 9)) * 0.3
        feature_sh = jax.random.normal(jax.random.fold_in(key, 2), (n, 4, 4)) * 0.3

        out = render(
            EXTRINSICS[None, None],
            INTRINSICS[None, None],
            jnp.asarray([[1.0]]),
            jnp.asarray([[100.0]]),
            (H, W),
            jnp.zeros((1, 3)),
            means[None],
            covs[None],
            ops[None],
            color_sh[None],
            feature_sh[None],
            backend="dense",
        )
        assert out.color.shape == (1, 1, 3, H, W)
        assert out.feature.shape == (1, 1, 4, H, W)
        assert out.mask.shape == (1, 1, H, W)
        assert out.depth.shape == (1, 1, H, W)
        assert np.all(np.asarray(out.color) >= 0.0)
        assert np.asarray(out.mask).max() <= 1.0 + 1e-5

    def test_scale_invariance(self):
        n = 30
        key = jax.random.PRNGKey(12)
        means, covs, ops, _ = make_gaussians(key, n)
        color_sh = jax.random.normal(jax.random.fold_in(key, 1), (n, 3, 1)) * 0.3

        def go(s):
            ext = EXTRINSICS.at[:3, 3].set(EXTRINSICS[:3, 3] * s)
            return render(
                ext[None, None],
                INTRINSICS[None, None],
                jnp.asarray([[1.0 * s]]),
                jnp.asarray([[100.0 * s]]),
                (H, W),
                jnp.zeros((1, 3)),
                means[None] * s,
                covs[None] * s**2,
                ops[None],
                color_sh[None],
                backend="dense",
            )

        out1 = go(1.0)
        out2 = go(1000.0)
        np.testing.assert_allclose(
            np.asarray(out1.color), np.asarray(out2.color), atol=1e-3
        )

    def test_tiled_backend_vmap(self):
        n = 20
        key = jax.random.PRNGKey(13)
        means, covs, ops, _ = make_gaussians(key, n)
        color_sh = jax.random.normal(jax.random.fold_in(key, 1), (n, 3, 4)) * 0.2
        b, v = 2, 2
        out = render(
            jnp.tile(EXTRINSICS[None, None], (b, v, 1, 1)),
            jnp.tile(INTRINSICS[None, None], (b, v, 1, 1)),
            jnp.ones((b, v)),
            jnp.full((b, v), 100.0),
            (H, W),
            jnp.zeros((b, 3)),
            jnp.tile(means[None], (b, 1, 1)),
            jnp.tile(covs[None], (b, 1, 1, 1)),
            jnp.tile(ops[None], (b, 1)),
            jnp.tile(color_sh[None], (b, 1, 1, 1)),
            backend="tiled",
        )
        # Identical scenes and identical views must agree.
        np.testing.assert_allclose(
            np.asarray(out.color[0]), np.asarray(out.color[1]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.color[0, 0]), np.asarray(out.color[0, 1]), atol=1e-5
        )


@pytest.mark.slow
class TestPackedChannels:
    def test_bf16_packed_close_to_exact(self):
        """Default mixed-precision channel packing stays within bf16 error
        of the exact f32 path."""
        n = 64
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(21), n)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((channels.shape[-1],))
        exact = composite_tiled(sg, (H, W), bg, pack_channels=False)
        packed = composite_tiled(sg, (H, W), bg, pack_channels=True)
        # Geometry-derived outputs are exact; channel outputs are bf16-close.
        np.testing.assert_allclose(np.asarray(packed[1]), np.asarray(exact[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(packed[0]), np.asarray(exact[0]), atol=2e-2)


@pytest.mark.slow
class TestFastPrecision:
    def test_fast_mode_close_to_exact(self):
        """precision='fast' (f16 tile-relative xy + bf16 conic/opacity/
        channels through the sort) stays within half-precision error of the
        exact path."""
        n = 96
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(23), n)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((channels.shape[-1],))
        exact = composite_tiled(sg, (H, W), bg, pack_channels=False)
        fast = composite_tiled(sg, (H, W), bg, precision="fast")
        np.testing.assert_allclose(
            np.asarray(fast[0]), np.asarray(exact[0]), atol=3e-2
        )
        np.testing.assert_allclose(
            np.asarray(fast[1]), np.asarray(exact[1]), atol=2e-2
        )
        # Per-pixel relative depth error bounded by the bf16 quantization.
        d_err = np.abs(np.asarray(fast[2]) - np.asarray(exact[2]))
        assert float(np.median(d_err)) < 2e-2

    def test_fast_mode_gradients_close(self):
        n = 48
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(24), n)

        def loss(ops_, precision):
            sg = project(means, covs, ops_, channels)
            img, mask, _ = composite_tiled(
                sg, (H, W), jnp.zeros((channels.shape[-1],)),
                precision=precision,
            )
            return jnp.sum(img**2) + jnp.sum(mask)

        g_exact = jax.grad(lambda o: loss(o, "exact"))(ops)
        g_fast = jax.grad(lambda o: loss(o, "fast"))(ops)
        scale = float(jnp.abs(g_exact).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(g_fast) / scale, np.asarray(g_exact) / scale, atol=3e-2
        )


@pytest.mark.slow
class TestFastNoCoef:
    def test_fast_nocoef_matches_fast(self):
        """'fast_nocoef' = fast's exact structural layout but with the
        training attribute layout in the inference forward (no coefficient-
        layout alpha): outputs stay within f32-evaluation error of fast, and
        gradients are bit-identical (the backward shares fast's path)."""
        n = 96
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(23), n)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((channels.shape[-1],))
        fast = composite_tiled(sg, (H, W), bg, precision="fast")
        nocoef = composite_tiled(sg, (H, W), bg, precision="fast_nocoef")
        np.testing.assert_allclose(
            np.asarray(nocoef[0]), np.asarray(fast[0]), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(nocoef[1]), np.asarray(fast[1]), atol=5e-3
        )

        def loss(ops_, precision):
            sg2 = project(means, covs, ops_, channels)
            img, mask, _ = composite_tiled(
                sg2, (H, W), bg, precision=precision
            )
            return jnp.sum(img**2) + jnp.sum(mask)

        g_fast = jax.grad(lambda o: loss(o, "fast"))(ops)
        g_nocoef = jax.grad(lambda o: loss(o, "fast_nocoef"))(ops)
        np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_nocoef))


class TestDiagnosticPrecisions:
    """Each hybrid mode = exact + exactly ONE fast knob (tiled.py
    DIAGNOSTIC_PRECISIONS): used to bisect fast-vs-exact differences in
    convergence and PSNR. Every knob alone must stay within fast mode's
    aggregate error envelope of exact."""

    def _scene(self, n=96, key=29):
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(key), n)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((channels.shape[-1],))
        return sg, bg

    @pytest.mark.parametrize(
        "mode",
        [
            "exact_wide_cull", "exact_tie_depth", "exact_bf16_mm",
            "exact_q12_channels", "exact_f16_xy", "exact_bf16_conic",
            "exact_depth_val",
        ],
    )
    def test_single_knob_within_fast_envelope(self, mode):
        sg, bg = self._scene()
        exact = composite_tiled(sg, (H, W), bg, pack_channels=False)
        hybrid = composite_tiled(sg, (H, W), bg, precision=mode)
        np.testing.assert_allclose(
            np.asarray(hybrid[0]), np.asarray(exact[0]), atol=3e-2
        )
        np.testing.assert_allclose(
            np.asarray(hybrid[1]), np.asarray(exact[1]), atol=2e-2
        )

    def test_wide_cull_is_exact_on_values(self):
        """The cull-margin knob only widens which tiles survive; where both
        agree the compositing math is identical, so outputs match exact to
        f32 roundoff (the wider margin only ADDS sub-threshold pairs)."""
        sg, bg = self._scene()
        exact = composite_tiled(sg, (H, W), bg, pack_channels=False)
        wide = composite_tiled(
            sg, (H, W), bg, precision="exact_wide_cull", pack_channels=False
        )
        np.testing.assert_allclose(
            np.asarray(wide[0]), np.asarray(exact[0]), atol=1e-5
        )

    def test_depth_val_touches_only_depth(self):
        """exact_depth_val quantizes the depth VALUE readback only: color
        and mask stay bit-identical to exact (same order, same alpha)."""
        sg, bg = self._scene()
        exact = composite_tiled(sg, (H, W), bg)
        hybrid = composite_tiled(sg, (H, W), bg, precision="exact_depth_val")
        np.testing.assert_array_equal(np.asarray(hybrid[0]), np.asarray(exact[0]))
        np.testing.assert_array_equal(np.asarray(hybrid[1]), np.asarray(exact[1]))
        # ... and the depth error is bounded by the 19-bit code (2^-11 rel).
        d_err = np.abs(np.asarray(hybrid[2]) - np.asarray(exact[2]))
        rel = d_err / np.maximum(np.abs(np.asarray(exact[2])), 1e-6)
        assert float(np.max(rel)) < 2e-3

    @pytest.mark.slow
    def test_value_knobs_differentiable(self):
        """The value-quantization knobs sit inside the custom-VJP forward;
        gradients ride the handwritten backward (straight-through, same as
        fast) and must stay close to exact."""
        n = 48
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(31), n)

        def loss(ops_, precision):
            sg = project(means, covs, ops_, channels)
            img, mask, _ = composite_tiled(
                sg, (H, W), jnp.zeros((channels.shape[-1],)),
                precision=precision,
            )
            return jnp.sum(img**2) + jnp.sum(mask)

        g_exact = jax.grad(lambda o: loss(o, "exact"))(ops)
        scale = float(jnp.abs(g_exact).max()) + 1e-8
        for mode in ("exact_q12_channels", "exact_f16_xy", "exact_bf16_conic"):
            g = jax.grad(lambda o: loss(o, mode))(ops)
            np.testing.assert_allclose(
                np.asarray(g) / scale, np.asarray(g_exact) / scale, atol=3e-2,
                err_msg=f"gradient mismatch for {mode}",
            )


@pytest.mark.slow
class TestInferencePath:
    def test_primal_matches_vjp_forward(self):
        """The inference path (no carried pair index, no residuals) must
        produce the same outputs as the forward of the differentiated path."""
        n = 80
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(25), n)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((channels.shape[-1],))

        def run(ops_):
            sg_ = project(means, covs, ops_, channels)
            img, mask, depth = composite_tiled(sg_, (H, W), bg)
            return img, mask, depth

        primal = run(ops)
        # Force the VJP forward via jax.vjp (residuals get built).
        with_vjp, _ = jax.vjp(run, ops)
        for a, b in zip(primal, with_vjp):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0
            )


class TestPairOverflowCounter:
    def test_zero_when_budget_sufficient(self):
        from latentsplat_tpu.ops.rasterize.tiled import count_pair_overflow

        n = 64
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(26), n)
        sg = project(means, covs, ops, channels)
        assert int(
            count_pair_overflow(
                sg, (H, W), pair_budget_factor=9.0, precision="exact"
            )
        ) == 0

    @pytest.mark.slow
    def test_counts_dropped_pairs(self):
        import math

        from latentsplat_tpu.ops.rasterize.expand import OUT_BLOCK
        from latentsplat_tpu.ops.rasterize.pallas_kernels import CHUNK
        from latentsplat_tpu.ops.rasterize.tiled import (
            _tile_rects,
            count_pair_overflow,
        )

        n = 512  # large enough that budget rounding can't hide truncation
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(27), n)
        sg = project(means, covs, ops, channels)
        counts, _, _, _ = _tile_rects(sg, W // 16, H // 16, 9)
        total = int(counts.sum())
        factor = 0.5  # small enough that budget-quantum rounding (lcm of
        # OUT_BLOCK and CHUNK) can't lift the budget past the scene's pairs
        quantum = OUT_BLOCK * CHUNK // math.gcd(OUT_BLOCK, CHUNK)
        budget = ((min(int(n * factor) + 1, n * 9) + quantum - 1)
                  // quantum) * quantum
        want = max(total - budget, 0)
        assert want > 0, "fixture must actually overflow"
        got = int(
            count_pair_overflow(
                sg, (H, W), pair_budget_factor=factor, precision="exact"
            )
        )
        assert got == want

    @pytest.mark.slow
    def test_render_surfaces_counter(self):
        means, covs, ops, _ = make_gaussians(jax.random.PRNGKey(28), 32)
        out = render(
            EXTRINSICS[None, None], INTRINSICS[None, None],
            jnp.ones((1, 1)) * 0.5, jnp.ones((1, 1)) * 50.0,
            (H, W), jnp.zeros((1, 3)),
            means[None], covs[None], ops[None],
            gaussian_color_sh=jax.random.normal(
                jax.random.PRNGKey(29), (1, 32, 3, 1)
            ),
            use_sh=False,
            pair_budget_factor=9.0,
        )
        assert out.pairs_dropped.shape == (1, 1)
        assert int(out.pairs_dropped[0, 0]) == 0


class TestWideRankKeys:
    def test_two_key_path_matches_dense(self, monkeypatch):
        """Force the two-key (tile, rank) sort path at a small scale by
        shrinking the packed-key rank budget; results must still match the
        dense oracle exactly."""
        import latentsplat_tpu.ops.rasterize.tiled as tiled_mod

        monkeypatch.setattr(tiled_mod, "RANK_BITS", 8)
        n = 300  # >= 2^8 gaussians -> wide-rank keys
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(30), n)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((channels.shape[-1],))
        d_img, d_mask, d_depth = composite_dense(sg, (H, W), bg)
        t_img, t_mask, t_depth = composite_tiled(
            sg, (H, W), bg, pack_channels=False
        )
        np.testing.assert_allclose(np.asarray(t_img), np.asarray(d_img), atol=2e-4)
        np.testing.assert_allclose(np.asarray(t_mask), np.asarray(d_mask), atol=2e-4)
        np.testing.assert_allclose(np.asarray(t_depth), np.asarray(d_depth), atol=2e-3)

    @pytest.mark.slow
    def test_beyond_packed_ceiling(self):
        """G > 2^19 (the round-1 hard ceiling, VERDICT item 7): sub-pixel
        splats keep the pair count manageable while the rank no longer fits
        the packed key; the two-key path must match the dense oracle."""
        n = 540_000  # > 524,288
        means, covs, ops, channels = make_gaussians(
            jax.random.PRNGKey(31), n, n_channels=1
        )
        # Shrink to mostly sub-pixel footprints so the interpret-mode pair
        # pipeline stays fast.
        covs = covs * 1e-3
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((1,))
        d_img, d_mask, d_depth = composite_dense(sg, (H, W), bg)
        t_img, t_mask, t_depth = composite_tiled(
            sg, (H, W), bg, pack_channels=False, pair_budget_factor=1.5
        )
        np.testing.assert_allclose(np.asarray(t_img), np.asarray(d_img), atol=5e-4)
        np.testing.assert_allclose(np.asarray(t_mask), np.asarray(d_mask), atol=5e-4)


@pytest.mark.slow
class TestScaleEnvelope:
    """Pin the shape ceilings beyond the flagship 256px/2-view point
    (VERDICT r2 weak #5): 512px output (1024 tiles — exercises the
    tiles << RANK_BITS int32 key packing near its 2^12-tile limit) and a
    huge near splat against the max_tiles_per_gaussian rect clamp."""

    def test_512px_matches_dense(self):
        h = w = 512  # 32 x 32 = 1024 tiles
        means, covs, ops, channels = make_gaussians(
            jax.random.PRNGKey(40), 64, n_channels=2
        )
        # Flagship gaussians scale with pixel size; shrink the 32px-sized
        # fixtures 10x per axis so footprints stay a few tiles at 512px
        # (the rect cap is exercised separately below).
        covs = covs * 1e-2
        sg = project_gaussians_to_screen(
            means, covs, ops, channels, EXTRINSICS, INTRINSICS, (h, w)
        )
        bg = jnp.asarray([0.1, 0.3])
        d_img, d_mask, d_depth = composite_dense(sg, (h, w), bg)
        t_img, t_mask, t_depth = composite_tiled(
            sg, (h, w), bg, pack_channels=False
        )
        np.testing.assert_allclose(np.asarray(t_img), np.asarray(d_img), atol=2e-4)
        np.testing.assert_allclose(np.asarray(t_mask), np.asarray(d_mask), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(t_depth), np.asarray(d_depth), atol=2e-3
        )

    def test_huge_splat_cap_widening_matches_dense(self):
        """A near, wide gaussian whose tile rect exceeds the default
        9-slot cap: the default SILENTLY truncates its rect (documented
        clamp), while max_tiles_per_gaussian=24 must recover the dense
        oracle exactly."""
        h = w = 128  # 8 x 8 tiles, so a rect CAN exceed the 9-slot cap
        means = jnp.asarray([[0.0, 0.0, 2.5], [0.3, -0.2, 4.0]])
        covs = jnp.stack([jnp.eye(3) * 0.03, jnp.eye(3) * 0.005])
        ops = jnp.asarray([0.9, 0.8])
        channels = jnp.asarray([[1.0, 0.2], [0.1, 0.9]])
        sg = project_gaussians_to_screen(
            means, covs, ops, channels, EXTRINSICS, INTRINSICS, (h, w)
        )
        # The wide splat must actually exceed the default cap for the test
        # to bite.
        from latentsplat_tpu.ops.rasterize.tiled import _tile_rects

        counts24, *_ = _tile_rects(sg, w // 16, h // 16, 24)
        assert int(counts24[0]) > 9, "fixture no longer exceeds the cap"
        bg = jnp.zeros((2,))
        d_img, d_mask, d_depth = composite_dense(sg, (h, w), bg)
        t_img, t_mask, _ = composite_tiled(
            sg, (h, w), bg, max_tiles_per_gaussian=24, pack_channels=False,
            pair_budget_factor=24.0,
        )
        np.testing.assert_allclose(np.asarray(t_img), np.asarray(d_img), atol=2e-4)
        np.testing.assert_allclose(np.asarray(t_mask), np.asarray(d_mask), atol=2e-4)
        # The default cap drops the wide splat's outer tiles: the result
        # must still be finite (graceful truncation), just not equal.
        c_img, _, _ = composite_tiled(
            sg, (h, w), bg, pack_channels=False, pair_budget_factor=24.0
        )
        assert np.isfinite(np.asarray(c_img)).all()


class TestNonPdConicGradients:
    """Regression: a near-degenerate conic (ca*cc ~ cb^2) evaluated at far
    in-window offsets makes the quadratic's cross term dominate, so
    `power` goes LARGE POSITIVE (> +88) on rows whose alpha the kernel
    zeroes. The forward survives (power > 0 rows are masked) but the
    backward's d_opacity = d_alpha * exp(power) * mask used to be
    inf * 0 = NaN, silently poisoning every upstream parameter — this is
    exactly what fast mode's bf16-rounded conics produced on step 1 of the
    on-chip convergence run (benchmarks/convergence_128px.json: fast-mode
    generator loss NaN while exact trained to 26 dB). exp must clamp its
    exponent at 0 (exact for every live row, whose power <= 0 by
    construction)."""

    def _scene(self):
        # Two splats in opposite corners of a 128px image: their pairs
        # share one CHUNK-aligned window, so each tile evaluates the other
        # splat's row at |dx|,|dy| ~ 100 px. The first conic is slightly
        # non-PD along the diagonal (q(d,d) = -0.008 d^2 -> power ~ +100
        # -> exp overflows f32), mimicking what bf16 conic rounding (or
        # projection fp error on near-degenerate covariances) produces.
        from latentsplat_tpu.ops.rasterize.types import ScreenGaussians

        mean2d = jnp.asarray([[8.0, 8.0], [120.0, 120.0]])
        conic = jnp.asarray([[2.0, -2.008, 2.0], [0.5, 0.0, 0.5]])
        return ScreenGaussians(
            mean2d=mean2d,
            conic=conic,
            depth=jnp.asarray([3.0, 4.0]),
            radius=jnp.asarray([4.0, 4.0]),
            opacity=jnp.asarray([0.9, 0.8]),
            channels=jnp.asarray([[1.0, 0.3], [0.2, 0.7]]),
            extent=jnp.asarray([[4.0, 4.0], [4.0, 4.0]]),
        )

    @pytest.mark.parametrize("precision", ["exact", "fast"])
    @pytest.mark.slow
    def test_gradients_finite(self, precision):
        sg = self._scene()
        bg = jnp.zeros((2,))

        def loss(op):
            img, mask, _ = composite_tiled(
                sg.replace(opacity=op), (128, 128), bg,
                pack_channels=False, precision=precision,
            )
            return jnp.sum(img**2) + jnp.sum(mask)

        g = np.asarray(jax.grad(loss)(sg.opacity))
        assert np.isfinite(g).all(), f"{precision} d_opacity not finite: {g}"

    def test_dense_gradients_finite(self):
        # The dense oracle shares the inf * 0 pattern through jnp.where's
        # AD (cotangent 0 on the zeroed branch times exp(inf)).
        sg = self._scene()
        bg = jnp.zeros((2,))

        def loss(op):
            img, mask, _ = composite_dense(
                sg.replace(opacity=op), (128, 128), bg
            )
            return jnp.sum(img**2) + jnp.sum(mask)

        g = np.asarray(jax.grad(loss)(sg.opacity))
        assert np.isfinite(g).all(), f"dense d_opacity not finite: {g}"


class TestPairBudget:
    @pytest.mark.slow
    def test_small_budget_truncates_gracefully(self):
        """A pair budget below the real pair count must still produce
        finite images/gradients (farther pairs dropped, no crash)."""
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(11), 64)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((sg.num_channels,), jnp.float32)

        def loss(op):
            img, mask, _ = composite_tiled(
                sg.replace(opacity=op), (H, W), bg,
                pack_channels=False, pair_budget_factor=0.25,
            )
            return jnp.sum(img) + jnp.sum(mask)

        g = jax.grad(loss)(sg.opacity)
        assert np.isfinite(np.asarray(g)).all()

    def test_large_budget_matches_default(self):
        """Any budget >= the real pair count gives identical output."""
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(12), 48)
        sg = project(means, covs, ops, channels)
        bg = jnp.zeros((sg.num_channels,), jnp.float32)
        a = composite_tiled(sg, (H, W), bg, pack_channels=False)
        b = composite_tiled(
            sg, (H, W), bg, pack_channels=False, pair_budget_factor=9.0
        )
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6
            )


@pytest.mark.slow
class TestEmptyScenes:
    def test_all_culled(self):
        """Every gaussian behind the camera: empty tiles, zero done counts,
        background-only output, zero gradients."""
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(13), 32)
        means = means.at[:, 2].set(-5.0)  # all behind the camera
        sg = project(means, covs, ops, channels)
        bg = jnp.full((sg.num_channels,), 0.25, jnp.float32)

        def loss(op):
            img, mask, depth = composite_tiled(
                sg.replace(opacity=op), (H, W), bg, pack_channels=False
            )
            return jnp.sum(img), (img, mask, depth)

        (val, (img, mask, depth)), g = jax.value_and_grad(
            loss, has_aux=True
        )(sg.opacity)
        np.testing.assert_allclose(np.asarray(img), 0.25, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mask), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


@pytest.mark.slow
class TestRenderRemat:
    def test_remat_identical_values_and_grads(self):
        """render(remat=True) recomputes per-view pair buffers in the
        backward; values and gradients must match remat=False exactly."""
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(31), 64)
        color_sh = channels[:, :3][..., None]  # degree-0 SH
        args = dict(
            extrinsics=EXTRINSICS[None, None],
            intrinsics=INTRINSICS[None, None],
            near=jnp.full((1, 1), 0.5),
            far=jnp.full((1, 1), 20.0),
            image_shape=(H, W),
            background_color=jnp.zeros((1, 3)),
            gaussian_means=means[None],
            gaussian_covariances=covs[None],
            gaussian_color_sh=color_sh[None],
        )

        def loss(op, remat):
            out = render(gaussian_opacities=op[None], remat=remat, **args)
            return jnp.sum(out.color**2) + jnp.sum(out.mask * out.depth)

        v0, g0 = jax.value_and_grad(lambda o: loss(o, False))(ops)
        v1, g1 = jax.value_and_grad(lambda o: loss(o, True))(ops)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=0, atol=0)


class TestTileRectMask:
    """Pre-expansion ellipse-cull bookkeeping (tiled._tile_rects): counts
    must equal the survivor-mask popcount, survivors must be a subset of
    the bounding rect, and every pixel of a culled tile must be provably
    below the compositor's alpha threshold."""

    def test_counts_match_mask_and_cull_is_sound(self):
        from latentsplat_tpu.ops.rasterize.tiled import TILE, _tile_rects

        n = 256
        means, covs, ops, channels = make_gaussians(jax.random.PRNGKey(31), n)
        sg = project(means, covs, ops, channels)
        tiles_x, tiles_y = W // TILE, H // TILE
        cap = 9
        counts, base, nx, mask = map(
            np.asarray, _tile_rects(sg, tiles_x, tiles_y, cap)
        )
        alive = np.asarray(sg.radius) > 0.0
        mean2d = np.asarray(sg.mean2d)
        conic = np.asarray(sg.conic)
        op = np.asarray(sg.opacity)
        # Reconstruct the rect's row count (not returned by _tile_rects)
        # from the same extent formula, so the culled-slot loop below only
        # visits slots that were genuinely inside the rect: slots past
        # nx*ny are rect-truncated (never ellipse-culled) and the
        # sub-threshold assertion does not apply to them.
        ext = np.asarray(sg.extent) if sg.extent is not None else np.stack(
            [np.asarray(sg.radius)] * 2, axis=-1
        )
        ty0 = np.clip(
            np.floor((mean2d[:, 1] - ext[:, 1]) / TILE), 0, tiles_y - 1
        ).astype(np.int64)
        ty1 = np.clip(
            np.floor((mean2d[:, 1] + ext[:, 1]) / TILE), 0, tiles_y - 1
        ).astype(np.int64)
        ny = ty1 - ty0 + 1

        assert (counts >= 1).all()
        popcnt = np.array([bin(int(m)).count("1") for m in mask])
        np.testing.assert_array_equal(counts, popcnt)

        num_tiles = tiles_x * tiles_y
        for i in range(n):
            if not alive[i] or base[i] == num_tiles:
                assert mask[i] == 1 and counts[i] == 1
                continue
            for s in range(cap):
                if not (mask[i] >> s) & 1:
                    continue
                row, col = s // nx[i], s % nx[i]
                tile = base[i] + row * tiles_x + col
                assert 0 <= tile < num_tiles
                # Every surviving slot lies inside the clamped rect.
                assert col < nx[i]
            # Culled rect slots: per-pixel alpha strictly below 1/255.
            for s in range(min(int(nx[i] * ny[i]), cap)):
                if (mask[i] >> s) & 1:
                    continue
                row, col = s // nx[i], s % nx[i]
                tile = base[i] + row * tiles_x + col
                assert tile < num_tiles
                ty, tx = tile // tiles_x, tile % tiles_x
                px, py = np.meshgrid(
                    tx * TILE + np.arange(TILE), ty * TILE + np.arange(TILE)
                )
                dx = px - mean2d[i, 0]
                dy = py - mean2d[i, 1]
                q = (
                    0.5 * conic[i, 0] * dx * dx
                    + 0.5 * conic[i, 2] * dy * dy
                    + conic[i, 1] * dx * dy
                )
                alpha = op[i] * np.exp(-q)
                assert (alpha < 1.0 / 255.0).all()
