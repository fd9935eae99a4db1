"""Tests for distributions, quaternions, grid sampling (SURVEY.md §4 item (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsplat_tpu.ops import (
    DiagonalGaussian,
    build_covariance,
    gather_discrete_topk,
    grid_sample_2d,
    quaternion_to_matrix,
    sample_discrete_distribution,
)


class TestDiagonalGaussian:
    def test_kl_standard_normal_zero(self):
        d = DiagonalGaussian(jnp.zeros((4,)), jnp.zeros((4,)))
        np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)

    def test_kl_between_distributions(self):
        d = DiagonalGaussian(jnp.ones((3,)), jnp.zeros((3,)))
        same = DiagonalGaussian(jnp.ones((3,)), jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(d.kl(same)), 0.0, atol=1e-6)
        std = DiagonalGaussian(jnp.zeros((3,)), jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(d.kl(std)), 0.5, atol=1e-6)

    def test_degenerate(self):
        d = DiagonalGaussian(jnp.ones((4,)))
        assert np.all(np.asarray(d.sample(jax.random.PRNGKey(0))) == 1.0)
        np.testing.assert_allclose(np.asarray(d.kl()), 0.0)
        np.testing.assert_allclose(np.asarray(d.nll(jnp.zeros((4,)))), 0.0)

    def test_params_roundtrip(self):
        params = jnp.arange(8.0).reshape(2, 4)
        d = DiagonalGaussian.from_params(params, axis=0)
        np.testing.assert_allclose(np.asarray(d.mean), np.arange(4.0)[None])
        np.testing.assert_allclose(np.asarray(d.params(axis=0)), np.asarray(params))

    def test_sample_statistics(self):
        d = DiagonalGaussian(2.0 * jnp.ones((20000,)), jnp.full((20000,), np.log(4.0)))
        s = d.sample(jax.random.PRNGKey(1))
        assert abs(float(s.mean()) - 2.0) < 0.1
        assert abs(float(s.std()) - 2.0) < 0.1

    def test_pytree(self):
        d = DiagonalGaussian(jnp.ones((4,)), jnp.zeros((4,)))
        leaves = jax.tree_util.tree_leaves(d)
        assert len(leaves) == 2
        d2 = jax.tree_util.tree_map(lambda x: x * 2, d)
        assert isinstance(d2, DiagonalGaussian)

    def test_logvar_clamped(self):
        d = DiagonalGaussian(jnp.zeros((2,)), jnp.asarray([-100.0, 100.0]))
        np.testing.assert_allclose(np.asarray(d.logvar), [-30.0, 20.0])

    def test_logvar_clamp_keeps_restoring_gradient(self):
        """Straight-through clamp: the KL gradient wrt a SATURATED raw
        logvar must stay alive (a hard clip zeroes it, which is how the
        observed collapse runs away once logvar hits +20)."""

        def kl_of_raw(raw):
            return jnp.sum(DiagonalGaussian(jnp.zeros((1,)), raw).kl())

        g_sat = float(jax.grad(kl_of_raw)(jnp.asarray([25.0])).squeeze())
        # d KL / d logvar at the clamp value 20 is 0.5*(e^20 - 1) > 0:
        # still pushing DOWN on the raw parameter.
        assert g_sat == pytest.approx(0.5 * (np.exp(20.0) - 1.0), rel=1e-5)
        # Inside the bounds the clamp is exactly the identity in value and
        # gradient (parity with the hard clip / the torch reference).
        g_in = float(jax.grad(kl_of_raw)(jnp.asarray([1.5])).squeeze())
        assert g_in == pytest.approx(0.5 * (np.exp(1.5) - 1.0), rel=1e-5)
        # INFINITE raw logvar (the decoder's log1p(-mask) trick emits -inf
        # at alpha-saturated pixels) must clip to the bound, NOT become NaN
        # (-inf + inf in a naive straight-through form), and its gradient
        # must be finite (0: the clip is saturated).
        d = DiagonalGaussian(jnp.zeros((2,)), jnp.asarray([-np.inf, np.inf]))
        np.testing.assert_allclose(np.asarray(d.logvar), [-30.0, 20.0])
        g_inf = np.asarray(jax.grad(kl_of_raw)(jnp.asarray([-np.inf])))
        assert np.all(np.isfinite(g_inf))


class TestDiscreteSampling:
    def test_topk(self):
        pdf = jnp.asarray([[0.1, 0.5, 0.2, 0.2]])
        idx, dens = gather_discrete_topk(pdf, 2)
        assert int(idx[0, 0]) == 1
        np.testing.assert_allclose(float(dens[0, 0]), 0.5, atol=1e-5)

    def test_sampling_distribution(self):
        pdf = jnp.asarray([0.1, 0.6, 0.3])
        idx, dens = sample_discrete_distribution(
            jax.random.PRNGKey(0), pdf, 50_000
        )
        counts = np.bincount(np.asarray(idx), minlength=3) / 50_000
        np.testing.assert_allclose(counts, [0.1, 0.6, 0.3], atol=0.02)
        # densities are the normalized pdf at the sampled index
        np.testing.assert_allclose(
            np.asarray(dens), np.asarray(pdf)[np.asarray(idx)], atol=1e-5
        )

    def test_batched(self):
        pdf = jnp.stack([jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0])])
        idx, _ = sample_discrete_distribution(jax.random.PRNGKey(2), pdf, 8)
        assert np.all(np.asarray(idx[0]) == 0)
        assert np.all(np.asarray(idx[1]) == 1)


class TestQuaternions:
    def test_identity(self):
        q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(quaternion_to_matrix(q)), np.eye(3), atol=1e-6
        )

    def test_matches_scipy(self):
        from scipy.spatial.transform import Rotation as R

        rng = np.random.RandomState(0)
        q = rng.normal(size=(5, 4)).astype(np.float32)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        ours = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
        theirs = R.from_quat(q).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_covariance_psd_and_eigvals(self):
        scale = jnp.asarray([1.0, 2.0, 3.0])
        q = jnp.asarray([0.3, -0.2, 0.5, 0.8])
        q = q / jnp.linalg.norm(q)
        cov = build_covariance(scale, q)
        eigs = np.sort(np.linalg.eigvalsh(np.asarray(cov)))
        np.testing.assert_allclose(eigs, [1.0, 4.0, 9.0], atol=1e-4)


class TestGridSample:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(3)
        img = rng.normal(size=(6, 5, 4)).astype(np.float32)  # HWC
        coords = rng.uniform(-1.3, 1.3, size=(7, 9, 2)).astype(np.float32)

        ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))
        theirs = F.grid_sample(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            torch.from_numpy(coords)[None],
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_center_exact(self):
        img = jnp.arange(4.0).reshape(2, 2, 1)
        # Center of pixel (0, 0) is at (-0.5, -0.5) in normalized coords.
        out = grid_sample_2d(img, jnp.asarray([[-0.5, -0.5]]))
        np.testing.assert_allclose(np.asarray(out), [[0.0]], atol=1e-6)

    def test_mxu_variant_matches_torch_and_gather(self):
        """grid_sample_2d_mxu (the epipolar sampler's gather-free path):
        torch parity in value, gather parity in gradient — including
        out-of-range coords and a block size that forces padding."""
        import torch
        import torch.nn.functional as F

        from latentsplat_tpu.ops.grid_sample import grid_sample_2d_mxu

        rng = np.random.RandomState(4)
        img = rng.normal(size=(6, 5, 4)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(7, 9, 2)).astype(np.float32)

        ours = np.asarray(
            grid_sample_2d_mxu(jnp.asarray(img), jnp.asarray(coords), block=16)
        )
        theirs = F.grid_sample(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            torch.from_numpy(coords)[None],
            mode="bilinear", padding_mode="zeros", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

        jimg, jc = jnp.asarray(img), jnp.asarray(coords)
        g_gather = jax.grad(
            lambda im: jnp.sum(grid_sample_2d(im, jc) ** 2))(jimg)
        g_mxu = jax.grad(
            lambda im: jnp.sum(grid_sample_2d_mxu(im, jc, block=16) ** 2)
        )(jimg)
        np.testing.assert_allclose(
            np.asarray(g_mxu), np.asarray(g_gather), atol=1e-5
        )
