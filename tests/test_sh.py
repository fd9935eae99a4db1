"""SH evaluation and rotation tests (SURVEY.md §4 item (c))."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from latentsplat_tpu.ops.sh import eval_sh, rotate_sh, sh_basis


def random_dirs(key, n):
    d = jax.random.normal(key, (n, 3))
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_degree0_constant():
    sh = jnp.ones((1, 1))
    dirs = random_dirs(jax.random.PRNGKey(0), 16)
    vals = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(np.asarray(vals), 0.28209479, atol=1e-6)


def test_basis_orthonormality():
    # Monte-Carlo check: int b_i b_j dOmega = delta_ij.
    key = jax.random.PRNGKey(1)
    dirs = random_dirs(key, 200_000)
    basis = sh_basis(dirs, 3)  # (N, 16)
    gram = (basis.T @ basis) / dirs.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(np.asarray(gram), np.eye(16), atol=0.15)


def test_rotate_identity():
    key = jax.random.PRNGKey(2)
    sh = jax.random.normal(key, (25,))
    out = rotate_sh(sh, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(sh), atol=1e-4)


def test_rotation_equivariance_all_degrees():
    # eval(rotate_sh(c, R), R @ d) == eval(c, d)
    key = jax.random.PRNGKey(3)
    for deg in [1, 2, 3, 4]:
        n = (deg + 1) ** 2
        c = jax.random.normal(jax.random.fold_in(key, deg), (1, n))
        rot = jnp.asarray(
            R.from_euler("xyz", [0.3, -1.1, 2.4]).as_matrix(), jnp.float32
        )
        dirs = random_dirs(jax.random.fold_in(key, 100 + deg), 64)
        c_rot = rotate_sh(c, rot)
        lhs = eval_sh(deg, c_rot[None], jnp.einsum("ij,nj->ni", rot, dirs))
        rhs = eval_sh(deg, c[None], dirs)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-4)


def test_rotation_composition():
    key = jax.random.PRNGKey(4)
    c = jax.random.normal(key, (9,))
    r1 = jnp.asarray(R.from_euler("z", 0.7).as_matrix(), jnp.float32)
    r2 = jnp.asarray(R.from_euler("x", -0.4).as_matrix(), jnp.float32)
    once = rotate_sh(rotate_sh(c, r1), r2)
    combined = rotate_sh(c, r2 @ r1)
    np.testing.assert_allclose(np.asarray(once), np.asarray(combined), atol=2e-4)


def test_rotate_batched_broadcast():
    key = jax.random.PRNGKey(5)
    c = jax.random.normal(key, (2, 4, 9))
    rots = jnp.stack(
        [
            jnp.asarray(R.from_euler("y", a).as_matrix(), jnp.float32)
            for a in [0.1, 0.9]
        ]
    )[:, None]  # (2, 1, 3, 3)
    out = rotate_sh(c, rots)
    assert out.shape == (2, 4, 9)
    ref0 = rotate_sh(c[0, 0], rots[0, 0])
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(ref0), atol=1e-5)
