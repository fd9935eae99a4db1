"""Real spherical harmonics: evaluation and rotation (pure jnp).

Basis convention matches the reference's hardcoded polynomials
(src/misc/sh_utils.py:42-97): the standard 3DGS/PlenOctrees real SH basis
with direction components permuted (x,y,z) -> (z,x,y), which is the
convention e3nn's Wigner-D matrices act on. Degrees 0..4 supported.

TPU-first design decisions:
  * Evaluation builds the full basis stack once and contracts it with the
    coefficients via einsum, so per-channel evaluation is one MXU-friendly
    contraction instead of 25 scalar FMAs.
  * Rotation does NOT port e3nn's Euler-angle Wigner-D path
    (src/misc/sh_utils.py:100-120, matrix_to_angles + wigner_D): Euler
    extraction is branchy and gimbal-prone under jit. Instead the per-degree
    rotation matrix is recovered numerically: for fixed, well-conditioned
    sample directions D the basis matrix B = basis_l(D) has a precomputed
    pseudo-inverse, and for a rotation R the coefficient transform is
    c' = B^+ @ basis_l(R^T D) @ c. This is exact for band-limited functions,
    fully vectorized, and differentiable. Equivariance is unit-tested:
    eval(rotate(c, R), R @ d) == eval(c, d).
"""

from __future__ import annotations

from math import isqrt

import jax.numpy as jnp
import numpy as np

# Normalization constants of the real SH basis (standard values, also listed
# at src/misc/sh_utils.py:10-39).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396]
_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435]
_C4 = [2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761]


def _sh_basis_impl(dirs, degree: int, xp):
    """Backend-generic (numpy or jnp) SH basis evaluation."""
    assert 0 <= degree <= 4
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = xp.ones_like(x)
    out = [_C0 * one]
    if degree >= 1:
        out += [-_C1 * x, _C1 * y, -_C1 * z]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xz,
            _C2[1] * xy,
            _C2[2] * (2.0 * yy - zz - xx),
            _C2[3] * yz,
            _C2[4] * (zz - xx),
        ]
    if degree >= 3:
        out += [
            _C3[0] * x * (3 * zz - xx),
            _C3[1] * xz * y,
            _C3[2] * x * (4 * yy - zz - xx),
            _C3[3] * y * (2 * yy - 3 * zz - 3 * xx),
            _C3[4] * z * (4 * yy - zz - xx),
            # NOTE deliberate fix vs the reference: src/misc/sh_utils.py:84
            # has z*(zz - xx) here, which breaks basis orthonormality (its
            # permutation of the standard basis should read y*(zz - xx)).
            # A non-orthonormal basis is not rotation-closed, so the
            # reference's own Wigner-D rotation is subtly wrong for l=3.
            _C3[5] * y * (zz - xx),
            _C3[6] * z * (zz - 3 * xx),
        ]
    if degree >= 4:
        out += [
            _C4[0] * xz * (zz - xx),
            _C4[1] * xy * (3 * zz - xx),
            _C4[2] * xz * (7 * yy - 1),
            _C4[3] * xy * (7 * yy - 3),
            _C4[4] * (yy * (35 * yy - 30) + 3),
            _C4[5] * yz * (7 * yy - 3),
            _C4[6] * (zz - xx) * (7 * yy - 1),
            _C4[7] * yz * (zz - 3 * xx),
            _C4[8] * (zz * (zz - 3 * xx) - xx * (3 * zz - xx)),
        ]
    return xp.stack(out, axis=-1)


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the real SH basis functions at unit directions.

    Args:
      dirs: (..., 3) unit directions.
      degree: max SH degree in [0, 4].

    Returns:
      (..., (degree+1)**2) basis values b_i(d) such that
      eval_sh(sh, d) == einsum(sh, basis).
    """
    return _sh_basis_impl(dirs, degree, jnp)


def eval_sh(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions. Parity: src/misc/sh_utils.py:42-97.

    Args:
      degree: SH degree in [0, 4].
      sh: (..., C, n_coeffs) with n_coeffs >= (degree+1)**2.
      dirs: (..., 3) unit directions (broadcast against sh's batch dims).

    Returns:
      (..., C).
    """
    coeff = (degree + 1) ** 2
    assert sh.shape[-1] >= coeff
    basis = sh_basis(dirs, degree)
    return jnp.einsum("...cn,...n->...c", sh[..., :coeff], basis)


def _rotation_sample_dirs(degree: int) -> np.ndarray:
    """Fixed, deterministic unit sample directions for degree `degree`.

    2*(2l+1) generic directions give a well-conditioned basis matrix.
    """
    n = 2 * (2 * degree + 1)
    rng = np.random.RandomState(1234 + degree)
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float64)


def _basis_np(dirs: np.ndarray, degree: int) -> np.ndarray:
    """numpy double-precision twin of sh_basis (used only at import time)."""
    return _sh_basis_impl(np.asarray(dirs, np.float64), degree, np)


# Precomputed per-degree: (sample dirs [K,3], pinv(B) [2l+1, K]) where
# B[k, i] = b_i(d_k) restricted to that degree's coefficients.
_ROT_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _rotation_constants(degree: int) -> tuple[np.ndarray, np.ndarray]:
    if degree not in _ROT_CACHE:
        dirs = _rotation_sample_dirs(degree)
        lo, hi = degree**2, (degree + 1) ** 2
        full = _basis_np(dirs, degree)
        b = full[:, lo:hi]
        _ROT_CACHE[degree] = (dirs, np.linalg.pinv(b))
    return _ROT_CACHE[degree]


def sh_rotation_matrix(rotations: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Per-degree SH coefficient rotation matrix M^T with c' = M^T c.

    For a rotation R, the rotated function f'(d) = f(R^T d) has coefficients
    c'_j = sum_i M_ij c_i where b_i(R^T d) = sum_j M_ij b_j(d). Solved from
    samples: M^T = B^+ @ B_R^T with B_R[k, i] = b_i(R^T d_k).

    Args:
      rotations: (..., 3, 3).
      degree: single band index l.

    Returns:
      (..., 2l+1, 2l+1) matrix to left-multiply coefficients of band l.
    """
    dirs_np, pinv_np = _rotation_constants(degree)
    dirs = jnp.asarray(dirs_np, dtype=rotations.dtype)
    pinv = jnp.asarray(pinv_np, dtype=rotations.dtype)
    # R^T d for every sample direction: (..., K, 3).
    rotated = jnp.einsum("...ji,kj->...ki", rotations, dirs)
    lo, hi = degree**2, (degree + 1) ** 2
    b_r = sh_basis(rotated, degree)[..., lo:hi]  # (..., K, 2l+1)
    return jnp.einsum("mk,...ki->...mi", pinv, b_r)


def rotate_sh(sh_coefficients: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """Rotate SH coefficients by rotation matrices.

    Semantics match src/misc/sh_utils.py:100-120 (rotate the represented
    function by R): eval(rotate_sh(c, R), R @ d) == eval(c, d).

    Args:
      sh_coefficients: (..., n) with n a perfect square <= 25.
      rotations: (..., 3, 3), broadcastable against the coefficients.

    Returns:
      (..., n) rotated coefficients.
    """
    n = sh_coefficients.shape[-1]
    max_degree = isqrt(n)
    assert max_degree * max_degree == n, "coefficient count must be a square"
    parts = []
    for degree in range(max_degree):
        lo, hi = degree**2, (degree + 1) ** 2
        if degree == 0:
            parts.append(sh_coefficients[..., lo:hi])
            continue
        m_t = sh_rotation_matrix(rotations, degree)
        parts.append(
            jnp.einsum("...mi,...i->...m", m_t, sh_coefficients[..., lo:hi])
        )
    return jnp.concatenate(parts, axis=-1)
