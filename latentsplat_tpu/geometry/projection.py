"""Camera projection / ray geometry (pure jnp).

Behavioral parity with reference src/geometry/projection.py:9-247, rebuilt
as branchless, fully-broadcasting JAX ops (no boolean indexing, no data-
dependent shapes) so everything jits and shards cleanly on TPU.

Conventions (identical to the reference):
  * Extrinsics are OpenCV-style camera-to-world 4x4 matrices.
  * Intrinsics are 3x3, normalized to resolution-independent [0, 1] image
    coordinates (x right, y down).
"""

from __future__ import annotations

import jax.numpy as jnp

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz1. Ref: projection.py:9-13."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz0. Ref: projection.py:16-20."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(xyzw: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., d, d) @ (..., d). Ref: projection.py:23-28."""
    return jnp.einsum("...ij,...j->...i", transformation, xyzw)


def transform_cam2world(xyzw: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(xyzw, extrinsics)


def transform_world2cam(xyzw: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(xyzw, invert_se3(extrinsics))


def invert_se3(extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an SE(3) matrix (..., 4, 4).

    Avoids generic jnp.linalg.inv (LU decomposition) on the hot path; for a
    rigid transform [R|t] the inverse is [R^T | -R^T t].
    """
    rot = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3:]
    rot_inv = jnp.swapaxes(rot, -1, -2)
    t_inv = -rot_inv @ t
    top = jnp.concatenate([rot_inv, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=extrinsics.dtype),
        (*top.shape[:-2], 1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_intrinsics(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a pinhole intrinsics matrix (..., 3, 3).

    Assumes the standard [[fx, s, cx], [0, fy, cy], [0, 0, 1]] layout
    (skew supported).
    """
    fx = intrinsics[..., 0, 0]
    s = intrinsics[..., 0, 1]
    cx = intrinsics[..., 0, 2]
    fy = intrinsics[..., 1, 1]
    cy = intrinsics[..., 1, 2]
    inv_fx = 1.0 / fx
    inv_fy = 1.0 / fy
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([inv_fx, -s * inv_fx * inv_fy, (s * cy - cx * fy) * inv_fx * inv_fy], axis=-1)
    row1 = jnp.stack([zeros, inv_fy, -cy * inv_fy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def project_camera_space(
    points: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _F32_EPS,
    infinity: float = 1e8,
) -> jnp.ndarray:
    """Perspective-divide + intrinsics. Ref: projection.py:47-56."""
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _F32_EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World points -> (xy in [0,1], in_front_of_camera). Ref: projection.py:59-71."""
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front_of_camera = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front_of_camera


def unproject(
    coordinates: jnp.ndarray,
    z: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """2D camera coordinates + z -> camera-space points. Ref: projection.py:74-88."""
    coordinates = homogenize_points(coordinates)
    ray_directions = jnp.einsum(
        "...ij,...j->...i", invert_intrinsics(intrinsics), coordinates
    )
    return ray_directions * z[..., None]


def get_world_rays(
    coordinates: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel world rays (origins, unit directions). Ref: projection.py:91-114."""
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, ...]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center coordinates for an image grid. Ref: projection.py:117-137.

    Returns:
      coordinates: (*shape, dim) float xy in (0, 1), pixel centers.
      indices:     (*shape, dim) int32 ij indices.
    """
    indices = [jnp.arange(length, dtype=jnp.int32) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)
    coordinates = [(idx.astype(jnp.float32) + 0.5) / length for idx, length in zip(indices, shape)]
    coordinates = list(reversed(coordinates))
    coordinates = jnp.stack(jnp.meshgrid(*coordinates, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def _inverse_3x3(matrix: jnp.ndarray, eps: float = 1e-12) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Adjugate-based batched 3x3 inverse: (inverse, |det| > eps mask).

    Chosen over jnp.linalg.inv / lstsq: fully vectorized closed form with
    explicit singularity masking (no LAPACK-style control flow on TPU).
    """
    a = matrix
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    ok = jnp.abs(det) > eps
    safe_det = jnp.where(ok, det, 1.0)
    return adj / safe_det[..., None, None], ok


def intersect_rays(
    origins_x: jnp.ndarray,
    directions_x: jnp.ndarray,
    origins_y: jnp.ndarray,
    directions_y: jnp.ndarray,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> jnp.ndarray:
    """Least-squares intersection point of two rays. Ref: projection.py:176-230.

    Branchless: parallel pairs produce `inf` instead of being filtered out
    (the reference removes them with boolean indexing, which XLA can't do).
    """
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    origins = jnp.stack(
        [jnp.broadcast_to(origins_x, shape), jnp.broadcast_to(origins_y, shape)], axis=0
    )
    directions = jnp.stack(
        [jnp.broadcast_to(directions_x, shape), jnp.broadcast_to(directions_y, shape)],
        axis=0,
    )
    parallel = (
        jnp.einsum("...i,...i->...", directions[0], directions[1]) > 1 - eps
    )

    # Solve sum_i (n_i n_i^T - I) p = sum_i (n_i n_i^T - I) o_i  (least squares
    # point closest to both lines; math ref: projection.py:184,213-225).
    n = jnp.einsum("r...i,r...j->r...ij", directions, directions)
    n = n - jnp.eye(3, dtype=origins.dtype)
    lhs = n.sum(axis=0)
    rhs = jnp.einsum("r...ij,r...j->r...i", n, origins).sum(axis=0)
    lhs_inv, ok = _inverse_3x3(lhs)
    result = jnp.einsum("...ij,...j->...i", lhs_inv, rhs)
    bad = parallel | ~ok
    return jnp.where(bad[..., None], inf, result)


def get_fov(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Horizontal/vertical FOV from normalized intrinsics. Ref: projection.py:233-247."""
    intrinsics_inv = invert_intrinsics(intrinsics)

    def process_vector(vector):
        vector = jnp.asarray(vector, dtype=jnp.float32)
        vector = jnp.einsum("...ij,j->...i", intrinsics_inv, vector)
        return vector / jnp.linalg.norm(vector, axis=-1, keepdims=True)

    left = process_vector([0.0, 0.5, 1.0])
    right = process_vector([1.0, 0.5, 1.0])
    top = process_vector([0.5, 0.0, 1.0])
    bottom = process_vector([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip((left * right).sum(axis=-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip((top * bottom).sum(axis=-1), -1.0, 1.0))
    return jnp.stack((fov_x, fov_y), axis=-1)
