"""Epipolar ray-segment projection (pure jnp, branchless).

Parity with reference src/geometry/epipolar_lines.py:19-292, which is a
minefield of edge cases (behind-camera rays, rays through the camera,
near/far overrides). The reference resolves the four (min-valid, max-valid)
cases with boolean-mask writes (epipolar_lines.py:239-249); here every case
collapses into jnp.where selects so the whole function is one static XLA
graph.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .projection import (
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    invert_se3,
    project_camera_space,
)


def _is_in_bounds(xy: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Inside the normalized [0,1]^2 image plane. Ref: epipolar_lines.py:19-26."""
    return (xy >= -epsilon).all(axis=-1) & (xy <= 1 + epsilon).all(axis=-1)


def _is_in_front_of_camera(xyz: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return xyz[..., -1] > -epsilon


def _is_positive_t(t: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return t > -epsilon


def _intersect_image_coordinate(
    intrinsics: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    dimension: str,
    coordinate_value: float,
) -> dict:
    """Intersection of a camera-space ray's projection with one image border.

    Ref: epipolar_lines.py:55-104. Infinities from zero denominators are
    intentional and handled downstream by the validity masks.
    """
    dim = "xy".index(dimension)
    other_dim = 1 - dim
    fs = intrinsics[..., dim, dim]
    fo = intrinsics[..., other_dim, other_dim]
    cs = intrinsics[..., dim, 2]
    co = intrinsics[..., other_dim, 2]
    os_ = origins[..., dim]
    oo = origins[..., other_dim]
    ds = directions[..., dim]
    do = directions[..., other_dim]
    oz = origins[..., 2]
    dz = directions[..., 2]
    c = (coordinate_value - cs) / fs

    t = (c * oz - os_) / (ds - c * dz)
    coordinate_other = co + (fo * (oo * (c * dz - ds) + do * (os_ - c * oz))) / (
        dz * os_ - ds * oz
    )
    coordinate_same = jnp.full_like(coordinate_other, coordinate_value)
    if other_dim == 0:
        xy = jnp.stack([coordinate_other, coordinate_same], axis=-1)
    else:
        xy = jnp.stack([coordinate_same, coordinate_other], axis=-1)
    xyz = origins + t[..., None] * directions
    # NaNs (0/0) must not poison the comparisons below; they are invalid anyway.
    valid = _is_in_bounds(xy) & _is_in_front_of_camera(xyz) & _is_positive_t(t)
    valid = valid & jnp.isfinite(t)
    return {"t": t, "xy": xy, "valid": valid}


def _compare_projections(intersections: list[dict], reduction: str) -> dict:
    """Select min/max-t among valid candidates. Ref: epipolar_lines.py:107-131."""
    t = jnp.stack([i["t"] for i in intersections], axis=0)
    xy = jnp.stack([i["xy"] for i in intersections], axis=0)
    valid = jnp.stack([i["valid"] for i in intersections], axis=0)

    lowest_priority = jnp.inf if reduction == "min" else -jnp.inf
    t = jnp.where(valid, t, lowest_priority)
    t = jnp.nan_to_num(t, nan=lowest_priority)
    selector = jnp.argmin(t, axis=0) if reduction == "min" else jnp.argmax(t, axis=0)

    reduced = jnp.take_along_axis(t, selector[None], axis=0)[0]
    xy_sel = jnp.take_along_axis(xy, selector[None, ..., None], axis=0)[0]
    valid_sel = jnp.take_along_axis(valid, selector[None], axis=0)[0]
    return {"t": reduced, "xy": xy_sel, "valid": valid_sel}


def _compute_point_projection(
    xyz: jnp.ndarray, t: jnp.ndarray, intrinsics: jnp.ndarray
) -> dict:
    """Ref: epipolar_lines.py:134-144."""
    xy = project_camera_space(xyz, intrinsics)
    valid = _is_in_bounds(xy) & _is_in_front_of_camera(xyz) & _is_positive_t(t)
    return {"t": t, "xy": xy, "valid": valid}


def project_rays(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: Optional[jnp.ndarray] = None,
    far: Optional[jnp.ndarray] = None,
    epsilon: float = 1e-6,
) -> dict:
    """Project world-space ray segments onto another camera's image plane.

    Returns dict(t_min, t_max, xy_min, xy_max, overlaps_image), all batched.
    Ref: epipolar_lines.py:157-251.
    """
    # Rays into the target camera's space.
    world_to_cam = invert_se3(extrinsics)
    origins_h = homogenize_points(origins)
    origins_c = jnp.einsum("...ij,...j->...i", world_to_cam, origins_h)[..., :3]
    directions_h = homogenize_vectors(directions)
    directions_c = jnp.einsum("...ij,...j->...i", world_to_cam, directions_h)[..., :3]

    # Broadcast to the full batch shape once so every candidate agrees.
    shape = jnp.broadcast_shapes(origins_c.shape, directions_c.shape)
    shape_k = jnp.broadcast_shapes(shape[:-1], intrinsics.shape[:-2])
    origins_c = jnp.broadcast_to(origins_c, (*shape_k, 3))
    directions_c = jnp.broadcast_to(directions_c, (*shape_k, 3))
    intrinsics_b = jnp.broadcast_to(intrinsics, (*shape_k, 3, 3))

    frame_intersections = [
        _intersect_image_coordinate(intrinsics_b, origins_c, directions_c, "x", 0.0),
        _intersect_image_coordinate(intrinsics_b, origins_c, directions_c, "x", 1.0),
        _intersect_image_coordinate(intrinsics_b, origins_c, directions_c, "y", 0.0),
        _intersect_image_coordinate(intrinsics_b, origins_c, directions_c, "y", 1.0),
    ]
    frame_min = _compare_projections(frame_intersections, "min")
    frame_max = _compare_projections(frame_intersections, "max")

    if near is None:
        # Projection at zero depth; rays starting at the camera use the
        # direction instead (ref: epipolar_lines.py:185-202).
        mask_depth_zero = origins_c[..., -1] < epsilon
        mask_at_camera = jnp.linalg.norm(origins_c, axis=-1) < epsilon
        origins_for_projection = jnp.where(
            mask_at_camera[..., None], directions_c, origins_c
        )
        projection_at_zero = _compute_point_projection(
            origins_for_projection,
            jnp.zeros_like(frame_min["t"]),
            intrinsics_b,
        )
        projection_at_zero["valid"] = projection_at_zero["valid"] & ~(
            mask_depth_zero & ~mask_at_camera
        )
    else:
        near_b = jnp.broadcast_to(near, frame_min["t"].shape)
        projection_at_zero = _compute_point_projection(
            origins_c + near_b[..., None] * directions_c, near_b, intrinsics_b
        )

    if far is None:
        # Projection at infinite depth == projecting the direction vector
        # (ref: epipolar_lines.py:212-220).
        projection_at_infinity = _compute_point_projection(
            directions_c,
            jnp.full_like(frame_min["t"], jnp.inf),
            intrinsics_b,
        )
    else:
        far_b = jnp.broadcast_to(far, frame_min["t"].shape)
        projection_at_infinity = _compute_point_projection(
            origins_c + far_b[..., None] * directions_c, far_b, intrinsics_b
        )

    # Case resolution (ref: epipolar_lines.py:239-249): if the endpoint
    # projection is valid use it, otherwise fall back to the frame border
    # intersection on that side.
    zero_valid = projection_at_zero["valid"]
    inf_valid = projection_at_infinity["valid"]

    def pick(use_endpoint, endpoint, border):
        return {
            "t": jnp.where(use_endpoint, endpoint["t"], border["t"]),
            "xy": jnp.where(use_endpoint[..., None], endpoint["xy"], border["xy"]),
            "valid": jnp.where(use_endpoint, endpoint["valid"], border["valid"]),
        }

    chosen_min = pick(zero_valid, projection_at_zero, frame_min)
    chosen_max = pick(inf_valid, projection_at_infinity, frame_max)

    return {
        "t_min": chosen_min["t"],
        "t_max": chosen_max["t"],
        "xy_min": chosen_min["xy"],
        "xy_max": chosen_max["xy"],
        "overlaps_image": chosen_min["valid"] & chosen_max["valid"],
    }


def lift_to_3d(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    xy: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """3D points on epipolar lines for 2D image points. Ref: epipolar_lines.py:264-277."""
    xy_origins, xy_directions = get_world_rays(xy, extrinsics, intrinsics)
    return intersect_rays(origins, directions, xy_origins, xy_directions)


def get_depth(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    xy: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Depth (distance from ray origin) via triangulation. Ref: epipolar_lines.py:280-292."""
    xyz = lift_to_3d(origins, directions, xy, extrinsics, intrinsics)
    return jnp.linalg.norm(xyz - origins, axis=-1)
