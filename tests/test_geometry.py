"""Geometry core unit tests (SURVEY.md §4 test strategy item (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsplat_tpu.geometry import (
    get_fov,
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    project,
    project_rays,
    sample_image_grid,
    unproject,
)
from latentsplat_tpu.geometry.projection import invert_intrinsics, invert_se3


def make_camera(position, look_at=None):
    """Simple cam-to-world extrinsics: z axis towards look_at."""
    position = np.asarray(position, np.float32)
    look_at = np.asarray(look_at if look_at is not None else [0, 0, 0], np.float32)
    z = look_at - position
    z = z / np.linalg.norm(z)
    up = np.array([0, -1, 0], np.float32)  # y-down convention
    x = np.cross(-up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 0] = x
    ext[:3, 1] = y
    ext[:3, 2] = z
    ext[:3, 3] = position
    return jnp.asarray(ext)


INTRINSICS = jnp.asarray(
    [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], jnp.float32
)


def test_homogenize():
    pts = jnp.ones((2, 3))
    assert homogenize_points(pts).shape == (2, 4)
    assert float(homogenize_points(pts)[0, 3]) == 1.0
    assert float(homogenize_vectors(pts)[0, 3]) == 0.0


def test_invert_se3_matches_inverse():
    ext = make_camera([1.0, 2.0, -3.0])
    np.testing.assert_allclose(
        np.asarray(invert_se3(ext)), np.linalg.inv(np.asarray(ext)), atol=1e-5
    )


def test_invert_intrinsics():
    k = jnp.asarray([[0.8, 0.0, 0.45], [0.0, 1.2, 0.55], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(invert_intrinsics(k)), np.linalg.inv(np.asarray(k)), atol=1e-6
    )


def test_project_unproject_roundtrip():
    ext = make_camera([0.0, 0.0, -2.0])
    xy = jnp.asarray([[0.25, 0.75], [0.5, 0.5]], jnp.float32)
    z = jnp.asarray([1.5, 3.0], jnp.float32)
    cam_points = unproject(xy, z, INTRINSICS)
    world = jnp.einsum("ij,nj->ni", ext, homogenize_points(cam_points))[:, :3]
    xy_back, in_front = project(world, ext, INTRINSICS)
    np.testing.assert_allclose(np.asarray(xy_back), np.asarray(xy), atol=1e-5)
    assert bool(in_front.all())


def test_get_world_rays_units_and_origins():
    ext = make_camera([1.0, -1.0, -4.0])
    xy, _ = sample_image_grid((4, 4))
    origins, directions = get_world_rays(xy.reshape(-1, 2), ext, INTRINSICS)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(directions, axis=-1)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(origins), np.asarray(ext[:3, 3])[None].repeat(16, 0), atol=1e-6
    )


def test_sample_image_grid_centers():
    coords, indices = sample_image_grid((2, 4))
    assert coords.shape == (2, 4, 2)
    # xy order: coords[..., 0] is x (width index), spacing 1/4 starting 1/8.
    np.testing.assert_allclose(np.asarray(coords[0, 0]), [0.125, 0.25], atol=1e-6)
    np.testing.assert_allclose(np.asarray(coords[1, 3]), [0.875, 0.75], atol=1e-6)
    assert indices[1, 3, 0] == 1 and indices[1, 3, 1] == 3


def test_intersect_rays_exact():
    o1 = jnp.asarray([0.0, 0.0, 0.0])
    d1 = jnp.asarray([1.0, 0.0, 0.0])
    o2 = jnp.asarray([2.0, -1.0, 0.0])
    d2 = jnp.asarray([0.0, 1.0, 0.0])
    p = intersect_rays(o1, d1, o2, d2)
    np.testing.assert_allclose(np.asarray(p), [2.0, 0.0, 0.0], atol=1e-4)


def test_intersect_rays_parallel_is_inf():
    o1 = jnp.asarray([0.0, 0.0, 0.0])
    d = jnp.asarray([1.0, 0.0, 0.0])
    o2 = jnp.asarray([0.0, 1.0, 0.0])
    p = intersect_rays(o1, d, o2, d)
    assert np.all(np.asarray(p) >= 1e9)


def test_get_fov_90deg():
    k = jnp.asarray([[0.5, 0.0, 0.5], [0.0, 0.5, 0.5], [0.0, 0.0, 1.0]])[None]
    fov = get_fov(k)
    np.testing.assert_allclose(np.asarray(fov[0]), [np.pi / 2, np.pi / 2], atol=1e-5)


class TestProjectRays:
    def setup_method(self):
        self.cam_a = make_camera([0.0, 0.0, -3.0])
        self.cam_b = make_camera([2.0, 0.0, -3.0])

    def test_overlapping_segment_endpoints_project_correctly(self):
        # Ray through cam A's center pixel.
        origins, directions = get_world_rays(
            jnp.asarray([0.5, 0.5]), self.cam_a, INTRINSICS
        )
        proj = project_rays(origins, directions, self.cam_b, INTRINSICS)
        assert bool(proj["overlaps_image"])
        # Endpoints lie on the projected ray: re-project the 3D points.
        for t_key, xy_key in [("t_min", "xy_min"), ("t_max", "xy_max")]:
            t = proj[t_key]
            if not np.isfinite(float(t)):
                continue
            point = origins + t * directions
            xy, _ = project(point, self.cam_b, INTRINSICS)
            np.testing.assert_allclose(
                np.asarray(xy), np.asarray(proj[xy_key]), atol=1e-4
            )
        assert float(proj["t_min"]) < float(proj["t_max"])

    def test_xy_in_bounds(self):
        xy_grid, _ = sample_image_grid((8, 8))
        origins, directions = get_world_rays(
            xy_grid.reshape(-1, 2), self.cam_a, INTRINSICS
        )
        proj = project_rays(origins, directions, self.cam_b, INTRINSICS)
        overlap = np.asarray(proj["overlaps_image"])
        assert overlap.any()
        xy_min = np.asarray(proj["xy_min"])[overlap]
        xy_max = np.asarray(proj["xy_max"])[overlap]
        assert (xy_min >= -1e-4).all() and (xy_min <= 1 + 1e-4).all()
        assert (xy_max >= -1e-4).all() and (xy_max <= 1 + 1e-4).all()

    def test_near_far_override(self):
        origins, directions = get_world_rays(
            jnp.asarray([0.5, 0.5]), self.cam_a, INTRINSICS
        )
        near = jnp.asarray(1.0)
        far = jnp.asarray(2.0)
        proj = project_rays(
            origins, directions, self.cam_b, INTRINSICS, near=near, far=far
        )
        if bool(proj["overlaps_image"]):
            assert float(proj["t_min"]) >= 1.0 - 1e-5
            assert float(proj["t_max"]) <= 2.0 + 1e-5

    def test_behind_camera_no_overlap(self):
        # Ray pointing directly away from camera B, starting far behind it.
        origins = jnp.asarray([0.0, 0.0, -100.0])
        directions = jnp.asarray([0.0, 0.0, -1.0])
        proj = project_rays(origins, directions, self.cam_b, INTRINSICS)
        assert not bool(proj["overlaps_image"])

    def test_jit_compatible(self):
        origins, directions = get_world_rays(
            jnp.asarray([0.5, 0.5]), self.cam_a, INTRINSICS
        )
        jitted = jax.jit(
            lambda o, d: project_rays(o, d, self.cam_b, INTRINSICS)
        )
        proj = jitted(origins, directions)
        assert bool(proj["overlaps_image"])
