from .projection import (
    get_fov,
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    project,
    project_camera_space,
    sample_image_grid,
    transform_cam2world,
    transform_rigid,
    transform_world2cam,
    unproject,
)
from .epipolar_lines import get_depth, lift_to_3d, project_rays
from .conversions import depth_to_relative_disparity, relative_disparity_to_depth

__all__ = [
    "get_fov",
    "get_world_rays",
    "homogenize_points",
    "homogenize_vectors",
    "intersect_rays",
    "project",
    "project_camera_space",
    "sample_image_grid",
    "transform_cam2world",
    "transform_rigid",
    "transform_world2cam",
    "unproject",
    "get_depth",
    "lift_to_3d",
    "project_rays",
    "depth_to_relative_disparity",
    "relative_disparity_to_depth",
]
