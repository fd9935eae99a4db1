"""View-parallel rendering over a device mesh.

Test-time and serving workloads render many target views of one scene
(ref model_wrapper.py:542-550 loops a CUDA launch per view on one GPU).
Views are embarrassingly parallel and the Gaussian payload is shared, so
the TPU-native scale-out shards the VIEW axis over the mesh with
`shard_map` — each device renders its view shard against replicated
Gaussians; no collectives are needed until the host gathers the images.

This composes with data parallelism: a (data, view) 2D mesh shards scenes
over one axis and each scene's views over the other.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.rasterize import render
from .mesh import DATA_AXIS


def make_view_parallel_render(
    mesh: Mesh,
    image_shape: tuple[int, int],
    axis_name: str = DATA_AXIS,
    **render_kwargs,
):
    """Returns render_fn(camera_batch, gaussians_batch) -> RenderOutput
    with the view axis (axis 1 of the camera arrays) sharded over
    `axis_name` and the gaussians replicated.

    camera_batch: dict(extrinsics (B,V,4,4), intrinsics (B,V,3,3),
                       near (B,V), far (B,V))
    gaussians_batch: dict(background_color (B,3), gaussian_means (B,G,3),
                          gaussian_covariances, gaussian_opacities,
                          gaussian_color_sh, gaussian_feature_sh)
    V must be divisible by the mesh axis size.
    """
    cam_spec = {k: P(None, axis_name) for k in
                ("extrinsics", "intrinsics", "near", "far")}
    gauss_spec = {
        "background_color": P(), "gaussian_means": P(),
        "gaussian_covariances": P(), "gaussian_opacities": P(),
        "gaussian_color_sh": P(), "gaussian_feature_sh": P(),
    }
    out_spec = jax.tree_util.tree_map(
        lambda _: P(None, axis_name), _output_structure()
    )

    def local_render(cams, gauss):
        gauss = {k: v for k, v in gauss.items()}
        return render(
            cams["extrinsics"], cams["intrinsics"],
            cams["near"], cams["far"],
            image_shape, **gauss, **render_kwargs,
        )

    sharded = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(cam_spec, gauss_spec), out_specs=out_spec,
        check_vma=False,
    )
    return jax.jit(sharded)


def _output_structure():
    """Pytree skeleton of RenderOutput (color, feature, mask, depth,
    pairs_dropped)."""
    from ..ops.rasterize.types import RenderOutput

    return RenderOutput(color=0, feature=0, mask=0, depth=0, pairs_dropped=0)
