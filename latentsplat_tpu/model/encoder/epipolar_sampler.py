"""Epipolar feature sampling (pure jnp).

Parity with reference src/model/encoder/epipolar/epipolar_sampler.py:30-167:
for each ordered view pair, per-pixel rays are projected onto the other
view, `num_samples` equally spaced points along the clipped epipolar segment
are bilinearly sampled from the other view's feature map, and invalid rays
(no image overlap) are zeroed. The heterogeneous-index "transpose trick"
(epipolar_sampler.py:91-109) is kept so each view's feature map is sampled
once instead of being duplicated per pair.

No learnable parameters -> plain functions, not a linen module.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry import get_world_rays, project_rays, sample_image_grid
from ...misc.heterogeneous_pairings import (
    generate_heterogeneous_index,
    generate_heterogeneous_index_transpose,
)
# grid_sample_2d (gather form): measured on-chip, XLA lowers it to the
# same one-hot-matmul program as the explicit grid_sample_2d_mxu at this
# shape (bit-identical, same time), while the explicit blocked indicators
# cost ~222 MB extra HBM in the 256px b2 training graph (OOM at 15.96/15.75G).
from ...ops.grid_sample import grid_sample_2d


class EpipolarSampling(NamedTuple):
    features: jnp.ndarray        # (b, v, ov, ray, sample, c)
    valid: jnp.ndarray           # (b, v, ov, ray) bool
    xy_ray: jnp.ndarray          # (b, v, ray, 2)
    xy_sample: jnp.ndarray       # (b, v, ov, ray, sample, 2)
    xy_sample_near: jnp.ndarray  # (b, v, ov, ray, sample, 2)
    xy_sample_far: jnp.ndarray   # (b, v, ov, ray, sample, 2)
    origins: jnp.ndarray         # (b, v, ray, 3)
    directions: jnp.ndarray      # (b, v, ray, 3)


def _transpose_pairs(x: jnp.ndarray, t_v: np.ndarray, t_ov: np.ndarray) -> jnp.ndarray:
    """Swap which of (view, other_view) indexes the sampling view."""
    return x[:, t_v, t_ov]


def _collect(x: jnp.ndarray, index_v: np.ndarray) -> jnp.ndarray:
    """(b, v, ...) -> (b, v, v-1, ...) selecting all other views per view."""
    return x[:, index_v]


def sample_epipolar_features(
    features: jnp.ndarray,     # (b, v, h, w, c)
    extrinsics: jnp.ndarray,   # (b, v, 4, 4)
    intrinsics: jnp.ndarray,   # (b, v, 3, 3)
    near: jnp.ndarray,         # (b, v)
    far: jnp.ndarray,          # (b, v)
    num_samples: int,
) -> EpipolarSampling:
    b, v, h, w, c = features.shape
    _, index_v = generate_heterogeneous_index(v)
    t_v, t_ov = generate_heterogeneous_index_transpose(v)

    # Per-pixel world rays for every view.
    xy, _ = sample_image_grid((h, w))
    xy_flat = xy.reshape(-1, 2)                          # (r, 2)
    origins, directions = get_world_rays(
        xy_flat[None, None],                              # (1, 1, r, 2)
        extrinsics[:, :, None],                           # (b, v, 1, 4, 4)
        intrinsics[:, :, None],
    )                                                     # (b, v, r, 3)

    projection = project_rays(
        origins[:, :, None],                              # (b, v, 1, r, 3)
        directions[:, :, None],
        _collect(extrinsics, index_v)[:, :, :, None],     # (b, v, ov, 1, 4, 4)
        _collect(intrinsics, index_v)[:, :, :, None],
        near=near[:, :, None, None],
        far=far[:, :, None, None],
    )

    s = num_samples
    sample_depth = ((jnp.arange(s, dtype=jnp.float32) + 0.5) / s)[:, None]  # (s, 1)
    overlaps = projection["overlaps_image"]
    xy_min = jnp.nan_to_num(projection["xy_min"], posinf=0.0, neginf=0.0)
    xy_min = xy_min * overlaps[..., None]
    xy_max = jnp.nan_to_num(projection["xy_max"], posinf=0.0, neginf=0.0)
    xy_max = xy_max * overlaps[..., None]
    xy_min = xy_min[..., None, :]                         # (b, v, ov, r, 1, 2)
    xy_max = xy_max[..., None, :]
    xy_sample = xy_min + sample_depth * (xy_max - xy_min)

    # Transpose so the view axis indexes the view samples are drawn FROM,
    # sample every view's own feature map once, then transpose back.
    samples_xy = _transpose_pairs(xy_sample, t_v, t_ov)   # (b, v, ov, r, s, 2)
    coords = 2.0 * samples_xy - 1.0
    sampled = jax.vmap(jax.vmap(grid_sample_2d))(
        features, coords.reshape(b, v, -1, 2)
    )                                                     # (b, v, ov*r*s, c)
    sampled = sampled.reshape(b, v, v - 1, h * w, s, c)
    sampled = _transpose_pairs(sampled, t_v, t_ov)

    sampled = sampled * overlaps[..., None, None]

    half_span = 0.5 / s
    return EpipolarSampling(
        features=sampled,
        valid=overlaps,
        xy_ray=jnp.broadcast_to(xy_flat[None, None], (b, v, h * w, 2)),
        xy_sample=xy_sample,
        xy_sample_near=xy_min + (sample_depth - half_span) * (xy_max - xy_min),
        xy_sample_far=xy_min + (sample_depth + half_span) * (xy_max - xy_min),
        origins=origins,
        directions=directions,
    )
