"""Tiled rasterization: XLA binning + Pallas compositing with custom VJP.

Pipeline (TPU-native replacement for the CUDA rasterizer's
duplicate-with-keys / radix-sort / per-tile-range scheme):

  1. Depth-sort all screen Gaussians once (argsort). A single global depth
     order induces the correct per-pixel compositing order for every tile.
  2. Expand each Gaussian into (tile_id, rank) pairs for the tiles its
     3-sigma rect overlaps, with a static per-Gaussian cap
     (max_tiles_per_gaussian). Invalid slots get a sentinel tile id.
  3. Stable-sort pairs by tile id (stability preserves depth order within a
     tile), compute per-tile segment offsets with searchsorted, and gather
     per-pair attribute rows. The gather is plain jnp, so reverse-mode AD
     gives the per-Gaussian scatter-add of pair gradients for free.
  4. The Pallas kernels (pallas_kernels.py) composite each tile's contiguous
     pair segment. Only that compositing step needs a hand-written VJP.

Gradients flow to mean2d, conic, opacity, channels, and the composited
depth; tile assignment and ordering are (correctly) treated as
non-differentiable, like the CUDA implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pallas_kernels import (
    CHUNK,
    PIX,
    TILE,
    composite_pairs_bwd,
    composite_pairs_fwd,
)
from .types import ScreenGaussians

DEFAULT_MAX_TILES_PER_GAUSSIAN = 9


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def bin_gaussians(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int = DEFAULT_MAX_TILES_PER_GAUSSIAN,
):
    """Build the depth-ordered, tile-sorted pair arrays.

    Returns (attrs_pairs [n_pairs + CHUNK, n_attr], tile_starts
    [num_tiles + 1], valid_pairs [n_pairs + CHUNK] bool).
    """
    h, w = image_shape
    assert h % TILE == 0 and w % TILE == 0, "image dims must be multiples of 16"
    tiles_x = w // TILE
    tiles_y = h // TILE
    num_tiles = tiles_x * tiles_y
    cap = max_tiles_per_gaussian
    g = sg.num_gaussians

    alive = sg.radius > 0.0
    depth_key = jnp.where(alive, sg.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    packed = jnp.concatenate(
        [
            sg.mean2d,
            sg.conic,
            sg.opacity[:, None],
            sg.channels,
            sg.depth[:, None],
        ],
        axis=-1,
    )  # (G, n_attr)
    packed_sorted = packed[order]

    # Tile rects from non-differentiable copies (indices must not carry grads).
    mean_nd = jax.lax.stop_gradient(sg.mean2d[order])
    radius_nd = jax.lax.stop_gradient(sg.radius[order])
    alive_nd = radius_nd > 0.0

    tx0 = jnp.clip(jnp.floor((mean_nd[:, 0] - radius_nd) / TILE), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor((mean_nd[:, 0] + radius_nd) / TILE), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor((mean_nd[:, 1] - radius_nd) / TILE), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor((mean_nd[:, 1] + radius_nd) / TILE), 0, tiles_y - 1)
    tx0 = tx0.astype(jnp.int32)
    tx1 = tx1.astype(jnp.int32)
    ty0 = ty0.astype(jnp.int32)
    ty1 = ty1.astype(jnp.int32)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    n_rect = nx * ny  # may exceed cap for huge splats (then truncated)

    slot = jnp.arange(cap, dtype=jnp.int32)[None, :]  # (1, cap)
    slot_x = slot % nx[:, None]
    slot_y = slot // nx[:, None]
    tile_x = tx0[:, None] + slot_x
    tile_y = ty0[:, None] + slot_y
    valid = (slot < jnp.minimum(n_rect, cap)[:, None]) & alive_nd[:, None]
    tile_id = jnp.where(valid, tile_y * tiles_x + tile_x, num_tiles)

    rank = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[:, None], (g, cap)
    )
    tile_flat = tile_id.reshape(-1)
    rank_flat = rank.reshape(-1)

    tile_sorted, rank_sorted = jax.lax.sort_key_val(
        tile_flat, rank_flat, is_stable=True
    )

    tile_starts = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    attrs_pairs = packed_sorted[rank_sorted]  # differentiable gather
    valid_pairs = tile_sorted < num_tiles

    # Pad so the kernel's fixed-size chunk DMA never reads out of bounds.
    n_attr = attrs_pairs.shape[-1]
    attrs_pairs = jnp.concatenate(
        [attrs_pairs, jnp.zeros((CHUNK, n_attr), jnp.float32)], axis=0
    )
    valid_pairs = jnp.concatenate(
        [valid_pairs, jnp.zeros((CHUNK,), bool)], axis=0
    )
    return attrs_pairs, tile_starts, valid_pairs


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite_pairs(attrs_pairs, tile_starts, valid_pairs, n_ch, tiles_x, tiles_y):
    out_tiles, _ = composite_pairs_fwd(
        attrs_pairs,
        tile_starts,
        n_ch=n_ch,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        interpret=_use_interpret(),
    )
    return out_tiles


def _composite_pairs_fwd_rule(attrs_pairs, tile_starts, valid_pairs, n_ch, tiles_x, tiles_y):
    out_tiles, done = composite_pairs_fwd(
        attrs_pairs,
        tile_starts,
        n_ch=n_ch,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        interpret=_use_interpret(),
    )
    t_final = out_tiles[:, n_ch : n_ch + 1, :]
    return out_tiles, (attrs_pairs, tile_starts, valid_pairs, done, t_final)


def _composite_pairs_bwd_rule(n_ch, tiles_x, tiles_y, residuals, g_tiles):
    attrs_pairs, tile_starts, valid_pairs, done, t_final = residuals
    d_attrs = composite_pairs_bwd(
        attrs_pairs,
        tile_starts,
        done,
        g_tiles,
        t_final,
        n_ch=n_ch,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        interpret=_use_interpret(),
    )
    # Sentinel / padding pairs are never written by any tile program; zero
    # them so the upstream scatter-add stays correct.
    d_attrs = jnp.where(valid_pairs[:, None], d_attrs, 0.0)
    return d_attrs, None, None


_composite_pairs.defvjp(_composite_pairs_fwd_rule, _composite_pairs_bwd_rule)


def composite_tiled(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    background: jnp.ndarray,  # (C,)
    max_tiles_per_gaussian: int = DEFAULT_MAX_TILES_PER_GAUSSIAN,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite one view's screen Gaussians with the tiled Pallas kernel.

    Returns (channels_img (C, H, W), mask (H, W), depth (H, W)) — the same
    contract as `composite_dense`.
    """
    h, w = image_shape
    tiles_x = w // TILE
    tiles_y = h // TILE
    c = sg.num_channels
    n_ch = c + 1  # + expected-depth channel

    attrs_pairs, tile_starts, valid_pairs = bin_gaussians(
        sg, image_shape, max_tiles_per_gaussian
    )
    out_tiles = _composite_pairs(
        attrs_pairs, tile_starts, valid_pairs, n_ch, tiles_x, tiles_y
    )  # (T, n_ch + 1, PIX)

    # Un-tile: (T, row, PIX) -> (row, H, W).
    out = out_tiles.reshape(tiles_y, tiles_x, n_ch + 1, TILE, TILE)
    out = jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(n_ch + 1, h, w)

    channels_img = out[:c]
    depth = out[c]
    t_final = out[c + 1]
    mask = 1.0 - t_final
    channels_img = channels_img + background[:, None, None] * t_final[None]
    return channels_img, mask, depth
