"""Tiled rasterization: sort-binned pairs + Pallas compositing, custom VJP.

TPU-native replacement for the CUDA rasterizer's duplicate-with-keys /
radix-sort / per-tile-range scheme (`latent-gaussian-rasterization`,
characterized at src/model/decoder/cuda_splatting.py:124-158). The CUDA
structure (per-tile depth-ordered pair segments) is work-optimal and is
kept — but every data-movement step is expressed as a **sort**, the one
reordering primitive that streams on TPU (measured on v5e: lax.sort moves
3.5M elements x 7 payload rows in ~60 ms, while XLA gather/scatter/cumsum
over the same rows serialize at ~3 us/row, i.e. ~10 s).

Pipeline:
  1. Project all gaussians (camera.py, dense XLA).
  2. Depth ranks: argsort depth, invert the permutation with a second sort
     (rank[perm[i]] = i expressed as sorting (perm, iota)).
  3. Expand each gaussian into `cap` tile slots by pure broadcasting
     (gaussian-major, so pair attribute rows are `repeat`s, never gathers);
     compute each pair's composite int32 key = tile << 19 | depth_rank
     (exact: G < 2^19, tiles <= 2^12 fit in 31 bits for <= 4096 tiles).
  4. ONE grouped stable sort pass by the key carries all attribute rows and
     a pair-index iota. Per-tile segment bounds = searchsorted on the keys.
  5. The Pallas kernels composite each tile's contiguous depth-ordered
     segment; segments are unaligned, so chunks are CHUNK-aligned windows
     with in-kernel masking, and the backward accumulates with sequential
     read-modify-write (see pallas_kernels.py).
  6. Backward: pair gradients are stable-sorted by the carried pair index
     (returning them to gaussian-major (G, cap) layout — applying the
     inverse permutation without a gather) and summed over the cap axis.

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
    pad_attr_rows,
)
from .types import ScreenGaussians

DEFAULT_MAX_TILES_PER_GAUSSIAN = 9

# Payload rows per stable sort call. lax.sort compile time grows steeply
# with operand count (17 operands failed to compile in 9 min on v5e, 7
# payloads compile in ~90 s); runtime is insensitive to payload count, so
# larger groups directly cut the number of sort passes.
SORT_GROUP = 7

RANK_BITS = 19  # G < 2^19 gaussians; composite key = tile << RANK_BITS | rank


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _grouped_sort(key: jnp.ndarray, rows: list) -> list:
    """Stable-sort every row by `key` using grouped multi-operand sorts.

    Stability guarantees all groups see the identical permutation even with
    duplicate keys.
    """
    return _grouped_sort_with_key(key, rows)[1]


def _grouped_sort_with_key(key: jnp.ndarray, rows: list):
    """Like _grouped_sort but also returns the sorted key (for free from
    the first group call)."""
    out = []
    sorted_key = None
    for i in range(0, len(rows), SORT_GROUP):
        group = rows[i : i + SORT_GROUP]
        sorted_ops = jax.lax.sort((key, *group), num_keys=1, is_stable=True)
        if sorted_key is None:
            sorted_key = sorted_ops[0]
        out.extend(sorted_ops[1:])
    return sorted_key, out


def _pack_bf16_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 rows -> one f32 row holding their bf16 bit patterns.

    Sorts move payload bits opaquely, so packing halves the payload operand
    count (lax.sort compile time explodes with operand count). Channels
    tolerate bf16 (~0.4% rel err); geometry rows stay f32.
    """
    lo = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo | (hi << 16), jnp.float32)


def _unpack_bf16_pair(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    bits = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (bits & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return a, b


def _depth_ranks(depth_key: jnp.ndarray) -> jnp.ndarray:
    """Exact depth rank per gaussian, computed with two sorts (no scatter)."""
    g = depth_key.shape[0]
    iota = jnp.arange(g, dtype=jnp.int32)
    perm = jax.lax.sort((depth_key, iota), num_keys=1, is_stable=True)[1]
    rank = jax.lax.sort((perm, iota), num_keys=1, is_stable=True)[1]
    return rank


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pair_composite(payload, static):
    """Differentiable core: per-gaussian rows -> tile outputs.

    payload = (rows tuple (G,), tile_slot_ids (G, cap) int32, depth_rank
    (G,) int32); static = (n_ch, tiles_x, tiles_y, g, cap, n_attr). The VJP
    owns the pair sort (forward) and the gradient unsort + cap-reduction
    (backward), keeping slow gather/scatter lowerings out of the graph.
    """
    out, _ = _pair_composite_fwd(payload, static)
    return out


def _pair_composite_fwd(payload, static):
    rows, tile_ids, rank = payload
    n_ch, tiles_x, tiles_y, g, cap, n_attr, pack_channels = static
    num_tiles = tiles_x * tiles_y
    n_pairs = g * cap
    n_pairs_pad = ((n_pairs + CHUNK - 1) // CHUNK) * CHUNK
    n_attr_pad = pad_attr_rows(n_attr)

    # Composite key: invalid slots get tile == num_tiles (sorted past every
    # real segment).
    key = (tile_ids.astype(jnp.int32) << RANK_BITS) | rank[:, None]
    key = key.reshape(-1)

    def pad_pairs(x, fill=0):
        return jnp.pad(x, (0, n_pairs_pad - n_pairs), constant_values=fill)

    key_p = pad_pairs(key, (num_tiles + 1) << RANK_BITS)
    pair_iota = jnp.arange(n_pairs_pad, dtype=jnp.int32)
    # Pair rows by pure replication (gaussian-major: row value repeats cap
    # times consecutively) — broadcasting, not gathering.
    pair_rows = [
        pad_pairs(jnp.broadcast_to(r[:, None], (g, cap)).reshape(-1))
        for r in rows
    ]

    if pack_channels:
        # Geometry rows (x, y, conic, opacity) ride the sort in f32; channel
        # rows are packed two-per-operand as bf16 bit patterns to cut the
        # sort call count (unpacked right after — the kernel still sees
        # f32). Mixed precision: channels quantize to bf16 (~0.4% rel).
        n_geo = 6
        geo_rows = pair_rows[:n_geo]
        chan_rows = pair_rows[n_geo:]
        if len(chan_rows) % 2:
            chan_rows = chan_rows + [jnp.zeros_like(chan_rows[0])]
        packed_rows = [
            _pack_bf16_pair(chan_rows[i], chan_rows[i + 1])
            for i in range(0, len(chan_rows), 2)
        ]
        sorted_keys, sorted_all = _grouped_sort_with_key(
            key_p, [pair_iota] + geo_rows + packed_rows
        )
        pair_perm = sorted_all[0]
        sorted_rows = list(sorted_all[1 : 1 + n_geo])
        for packed in sorted_all[1 + n_geo :]:
            a, b2 = _unpack_bf16_pair(packed)
            sorted_rows.extend([a, b2])
        sorted_rows = sorted_rows[:n_attr]
    else:
        sorted_keys, sorted_all = _grouped_sort_with_key(
            key_p, [pair_iota] + pair_rows
        )
        pair_perm = sorted_all[0]
        sorted_rows = sorted_all[1 : 1 + n_attr]

    attrs_pairs = jnp.zeros((n_attr_pad, n_pairs_pad), jnp.float32)
    attrs_pairs = attrs_pairs.at[:n_attr].set(jnp.stack(sorted_rows))

    tile_starts = jnp.searchsorted(
        sorted_keys,
        (jnp.arange(num_tiles + 1, dtype=jnp.int32) << RANK_BITS),
        side="left",
    ).astype(jnp.int32)

    out_tiles, done = composite_pairs_fwd(
        attrs_pairs, tile_starts,
        n_ch=n_ch, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=_use_interpret(),
    )
    t_final = out_tiles[:, n_ch : n_ch + 1, :]
    residuals = (attrs_pairs, tile_starts, pair_perm, done, t_final)
    return out_tiles, residuals


def _pair_composite_bwd(static, residuals, g_tiles):
    n_ch, tiles_x, tiles_y, g, cap, n_attr, pack_channels = static
    attrs_pairs, tile_starts, pair_perm, done, t_final = residuals
    d_pairs = composite_pairs_bwd(
        attrs_pairs, tile_starts, done, g_tiles, t_final,
        n_ch=n_ch, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=_use_interpret(),
    )
    # Unsort: stable-sorting gradient rows keyed by the carried pair index
    # applies the inverse permutation (no gather); then gaussian-major
    # (G, cap) reduction replaces the scatter-add.
    d_rows = [d_pairs[i] for i in range(n_attr)]
    unsorted = _grouped_sort(pair_perm, d_rows)
    n_pairs = g * cap
    d_rows_orig = tuple(
        u[:n_pairs].reshape(g, cap).sum(axis=1) for u in unsorted
    )
    d_tile_ids = jnp.zeros((g, cap), jnp.int32)
    d_rank = jnp.zeros((g,), jnp.int32)
    return ((d_rows_orig, d_tile_ids, d_rank),)


_pair_composite.defvjp(_pair_composite_fwd, _pair_composite_bwd)


def composite_tiled(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    background: jnp.ndarray,  # (C,)
    max_tiles_per_gaussian: int = DEFAULT_MAX_TILES_PER_GAUSSIAN,
    pack_channels: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite one view's screen Gaussians with the tiled Pallas kernel.

    Returns (channels_img (C, H, W), mask (H, W), depth (H, W)) — the same
    contract as `composite_dense`.
    """
    h, w = image_shape
    assert h % TILE == 0 and w % TILE == 0, "image dims must be multiples of 16"
    tiles_x = w // TILE
    tiles_y = h // TILE
    num_tiles = tiles_x * tiles_y
    c = sg.num_channels
    n_ch = c + 1  # + expected-depth channel
    g = sg.num_gaussians
    cap = max_tiles_per_gaussian
    assert g < (1 << RANK_BITS), "gaussian count exceeds the rank-key budget"
    assert num_tiles << RANK_BITS < (1 << 31), "too many tiles for int32 keys"

    alive = sg.radius > 0.0
    depth_key = jnp.where(alive, sg.depth, jnp.inf)
    rank = _depth_ranks(depth_key)

    # Tile rects from non-differentiable copies (indices carry no grads).
    mean_nd = jax.lax.stop_gradient(sg.mean2d)
    radius_nd = jax.lax.stop_gradient(sg.radius)
    tx0 = jnp.clip(jnp.floor((mean_nd[:, 0] - radius_nd) / TILE), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor((mean_nd[:, 0] + radius_nd) / TILE), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor((mean_nd[:, 1] - radius_nd) / TILE), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor((mean_nd[:, 1] + radius_nd) / TILE), 0, tiles_y - 1)
    tx0, tx1 = tx0.astype(jnp.int32), tx1.astype(jnp.int32)
    ty0, ty1 = ty0.astype(jnp.int32), ty1.astype(jnp.int32)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    n_rect = nx * ny  # may exceed cap for huge splats (then truncated)

    slot = jnp.arange(cap, dtype=jnp.int32)[None, :]
    slot_x = slot % nx[:, None]
    slot_y = slot // nx[:, None]
    tile_x = tx0[:, None] + slot_x
    tile_y = ty0[:, None] + slot_y
    valid = (slot < jnp.minimum(n_rect, cap)[:, None]) & alive[:, None]
    tile_ids = jnp.where(valid, tile_y * tiles_x + tile_x, num_tiles)

    rows = tuple(
        [
            sg.mean2d[:, 0],
            sg.mean2d[:, 1],
            sg.conic[:, 0],
            sg.conic[:, 1],
            sg.conic[:, 2],
            sg.opacity,
        ]
        + [sg.channels[:, i] for i in range(c)]
        + [sg.depth]
    )

    out_tiles = _pair_composite(
        (rows, tile_ids, rank),
        (n_ch, tiles_x, tiles_y, g, cap, len(rows), pack_channels),
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
