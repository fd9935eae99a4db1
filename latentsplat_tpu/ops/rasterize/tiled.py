"""Tiled rasterization: depth-sorted chunk scan with in-kernel tile culling.

TPU-native replacement for the CUDA rasterizer's duplicate-with-keys /
radix-sort / per-tile-range scheme (`latent-gaussian-rasterization`,
characterized at src/model/decoder/cuda_splatting.py:124-158). Measured
constraints drove the design (see pallas_kernels.py): XLA gathers/scatters
over millions of rows serialize on TPU (~3 us/row), while `lax.sort` is
fast (~60 ms @ 393k) — so the only data reordering is depth sorting, done
as grouped stable multi-operand sorts (payload rides the sort network;
variadic sorts beyond ~6 operands explode XLA compile time, hence groups).

Pipeline:
  1. Project all gaussians (camera.py, dense XLA).
  2. Depth-sort the per-gaussian attribute rows with grouped stable sorts
     keyed on camera depth (dead gaussians sink to the end with key=+inf).
     An iota payload records the permutation for the backward unsort.
  3. Precompute per-chunk (128 gaussians) tile-space bounding boxes —
     pure reshape+reduce, no gather.
  4. The Pallas kernel scans the shared depth-sorted matrix per tile,
     skipping chunks whose bbox misses the tile (scalar test on SMEM
     arrays), compositing hits front-to-back. No pair expansion, no
     scatter, no per-tile segments.
  5. Backward replays the same chunks per tile and ACCUMULATES per-gaussian
     gradients (sequential-grid read-modify-write — the TPU's atomicAdd);
     gradients are unsorted back with the same grouped-sort trick keyed on
     the recorded permutation (applying a permutation == stable-sorting by
     its inverse rank, avoiding the slow gather).

Gradients flow to mean2d, conic, opacity, and channels; tile assignment,
ordering, and the radius are (correctly) treated as non-differentiable,
like the CUDA implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pallas_kernels import (
    CHUNK,
    PIX,
    TILE,
    composite_scan_bwd,
    composite_scan_fwd,
    pad_attr_rows,
)
from .types import ScreenGaussians

# Payload rows per stable sort call. lax.sort compile time grows steeply
# with operand count (17 operands failed to compile in 9 min on v5e); 3-4
# payload rows per call compiles in ~30 s and runs ~120 ms @ 393k.
SORT_GROUP = 3


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _grouped_sort(key: jnp.ndarray, rows: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """Stable-sort every row by `key` using grouped multi-operand sorts.

    Stability guarantees all groups see the identical permutation even with
    duplicate keys.
    """
    out = []
    for i in range(0, len(rows), SORT_GROUP):
        group = rows[i : i + SORT_GROUP]
        sorted_ops = jax.lax.sort((key, *group), num_keys=1, is_stable=True)
        out.extend(sorted_ops[1:])
    return out


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sorted_composite(payload, static):
    """Differentiable core: (rows, key) -> tile outputs.

    payload = (rows tuple, key, radius); static = (n_ch, tiles_x, tiles_y,
    g, n_attr). The VJP owns both the depth sort (forward) and the
    gradient unsort (backward), keeping the slow gather/scatter lowering
    out of the graph entirely.
    """
    out, _ = _sorted_composite_fwd(payload, static)
    return out


def _sorted_composite_fwd(payload, static):
    rows, key, radius = payload
    n_ch, tiles_x, tiles_y, g, n_attr_static = static
    g = rows[0].shape[0]
    g_pad = ((g + CHUNK - 1) // CHUNK) * CHUNK
    n_attr = len(rows)
    n_attr_pad = pad_attr_rows(n_attr)

    def pad(x, fill=0.0):
        return jnp.pad(x, (0, g_pad - g), constant_values=fill)

    key_p = pad(key, jnp.inf)
    iota = jnp.arange(g_pad, dtype=jnp.int32)
    perm = jax.lax.sort((key_p, iota), num_keys=1, is_stable=True)[1]
    sorted_rows = _grouped_sort(key_p, [pad(r) for r in rows])
    radius_sorted = _grouped_sort(key_p, [pad(radius)])[0]

    attrs_sorted = jnp.zeros((n_attr_pad, g_pad), jnp.float32)
    attrs_sorted = attrs_sorted.at[:n_attr].set(jnp.stack(sorted_rows))

    n_alive = jnp.sum(jnp.isfinite(key)).astype(jnp.int32)

    # Chunk bboxes in tile coords (reshape + reduce).
    x_s = sorted_rows[0].reshape(-1, CHUNK)
    y_s = sorted_rows[1].reshape(-1, CHUNK)
    r_s = radius_sorted.reshape(-1, CHUNK)
    live = r_s > 0.0
    big = 1.0e9
    x0 = jnp.where(live, x_s - r_s, big).min(axis=1)
    x1 = jnp.where(live, x_s + r_s, -big).max(axis=1)
    y0 = jnp.where(live, y_s - r_s, big).min(axis=1)
    y1 = jnp.where(live, y_s + r_s, -big).max(axis=1)
    cx0 = jnp.clip(jnp.floor(x0 / TILE), 0, tiles_x - 1).astype(jnp.int32)
    cx1 = jnp.clip(jnp.floor(x1 / TILE), -1, tiles_x - 1).astype(jnp.int32)
    cy0 = jnp.clip(jnp.floor(y0 / TILE), 0, tiles_y - 1).astype(jnp.int32)
    cy1 = jnp.clip(jnp.floor(y1 / TILE), -1, tiles_y - 1).astype(jnp.int32)
    empty = ~live.any(axis=1)
    cx1 = jnp.where(empty, -1, cx1)
    chunk_bbox = (cx0, cx1, cy0, cy1)

    out_tiles, done = composite_scan_fwd(
        attrs_sorted, n_alive, chunk_bbox,
        n_ch=n_ch, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=_use_interpret(),
    )
    t_final = out_tiles[:, n_ch : n_ch + 1, :]
    residuals = (attrs_sorted, perm, n_alive, chunk_bbox, done, t_final)
    return out_tiles, residuals


def _sorted_composite_bwd(static, residuals, g_tiles):
    n_ch, tiles_x, tiles_y, g, n_attr = static
    attrs_sorted, perm, n_alive, chunk_bbox, done, t_final = residuals
    d_sorted = composite_scan_bwd(
        attrs_sorted, n_alive, chunk_bbox, done, g_tiles, t_final,
        n_ch=n_ch, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=_use_interpret(),
    )
    # Unsort: stable-sorting the gradient rows keyed by the recorded
    # permutation applies the inverse permutation (no gather).
    d_rows = [d_sorted[i] for i in range(n_attr)]
    unsorted = _grouped_sort(perm, d_rows)
    d_rows_orig = tuple(u[:g] for u in unsorted)
    zeros_g = jnp.zeros((g,), jnp.float32)
    return ((d_rows_orig, zeros_g, zeros_g),)


_sorted_composite.defvjp(_sorted_composite_fwd, _sorted_composite_bwd)


def composite_tiled(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    background: jnp.ndarray,  # (C,)
    max_tiles_per_gaussian: int = 0,  # kept for API compat; unused
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

    alive = sg.radius > 0.0
    key = jnp.where(alive, sg.depth, jnp.inf)
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
    radius = jax.lax.stop_gradient(sg.radius)

    out_tiles = _sorted_composite(
        (rows, jax.lax.stop_gradient(key), radius),
        (n_ch, tiles_x, tiles_y, sg.num_gaussians, len(rows)),
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
