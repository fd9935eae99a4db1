"""Tiled rasterization: exact pair expansion + sort binning + Pallas
compositing, with a custom VJP.

TPU-native replacement for the CUDA rasterizer's duplicate-with-keys /
radix-sort / per-tile-range scheme (`latent-gaussian-rasterization`,
characterized at src/model/decoder/cuda_splatting.py:124-158). The CUDA
structure (per-tile depth-ordered pair segments) is work-optimal and is
kept — but every data-movement step is expressed either as a **sort** (the
one XLA reordering primitive that streams on TPU) or as an **interval-paint
matmul inside a Pallas kernel** (MXU work instead of gather/scatter, which
serialize at ~3 us/row on TPU).

Pipeline:
  1. Project all gaussians (camera.py, dense XLA).
  2. Depth ranks: argsort depth, invert the permutation with a second sort
     (rank[perm[i]] = i expressed as sorting (perm, iota)).
  3. EXACT expansion (expand.py): each gaussian is replicated once per
     overlapped tile (counts = clamped tile-rect area; dead gaussians emit
     one invalid-tile pair so interval spans stay bounded). This matches
     the CUDA duplication exactly — round 1 instead broadcast every
     gaussian to a fixed `cap` slots, and the ~60% padding rows dominated
     the sort cost (3.5M vs the measured 0.96M real pairs at the flagship
     scale). The pair *budget* is static (XLA shapes): farthest-fetched
     pairs are dropped if `pair_budget_factor * G` is ever exceeded.
  4. Per-pair tile ids from the painted (base, nx, start) rows; composite
     int32 key = tile << 19 | depth_rank (exact: G < 2^19, tiles <= 2^12).
  5. ONE grouped stable sort pass by the key carries all attribute rows and
     a pair-index iota. Per-tile segment bounds = searchsorted on the keys.
  6. The Pallas kernels composite each tile's contiguous depth-ordered
     segment; segments are unaligned, so chunks are CHUNK-aligned windows
     with in-kernel masking, and the backward accumulates with sequential
     read-modify-write (see pallas_kernels.py).
  7. Backward: pair gradients are stable-sorted by the carried pair index
     (returning them to expanded gaussian-major layout — applying the
     inverse permutation without a gather) and segment-summed per gaussian
     by the reduce_by_counts kernel (expand.py).

Gradients flow to mean2d, conic, opacity, channels, and the composited
depth; tile assignment and ordering are (correctly) treated as
non-differentiable, like the CUDA implementation.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .expand import (
    GW,
    OUT_BLOCK,
    expand_by_counts,
    reduce_by_counts,
    start_offsets,
)
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
DEFAULT_PAIR_BUDGET_FACTOR = 4.0

# Payload rows per stable sort call. lax.sort compile time grows steeply
# with operand count (17 operands failed to compile in 9 min on v5e; 12
# compile in ~150 s). Runtime scales with total payload bytes plus a
# per-call cost (~0.6 ms at ~1.2M rows), but large many-operand sorts
# also run slower per row: measured ms/pass for the 11-payload flagship
# sort — 1.18M rows: one 12-op call 7.5 vs two grouped calls 8.2;
# 1.57M rows: one call 11.6 vs grouped 10.7. So: single call for small
# budgets, grouped calls above SINGLE_CALL_ROWS.
SORT_GROUP = 7
SINGLE_CALL_ROWS = 1_300_000

RANK_BITS = 19  # G < 2^19 gaussians; composite key = tile << RANK_BITS | rank


def _depth_code_bits(num_tiles: int) -> tuple[int, int]:
    """Fast-mode depth-code width: every bit the tile field leaves free in
    the int31 sort key. The tile field must hold num_tiles + 1 (the invalid
    sentinel), so (code_bits, code_shift) with code_shift the right-shift
    that extracts the top code_bits of a positive f32's bit pattern.
    22 bits (13-mantissa-bit depth ties) at the flagship 256-tile shape;
    19 at 4096 tiles."""
    code_bits = 31 - (num_tiles + 2).bit_length()
    return code_bits, 31 - code_bits


def _cull_margin(precision: str) -> float:
    """Log-space margin of the exact ellipse-tile cull (see _tile_rects):
    covers fp discrepancy vs the kernel's per-pixel alpha evaluation —
    wider in fast mode, where the kernel reads bf16-rounded conics
    (~0.8% rel on q)."""
    return 6e-2 if _is_fast(precision) or precision == "exact_wide_cull" else 1e-3


# Diagnostic hybrid precisions (convergence-anomaly bisect + per-knob PSNR
# attribution, NOTES.md r4): each takes the EXACT path everywhere except one
# isolated fast-mode knob, so the knob responsible for a train-quality or
# render-fidelity difference can be identified.
#   exact_wide_cull    — exact + fast's 6e-2 cull margin
#   exact_tie_depth    — exact + fast's depth ORDERING (ranks from the 19-bit
#                        truncated depth code, ties broken gaussian-major)
#   exact_bf16_mm      — exact + fast's bf16 compositor scan/channel matmuls
#   exact_q12_channels — exact + fast's 12-bit fixed-point channel VALUES
#   exact_f16_xy       — exact + fast's f16 tile-relative mean coordinates
#   exact_bf16_conic   — exact + fast's bf16 conic/opacity values
#   exact_depth_val    — exact + fast's 19-bit depth VALUE readback (order
#                        stays exact; isolates the depth-channel error)
#   exact_bf16_sh      — exact + fast's bf16 SH tables (applied in api.py's
#                        view_channels; rides the exact path here)
#   exact_bf16_grads   — exact + fast's bf16 packing of the BACKWARD's
#                        per-pair gradient rows through the unsort
# The value knobs quantize the sorted attribute rows in place — layout,
# sort keys, cull, and kernel precision all stay exact.
DIAGNOSTIC_PRECISIONS = (
    "exact_wide_cull", "exact_tie_depth", "exact_bf16_mm",
    "exact_q12_channels", "exact_f16_xy", "exact_bf16_conic",
    "exact_depth_val", "exact_bf16_sh", "exact_bf16_grads",
    "fast_nocoef",
)


def _is_fast(precision: str) -> bool:
    """fast-family structural layout (half-precision sort payload, depth-bit
    keys). "fast_nocoef" is the diagnostic twin of "fast" that keeps the
    training attribute layout in the forward kernel (no coefficient-layout
    alpha) — isolating the coef path's fidelity/throughput contribution."""
    return precision in ("fast", "fast_nocoef")


def _kernel_fast(precision: str) -> bool:
    """Whether the Pallas compositor runs its matmuls with bf16 inputs."""
    return precision in ("fast", "fast_nocoef", "exact_bf16_mm")


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _grouped_sort(key: jnp.ndarray, rows: list) -> list:
    """Stable-sort every row by `key` using grouped multi-operand sorts.

    Stability guarantees all groups see the identical permutation even with
    duplicate keys.
    """
    return _grouped_sort_with_keys((key,), rows)[1]


def _grouped_sort_with_key(key: jnp.ndarray, rows: list):
    """Like _grouped_sort but also returns the sorted key (for free from
    the first group call)."""
    keys, out = _grouped_sort_with_keys((key,), rows)
    return keys[0], out


def _grouped_sort_with_keys(keys: tuple, rows: list):
    """Stable lexicographic sort of every row by one or more key rows,
    grouped to keep lax.sort's operand count in the known-to-compile range
    (12 operands ~150 s; 17 never finished). Returns (sorted_keys, rows)."""
    nk = len(keys)
    group_size = (
        len(rows)
        if keys[0].shape[0] <= SINGLE_CALL_ROWS and len(rows) + nk <= 12
        else SORT_GROUP
    )
    out = []
    sorted_keys = None
    for i in range(0, len(rows), group_size):
        group = rows[i : i + group_size]
        sorted_ops = jax.lax.sort(
            (*keys, *group), num_keys=nk, is_stable=True
        )
        if sorted_keys is None:
            sorted_keys = sorted_ops[:nk]
        out.extend(sorted_ops[nk:])
    return sorted_keys, out


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


def _pack_f16_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 rows -> one f32 row of f16 bit patterns (10-bit mantissa:
    ~8x finer than bf16 for small-range values like tile-relative pixel
    coordinates)."""
    lo = jax.lax.bitcast_convert_type(
        a.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        b.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo | (hi << 16), jnp.float32)


def _unpack_f16_pair(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    bits = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (bits & 0xFFFF).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.float16
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

    payload = (rows tuple (G,), counts (G,) int32, rank/base/nx/mask (G,)
    int32 — mask is the surviving-slot bitmask from _tile_rects);
    static = (n_ch, tiles_x, tiles_y, g, cap, n_attr, pack_channels,
    pair_budget, precision). The VJP owns the expansion + pair sort
    (forward) and the gradient unsort + per-gaussian segment reduction
    (backward), keeping slow gather/scatter lowerings out of the graph.

    The primal (inference) path skips everything only the backward needs:
    no pair-index operand rides the sort and no residuals are built.
    """
    out, _ = _forward(payload, static, want_residuals=False)
    return out


def _pair_composite_fwd(payload, static):
    return _forward(payload, static, want_residuals=True)


def _forward(payload, static, want_residuals: bool):
    rows, counts, rank, base, nx, mask = payload
    (n_ch, tiles_x, tiles_y, g, cap, n_attr, pack_channels,
     pair_budget, precision) = static
    num_tiles = tiles_x * tiles_y
    interpret = _use_interpret()
    g_pad = _round_up(g, GW)

    def padg(x):
        return jnp.pad(x, (0, g_pad - g))

    # Expansion input: attribute rows + metadata rows (rank/base/nx plus the
    # exact f32 start-offset and count rows the kernel paints through).
    #
    # Fast mode shrinks what the interval-paint kernel moves (it is
    # matmul/DMA-bound in the row count): channel rows ride two-per-row as
    # 12-bit fixed-point pairs (exact integer f32s <= 2^24, so HIGHEST-
    # precision indicator matmuls move them exactly — unlike bf16 bit
    # patterns, which can alias denormals/NaNs and get flushed), and
    # base/nx share one exact integer row. 19 rows (pad 24) -> 14 (pad 16)
    # at the flagship scale. Geometry stays f32 through the expansion.
    counts_p = padg(counts)
    starts, _ = start_offsets(counts_p)
    if _is_fast(precision):
        # Depth (the last attribute row) stays f32 through the expansion:
        # post-expansion the top 19 bits of its bit pattern become the
        # depth code of the packed (tile << 19 | code) sort key, replacing
        # the global depth-rank sorts entirely — and depth reads back out
        # of the sorted key. Ties (10-mantissa-bit granularity) break by
        # the stable sort's gaussian-major order.
        chan_rows_in = list(rows[6:-1])
        if len(chan_rows_in) % 2:
            chan_rows_in.append(jnp.zeros_like(chan_rows_in[0]))
        ch_scales = [
            jnp.maximum(jnp.max(jnp.abs(c)), 1e-8) for c in chan_rows_in
        ]
        q_rows = [
            jnp.clip(
                jnp.round((c / s * 0.5 + 0.5) * 4095.0), 0.0, 4095.0
            )
            for c, s in zip(chan_rows_in, ch_scales)
        ]
        packed_ch = [
            q_rows[i] * 4096.0 + q_rows[i + 1]
            for i in range(0, len(q_rows), 2)
        ]
        attr_exp_rows = list(rows[:6]) + packed_ch + [rows[-1]]
        # nx clamps to 15 without changing the decode: slots stay < cap
        # <= 15, so slot % nx == slot and slot // nx == 0 whenever the true
        # rect is wider than the clamp (asserted in composite_tiled).
        assert cap <= 15, "fast mode packs nx in 4 bits (cap <= 15)"
        base_nx = base * 16 + jnp.minimum(nx, 15)  # base*16 < 2^24 exact
        meta_rows = [
            padg(base_nx.astype(jnp.float32)),
            padg(mask.astype(jnp.float32)),  # < 2^cap <= 2^15: exact f32
        ]
    else:
        attr_exp_rows = list(rows)
        meta_rows = [
            padg(rank.astype(jnp.float32)),
            padg(base.astype(jnp.float32)),
            padg(nx.astype(jnp.float32)),
            padg(mask.astype(jnp.float32)),
        ]
    n_exp = len(attr_exp_rows)
    exp_rows = [padg(r) for r in attr_exp_rows] + meta_rows + [
        starts,
        counts_p.astype(jnp.float32),
    ]
    start_idx = n_exp + len(meta_rows)
    cnt_idx = start_idx + 1
    r_pad = _round_up(len(exp_rows), 8)
    exp_stack = jnp.zeros((r_pad, g_pad), jnp.float32)
    exp_stack = exp_stack.at[: len(exp_rows)].set(jnp.stack(exp_rows))

    expanded = expand_by_counts(
        exp_stack, counts_p, pair_budget, start_idx, cnt_idx,
        interpret=interpret,
    )
    total = jnp.minimum(counts_p.sum(), pair_budget)

    if _is_fast(precision):
        base_nx_e = expanded[n_exp].astype(jnp.int32)
        base_e = base_nx_e // 16
        nx_e = jnp.maximum(base_nx_e % 16, 1)
        mask_e = expanded[n_exp + 1].astype(jnp.int32)
        rank_e = None  # fast mode orders by raw depth bits instead
    else:
        rank_e = expanded[n_exp].astype(jnp.int32)
        base_e = expanded[n_exp + 1].astype(jnp.int32)
        nx_e = jnp.maximum(expanded[n_exp + 2].astype(jnp.int32), 1)
        mask_e = expanded[n_exp + 3].astype(jnp.int32)
    start_e = expanded[start_idx].astype(jnp.int32)

    pair_iota = jnp.arange(pair_budget, dtype=jnp.int32)
    slot = pair_iota - start_e
    # Slot decode. Pairs enumerate the SURVIVING rect slots (the exact
    # ellipse-tile cull runs pre-expansion in _tile_rects, so culled tiles
    # never ride the expansion or the sort): slot s maps to the position of
    # the (s+1)-th set bit of the survivor mask, then to the rect's
    # (row, col). Integer div/mod by the DYNAMIC nx_e lowers to a long
    # emulation sequence per element on TPU; exact float math replaces it:
    # pos < cap, where _tile_rects asserts cap <= 24 (fast mode further
    # asserts cap <= 15), and floor((a + 0.5) / b) == a // b exactly for
    # small non-negative ints (the +0.5 never crosses an integer boundary
    # and f32 rounding error is far below the 0.5/24 margin). Unpainted tail
    # columns hold zeros (start=0, nx=1, mask=0) -> garbage tiles; clamp so
    # the int32 key math can't overflow, then mask via `valid`.
    slot_c = jnp.clip(slot, 0, cap)
    cum = jnp.zeros_like(slot_c)
    pos = jnp.zeros_like(slot_c)
    for b in range(cap):
        bit = (mask_e >> b) & 1
        pos = jnp.where((cum == slot_c) & (bit == 1), b, pos)
        cum = cum + bit
    pos_f = pos.astype(jnp.float32)
    nx_f = nx_e.astype(jnp.float32)
    row_f = jnp.floor((pos_f + 0.5) / nx_f)
    col_f = pos_f - row_f * nx_f
    tile = jnp.clip(
        base_e + (col_f + row_f * tiles_x).astype(jnp.int32), 0, num_tiles
    )
    valid = pair_iota < total
    # Fast mode packs (tile << code_bits | depth code) into ONE key with no
    # gaussian-count ceiling and no depth-rank sorts: the top code_bits of
    # a positive f32's bit pattern are a monotone depth code. The code takes
    # every bit the tile field leaves free in the int31 key — 22 bits (13
    # mantissa bits, ~0.01% relative ties) at the flagship 256-tile shape,
    # 19 bits at 4096 tiles — with stable gaussian-major tiebreak. Exact
    # mode packs (tile << RANK_BITS | rank) while G < 2^19, else a stable
    # two-key (tile, rank) lexicographic sort.
    code_bits, code_shift = _depth_code_bits(num_tiles)
    wide_ranks = not _is_fast(precision) and g >= (1 << RANK_BITS)
    if _is_fast(precision):
        depth_e = expanded[n_exp - 1]  # f32, positive for live gaussians
        depth_code = (
            jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(depth_e, jnp.int32), code_shift
            )
            # mask keeps dead gaussians' negative depths in-field
            & ((1 << code_bits) - 1)
        )
        key = jnp.where(
            valid,
            (tile << code_bits) | depth_code,
            (num_tiles + 1) << code_bits,
        )
        sort_keys = (key,)
    elif wide_ranks:
        tile_key = jnp.where(valid, tile, num_tiles + 1)
        sort_keys = (tile_key, rank_e)
    else:
        key = jnp.where(
            valid,
            (tile << RANK_BITS) | rank_e,
            (num_tiles + 1) << RANK_BITS,
        )
        sort_keys = (key,)

    # The backward needs the carried pair index to unsort gradients; the
    # inference path drops the operand (~8% less sort payload).
    carried = [pair_iota] if want_residuals else []

    if _is_fast(precision):
        # Fast mode: everything rides the sort two-per-operand. Tile-
        # relative x/y as f16 pairs (10-bit mantissa: <=0.03 px at the
        # <=64 px tile-relative range), conic/opacity as bf16 pairs
        # (~0.4% rel), channels as the 12-bit fixed-point pairs already
        # carried through the expansion (opaque payload bits to the sort).
        # 12 -> 8 operands at the flagship scale. Unpacking happens after
        # the sort in XLA — the compositor still sees f32 rows.
        x_rel = expanded[0] - (tile % tiles_x).astype(jnp.float32) * TILE
        y_rel = expanded[1] - (tile // tiles_x).astype(jnp.float32) * TILE
        # Channels ride the sort in the same 12-bit fixed-point values the
        # expansion produced, but bit-repacked from 24 useful bits per f32
        # row into FULL 32-bit operands: each group of four 24-bit rows
        # becomes three int32 rows (bit-identical payload, 25% fewer
        # channel operands; the sort is byte-bound at this row count).
        # Requantizing to 8 bits x 4 was measured a wash — the win here is
        # pure bit packing with no precision change. Leftover rows (when
        # the packed-row count is not a multiple of 4) ride unpacked.
        chan24 = [
            expanded[i].astype(jnp.int32) for i in range(6, n_exp - 1)
        ]
        quad_ops: list = []
        n_quad = len(chan24) // 4
        for qi in range(n_quad):
            i0, i1, i2, i3 = chan24[4 * qi : 4 * qi + 4]
            quad_ops.append(i0 | ((i1 & 0xFF) << 24))
            quad_ops.append((i1 >> 8) | ((i2 & 0xFFFF) << 16))
            quad_ops.append(((i2 >> 16) & 0xFF) | (i3 << 8))
        tail_rows = [expanded[i] for i in range(6 + 4 * n_quad, n_exp - 1)]
        half_rows = [
            _pack_f16_pair(x_rel, y_rel),
            _pack_bf16_pair(expanded[2], expanded[3]),
            _pack_bf16_pair(expanded[4], expanded[5]),
        ] + quad_ops + tail_rows
        sorted_keys, sorted_all = _grouped_sort_with_keys(
            sort_keys, carried + half_rows
        )
        n_car = len(carried)
        tile_s = (sorted_keys[0] >> code_bits).astype(jnp.int32)
        x_rel_s, y_rel_s = _unpack_f16_pair(sorted_all[n_car])
        ca_s, cb_s = _unpack_bf16_pair(sorted_all[n_car + 1])
        cc_s, op_s = _unpack_bf16_pair(sorted_all[n_car + 2])
        if want_residuals or precision == "fast_nocoef":
            sorted_rows = [
                x_rel_s + (tile_s % tiles_x).astype(jnp.float32) * TILE,
                y_rel_s + (tile_s // tiles_x).astype(jnp.float32) * TILE,
                ca_s, cb_s, cc_s, op_s,
            ]
        else:
            # Inference coefficient layout: rows 0-5 become the per-pair
            # quadratic coefficients of power + log(op) over the
            # TILE-RELATIVE pixel basis [px^2, px, py^2, py, px*py, 1]
            # (pallas_kernels._coef_basis), so the forward kernel's alpha
            # exponent is one (CHUNK, 8) @ (8, PIX) MXU matmul instead of
            # ~11 VPU flops per (pair, pixel). No log(op) guard row: the
            # projection's PSD-margin conic clamp (camera.py) makes the
            # quadratic non-positive everywhere, so the kernel needs no
            # power>0 wraparound guard. The backward needs the plain
            # geometry rows, so training keeps the old layout (this
            # branch builds no residuals).
            log_op_s = jnp.log(jnp.maximum(op_s, 1e-12))
            sorted_rows = [
                -0.5 * ca_s,
                ca_s * x_rel_s + cb_s * y_rel_s,
                -0.5 * cc_s,
                cc_s * y_rel_s + cb_s * x_rel_s,
                -cb_s,
                log_op_s
                - 0.5 * (ca_s * x_rel_s * x_rel_s + cc_s * y_rel_s * y_rel_s)
                - cb_s * x_rel_s * y_rel_s,
            ]
        # Reassemble the 24-bit channel rows: three int32 operands per
        # quad-group (masked shifts kill sign extension), then any
        # unpacked f32 tail rows.
        chan_ops = sorted_all[n_car + 3 :]
        chan24_s = []
        for qi in range(n_quad):
            o0, o1, o2 = chan_ops[3 * qi : 3 * qi + 3]
            chan24_s.append(o0 & 0xFFFFFF)
            chan24_s.append(((o0 >> 24) & 0xFF) | ((o1 & 0xFFFF) << 8))
            chan24_s.append(((o1 >> 16) & 0xFFFF) | ((o2 & 0xFF) << 16))
            chan24_s.append((o2 >> 8) & 0xFFFFFF)
        for t24 in chan_ops[3 * n_quad :]:
            chan24_s.append(t24.astype(jnp.int32))
        for i, q24 in enumerate(chan24_s):
            q1 = (q24 >> 12).astype(jnp.float32)
            q2 = (q24 & 0xFFF).astype(jnp.float32)
            s1, s2 = ch_scales[2 * i], ch_scales[2 * i + 1]
            sorted_rows.append((q1 / 4095.0 * 2.0 - 1.0) * s1)
            sorted_rows.append((q2 / 4095.0 * 2.0 - 1.0) * s2)
        # Depth reads back out of the key's depth code (midpoint fill of
        # the truncated mantissa: <=2^-(code_bits-8) relative error).
        depth_sorted = jax.lax.bitcast_convert_type(
            ((sorted_keys[0] & ((1 << code_bits) - 1)) << code_shift)
            | (1 << (code_shift - 1)),
            jnp.float32,
        )
        sorted_rows = sorted_rows[: n_attr - 1] + [depth_sorted]
    elif pack_channels:
        pair_rows = [expanded[i] for i in range(n_attr)]
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
        sorted_keys, sorted_all = _grouped_sort_with_keys(
            sort_keys, carried + geo_rows + packed_rows
        )
        n_car = len(carried)
        sorted_rows = list(sorted_all[n_car : n_car + n_geo])
        for packed in sorted_all[n_car + n_geo :]:
            a, b2 = _unpack_bf16_pair(packed)
            sorted_rows.extend([a, b2])
        sorted_rows = sorted_rows[:n_attr]
    else:
        pair_rows = [expanded[i] for i in range(n_attr)]
        sorted_keys, sorted_all = _grouped_sort_with_keys(
            sort_keys, carried + pair_rows
        )
        n_car = len(carried)
        sorted_rows = list(sorted_all[n_car : n_car + n_attr])
    pair_perm = sorted_all[0] if want_residuals else None

    # Value-quantization diagnostic knobs: reproduce ONE of fast mode's
    # value quantizations on the otherwise-exact path (same layout, sort
    # order, cull, and kernel precision), so each knob's PSNR / training
    # cost is measurable in isolation. Round-trips use the identical math
    # the fast payload path applies.
    if precision == "exact_q12_channels":
        # 12-bit fixed point with fast's pre-expansion per-gaussian scales.
        for i in range(6, n_attr - 1):
            s = jnp.maximum(jnp.max(jnp.abs(rows[i])), 1e-8)
            q = jnp.clip(
                jnp.round((sorted_rows[i] / s * 0.5 + 0.5) * 4095.0),
                0.0, 4095.0,
            )
            sorted_rows[i] = (q / 4095.0 * 2.0 - 1.0) * s
    elif precision == "exact_f16_xy":
        # f16 round trip of the TILE-RELATIVE coordinates (what fast sorts).
        # optimization_barrier keeps XLA's allow-excess-precision pass from
        # folding the narrow-then-widen convert pair away (measured: on TPU
        # a bare f32->f16->f32 round trip compiles to a no-op).
        tile_s = (
            sorted_keys[0] if wide_ranks else sorted_keys[0] >> RANK_BITS
        ).astype(jnp.int32)
        tx = jnp.clip(tile_s % tiles_x, 0, tiles_x).astype(jnp.float32) * TILE
        ty = jnp.clip(tile_s // tiles_x, 0, tiles_y).astype(jnp.float32) * TILE
        sorted_rows[0] = (
            jax.lax.optimization_barrier(
                (sorted_rows[0] - tx).astype(jnp.float16)
            ).astype(jnp.float32) + tx
        )
        sorted_rows[1] = (
            jax.lax.optimization_barrier(
                (sorted_rows[1] - ty).astype(jnp.float16)
            ).astype(jnp.float32) + ty
        )
    elif precision == "exact_bf16_conic":
        for i in range(2, 6):
            sorted_rows[i] = jax.lax.optimization_barrier(
                sorted_rows[i].astype(jnp.bfloat16)
            ).astype(jnp.float32)
    elif precision == "exact_depth_val":
        # fast reads depth back from the key's depth code (midpoint fill),
        # at the same width fast uses for this tile count.
        bits = jax.lax.bitcast_convert_type(
            sorted_rows[n_attr - 1], jnp.int32
        )
        code = jax.lax.shift_right_logical(bits, code_shift) & (
            (1 << code_bits) - 1
        )
        sorted_rows[n_attr - 1] = jax.lax.bitcast_convert_type(
            (code << code_shift) | (1 << (code_shift - 1)), jnp.float32
        )

    coef = precision == "fast" and not want_residuals
    n_rows = n_attr
    attrs_pairs = jnp.zeros((pad_attr_rows(n_rows), pair_budget), jnp.float32)
    attrs_pairs = attrs_pairs.at[:n_rows].set(jnp.stack(sorted_rows))

    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    if _is_fast(precision):
        boundaries = boundaries << code_bits
    elif not wide_ranks:
        boundaries = boundaries << RANK_BITS
    tile_starts = jnp.searchsorted(
        sorted_keys[0], boundaries, side="left"
    ).astype(jnp.int32)

    out_tiles, done = composite_pairs_fwd(
        attrs_pairs, tile_starts,
        n_ch=n_ch, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=interpret, fast=_kernel_fast(precision), coef=coef,
    )
    if not want_residuals:
        return out_tiles, None
    t_final = out_tiles[:, n_ch : n_ch + 1, :]
    residuals = (attrs_pairs, tile_starts, pair_perm, done, t_final, counts_p)
    return out_tiles, residuals


def _pair_composite_bwd(static, residuals, g_tiles):
    (n_ch, tiles_x, tiles_y, g, cap, n_attr, pack_channels,
     pair_budget, precision) = static
    attrs_pairs, tile_starts, pair_perm, done, t_final, counts_p = residuals
    interpret = _use_interpret()
    d_pairs = composite_pairs_bwd(
        attrs_pairs, tile_starts, done, g_tiles, t_final,
        n_ch=n_ch, tiles_x=tiles_x, tiles_y=tiles_y,
        interpret=interpret, fast=_kernel_fast(precision),
    )
    # Unsort: stable-sorting gradient rows keyed by the carried pair index
    # applies the inverse permutation (no gather); then the reduce_by_counts
    # kernel segment-sums each gaussian's pair gradients (no scatter).
    # Fast mode rides the gradient rows through the unsort as bf16 pairs
    # (the sort is byte-bound and moves payload bits opaquely): n_attr f32
    # operands become ceil(n_attr/2), at ~0.4% relative gradient error —
    # the same precision the fast forward already put on the attributes.
    if _is_fast(precision) or precision == "exact_bf16_grads":
        packed = [
            _pack_bf16_pair(
                d_pairs[i],
                d_pairs[i + 1] if i + 1 < n_attr else jnp.zeros_like(d_pairs[i]),
            )
            for i in range(0, n_attr, 2)
        ]
        sorted_packed = _grouped_sort(pair_perm, packed)
        unsorted = []
        for p in sorted_packed:
            a, b = _unpack_bf16_pair(p)
            unsorted.extend((a, b))
        unsorted = unsorted[:n_attr]
    else:
        d_rows = [d_pairs[i] for i in range(n_attr)]
        unsorted = _grouped_sort(pair_perm, d_rows)
    r_pad = pad_attr_rows(n_attr)
    d_stack = jnp.zeros((r_pad, pair_budget), jnp.float32)
    d_stack = d_stack.at[:n_attr].set(jnp.stack(unsorted))
    d_gauss = reduce_by_counts(
        d_stack, counts_p, max(cap, 1), interpret=interpret
    )
    d_rows_orig = tuple(d_gauss[i, :g] for i in range(n_attr))
    zero_i = jnp.zeros((g,), jnp.int32)
    return ((d_rows_orig, zero_i, zero_i, zero_i, zero_i, zero_i),)


_pair_composite.defvjp(_pair_composite_fwd, _pair_composite_bwd)


def _tile_rects(
    sg: ScreenGaussians,
    tiles_x: int,
    tiles_y: int,
    cap: int,
    cull_margin: float = 1e-3,
):
    """Per-gaussian tile bookkeeping: (counts, base, nx, mask) int32 rows.

    Exact per-gaussian duplication counts with the exact ellipse-tile cull
    applied BEFORE expansion: for each slot of the bounding tile-rect, the
    minimum of the PD quadratic q(d) = 0.5*ca*dx^2 + 0.5*cc*dy^2 + cb*dx*dy
    over the tile's pixel-center box is computed exactly (zero if the mean
    is inside the box, else the min over the four edges — each a clamped 1D
    quadratic minimization; convexity puts the constrained min on the
    boundary). A tile whose q_min exceeds log(255*op) holds only alphas the
    compositor zeroes (< ALPHA_THRESHOLD), so its pair is never emitted —
    it would otherwise ride the expansion AND the pair sort for nothing
    (~10% of rect pairs at the flagship scale). `mask` records which rect
    slots survive (bit s = slot s emits a pair), so the post-expansion
    decode can recover each pair's tile; `counts` is the popcount. The
    continuous box min lower-bounds the discrete pixel-center min, so the
    cull is conservative; `cull_margin` covers fp discrepancy vs the
    kernel's per-pixel alpha (wider in fast mode, where the kernel reads
    bf16-rounded conics).

    Dead gaussians (and live ones whose every rect tile is culled) emit ONE
    pair with an invalid tile id: it sorts past every real segment (never
    composited) and keeps counts >= 1, which bounds how many gaussian
    blocks one expansion output block can span (see expand.py).
    Indices come from non-differentiable copies (they carry no grads).
    """
    assert cap <= 24, "mask rides the expansion as an exact f32 (cap <= 24)"
    num_tiles = tiles_x * tiles_y
    alive = sg.radius > 0.0
    mean_nd = jax.lax.stop_gradient(sg.mean2d)
    radius_nd = jax.lax.stop_gradient(sg.radius)
    if sg.extent is not None:
        # Threshold-aware per-axis extents (see camera.py): tiles beyond
        # them hold only provably-sub-threshold alphas, so the tighter rect
        # is bit-exact and emits fewer pairs than the radius square.
        ext_nd = jax.lax.stop_gradient(sg.extent)
        ex, ey = ext_nd[:, 0], ext_nd[:, 1]
    else:
        ex = ey = radius_nd
    tx0 = jnp.clip(jnp.floor((mean_nd[:, 0] - ex) / TILE), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor((mean_nd[:, 0] + ex) / TILE), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor((mean_nd[:, 1] - ey) / TILE), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor((mean_nd[:, 1] + ey) / TILE), 0, tiles_y - 1)
    tx0, tx1 = tx0.astype(jnp.int32), tx1.astype(jnp.int32)
    ty0, ty1 = ty0.astype(jnp.int32), ty1.astype(jnp.int32)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    n_rect = nx * ny  # may exceed cap for huge splats (then truncated)
    rect_counts = jnp.minimum(n_rect, cap)

    # Per-slot exact ellipse cull over the rect enumeration.
    mx, my = mean_nd[:, 0], mean_nd[:, 1]
    conic_nd = jax.lax.stop_gradient(sg.conic)
    op_nd = jax.lax.stop_gradient(sg.opacity)
    ca, cb, cc = conic_nd[:, 0], conic_nd[:, 1], conic_nd[:, 2]
    thresh = jnp.log(255.0 * jnp.maximum(op_nd, 1e-12)) + cull_margin
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)
    tx0_f = tx0.astype(jnp.float32)
    ty0_f = ty0.astype(jnp.float32)
    nx_f = nx.astype(jnp.float32)
    mask = jnp.zeros(mx.shape, jnp.int32)
    surv = jnp.zeros(mx.shape, jnp.int32)
    for s in range(cap):
        # Rect decode with exact float math (see _forward's slot decode).
        row_f = jnp.floor((s + 0.5) / nx_f)
        col_f = s - row_f * nx_f
        txp = (tx0_f + col_f) * TILE
        typ = (ty0_f + row_f) * TILE
        dx0 = txp - mx
        dx1 = dx0 + (TILE - 1)
        dy0 = typ - my
        dy1 = dy0 + (TILE - 1)
        inside = (dx0 <= 0.0) & (dx1 >= 0.0) & (dy0 <= 0.0) & (dy1 >= 0.0)

        def q_at_x(a):  # min over dy in [dy0, dy1] of q(a, dy)
            yc = jnp.clip(-cb * a / cc_s, dy0, dy1)
            return 0.5 * ca * a * a + cb * a * yc + 0.5 * cc * yc * yc

        def q_at_y(b):  # min over dx in [dx0, dx1] of q(dx, b)
            xc = jnp.clip(-cb * b / ca_s, dx0, dx1)
            return 0.5 * ca * xc * xc + cb * xc * b + 0.5 * cc * b * b

        q_min = jnp.where(
            inside,
            0.0,
            jnp.minimum(
                jnp.minimum(q_at_x(dx0), q_at_x(dx1)),
                jnp.minimum(q_at_y(dy0), q_at_y(dy1)),
            ),
        )
        bit = ((s < rect_counts) & (q_min <= thresh)).astype(jnp.int32)
        mask = mask | (bit << s)
        surv = surv + bit

    empty = jnp.logical_or(surv == 0, jnp.logical_not(alive))
    counts = jnp.where(empty, 1, surv).astype(jnp.int32)
    base = jnp.where(empty, num_tiles, ty0 * tiles_x + tx0).astype(jnp.int32)
    nx_safe = jnp.where(empty, 1, nx).astype(jnp.int32)
    mask = jnp.where(empty, 1, mask)
    return counts, base, nx_safe, mask


def count_pair_overflow(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    max_tiles_per_gaussian: int = DEFAULT_MAX_TILES_PER_GAUSSIAN,
    pair_budget_factor: float = DEFAULT_PAIR_BUDGET_FACTOR,
    *,
    precision: str,
) -> jnp.ndarray:
    """Number of tile pairs silently dropped by the static pair budget.

    Truncation drops the highest-indexed gaussians' pairs (a quiet quality
    cliff); callers should surface this counter in logs so real runs can
    detect an undersized `pair_budget_factor`.

    `precision` MUST match the `composite_tiled` call being counted for:
    fast mode culls with a wider margin (keeps more pairs), so exact-margin
    counts UNDER-report fast-mode overflow — the exact failure this counter
    exists to surface. Keyword-required with no default for that reason.
    """
    h, w = image_shape
    tiles_x, tiles_y = w // TILE, h // TILE
    cap = max_tiles_per_gaussian
    g = sg.num_gaussians
    counts, _, _, _ = _tile_rects(
        sg, tiles_x, tiles_y, cap, _cull_margin(precision)
    )
    budget_quantum = OUT_BLOCK * CHUNK // math.gcd(OUT_BLOCK, CHUNK)
    pair_budget = _round_up(
        min(int(g * pair_budget_factor) + 1, g * cap), budget_quantum
    )
    return jnp.maximum(counts.sum() - pair_budget, 0)


def composite_tiled(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    background: jnp.ndarray,  # (C,)
    max_tiles_per_gaussian: int = DEFAULT_MAX_TILES_PER_GAUSSIAN,
    pack_channels: bool = True,
    pair_budget_factor: float = DEFAULT_PAIR_BUDGET_FACTOR,
    precision: str = "exact",
    with_dropped: bool = False,
):
    """Composite one view's screen Gaussians with the tiled Pallas kernel.

    Returns (channels_img (C, H, W), mask (H, W), depth (H, W)) — the same
    contract as `composite_dense` — plus, when `with_dropped=True`, the
    number of tile pairs silently truncated by the static pair budget
    (free: the per-gaussian counts already exist here; re-counting via
    `count_pair_overflow` costs a full second `_tile_rects` cull pass per
    view, ~0.7 ms/view at the flagship scale — the r02->r03 bench
    regression).

    `pair_budget_factor` bounds the static pair-buffer size at
    `factor * G` (XLA needs static shapes where CUDA allocates the exact
    duplication count at runtime). Real scenes measure ~1.9 pairs per
    gaussian at 256 px after the pre-expansion ellipse-tile cull
    (_tile_rects), so the default 4x never truncates in practice;
    if it ever does, the pairs of the highest-indexed gaussians are
    dropped (see `count_pair_overflow` for the observability hook).

    `precision="fast"` rides every sorted attribute at half precision
    (f16 tile-relative coordinates, bf16 conic/opacity/channels): ~0.03 px
    coordinate and ~0.4% relative attribute error, for ~33% less sort
    payload. "exact" keeps geometry rows f32 (channels bf16 unless
    `pack_channels=False`, which is bit-exact vs the dense oracle).
    """
    h, w = image_shape
    assert h % TILE == 0 and w % TILE == 0, "image dims must be multiples of 16"
    tiles_x = w // TILE
    tiles_y = h // TILE
    c = sg.num_channels
    n_ch = c + 1  # + expected-depth channel
    g = sg.num_gaussians
    cap = max_tiles_per_gaussian
    num_tiles = tiles_x * tiles_y
    if _is_fast(precision):
        # Fast mode always packs a single key; _depth_code_bits sizes the
        # depth code to whatever the tile field leaves free, so it fits by
        # construction — but degrades below 16 code bits (the fidelity
        # floor) past ~32k tiles.
        assert _depth_code_bits(num_tiles)[0] >= 16, (
            "too many tiles for a useful fast-mode depth code"
        )
    elif g < (1 << RANK_BITS):
        # Packed single-key exact mode; above the ceiling exact switches to
        # a stable two-key (tile, rank) sort automatically.
        assert num_tiles << RANK_BITS < (1 << 31), "too many tiles for int32 keys"
    assert g * cap < (1 << 24), "pair offsets exceed exact-f32 range"
    # The budget must tile under both the expansion output block and the
    # compositor chunk (they are independent constants).
    budget_quantum = OUT_BLOCK * CHUNK // math.gcd(OUT_BLOCK, CHUNK)
    pair_budget = _round_up(
        min(int(g * pair_budget_factor) + 1, g * cap), budget_quantum
    )

    alive = sg.radius > 0.0
    if _is_fast(precision):
        # Fast mode sorts pairs by raw f32 depth bits (CUDA-style), so the
        # two global rank-inversion sorts are skipped entirely.
        rank = jnp.zeros((g,), jnp.int32)
    else:
        depth_key = jnp.where(alive, sg.depth, jnp.inf)
        if precision == "exact_tie_depth":
            # Diagnostic: reproduce fast mode's ordering exactly — rank by
            # the truncated depth code at fast's width for THIS tile count
            # (_depth_code_bits), ties broken gaussian-major by the stable
            # rank sort.
            _, code_shift = _depth_code_bits(num_tiles)
            depth_key = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(depth_key, jnp.int32)
                & ~jnp.int32((1 << code_shift) - 1),
                jnp.float32,
            )
        rank = _depth_ranks(depth_key)
    counts, base, nx_safe, mask = _tile_rects(
        sg, tiles_x, tiles_y, cap, _cull_margin(precision)
    )

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
        (rows, counts, rank, base, nx_safe, mask),
        (n_ch, tiles_x, tiles_y, g, cap, len(rows), pack_channels,
         pair_budget, precision),
    )  # (T, n_ch + 1, PIX)

    # Un-tile: (T, row, PIX) -> (row, H, W).
    out = out_tiles.reshape(tiles_y, tiles_x, n_ch + 1, TILE, TILE)
    out = jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(n_ch + 1, h, w)

    channels_img = out[:c]
    depth = out[c]
    t_final = out[c + 1]
    mask = 1.0 - t_final
    channels_img = channels_img + background[:, None, None] * t_final[None]
    if with_dropped:
        dropped = jnp.maximum(counts.sum() - pair_budget, 0)
        return channels_img, mask, depth, dropped
    return channels_img, mask, depth
