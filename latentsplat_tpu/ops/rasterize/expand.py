"""Exact pair expansion/contraction Pallas kernels (expand-by-counts).

The CUDA rasterizer duplicates each Gaussian exactly `n_rect` times — one
copy per overlapped tile — before the radix sort (characterized at
src/model/decoder/cuda_splatting.py:124-158; the duplication count is the
tile-rect area). XLA cannot express that dynamic duplication without a
gather (measured ~3 us/row on v5e, i.e. seconds at these sizes), so round
1 expanded every Gaussian to a FIXED `cap` slots and let invalid slots ride
the pair sort (3.5M rows of which ~60% were padding, ~40 ms of sort time
at the flagship scale).

These kernels produce the exact-count expansion instead (measured 0.96M
real pairs at the flagship scale — 3.7x fewer sorted rows):

  expand_by_counts: rows (R, G) + counts (G,) -> (R, P) where Gaussian i's
  column is replicated into columns [start_i, start_i + counts_i), with
  start_i the exclusive running prefix of counts.

  reduce_by_counts: the exact adjoint — sums each Gaussian's pair-column
  gradients back to (R, G).

Design (TPU-first, fully pipelined — no manual DMA, no sequential carry,
no in-kernel transposes):
  * Replication with counts is an "interval paint": out[:, d] = rows[:, i]
    for d in [start_i, end_i). That is a matmul with an indicator matrix
    N[d, i] = (start_i <= d < end_i) built from iota comparisons — MXU
    work instead of gather/scatter. Indicator matmuls have exactly one
    nonzero per output column, so HIGHEST-precision passes move f32 values
    EXACTLY (verified bitwise vs numpy on v5e at the flagship scale).
  * start offsets and block offsets are computed OUTSIDE in XLA with small
    triangular matmuls (long-axis cumsums serialize on TPU; block counts
    stay far below 2^24 so f32 prefix math is exact). `starts` and
    `counts` ride as two extra f32 rows of the input block, so the kernel
    reads everything it needs from the already-fetched tile — and the
    start row is painted into the output for free, giving callers the
    within-Gaussian slot index (pair_iota - start).
  * Per-output-block input blocks are selected by scalar-prefetched maps
    (gmap = searchsorted(block_offsets, block start)), so every input
    arrives through the automatic Pallas pipeline.
  * Each OUT_BLOCK-pair output block needs at most OUT_BLOCK // GW + 1
    consecutive GW-Gaussian input blocks PROVIDED every Gaussian emits at
    least one pair (callers give dead Gaussians one invalid-tile pair;
    only trailing padding may have count 0). OUT_BLOCK pairs span at most
    OUT_BLOCK count>=1 Gaussians, which starting anywhere inside a
    GW-block reach at most OUT_BLOCK // GW blocks further.
  * The adjoint grids over Gaussian blocks; each covers its pair span with
    cap+1 statically-indexed CHUNK-pair windows (a GW-Gaussian block emits
    at most GW*cap pairs).

Both kernels tolerate a pair budget P smaller than sum(counts): intervals
are clipped by the iota range itself, so expansion truncates and the
adjoint returns zero gradients for truncated pairs — consistent by
construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GW = 128          # gaussians per input block
OUT_BLOCK = 256   # pairs per expand output block (multiple of GW)
CHUNK = 256       # pairs per adjoint input window
N_FETCH = OUT_BLOCK // GW + 1

_HIGHEST = jax.lax.Precision.HIGHEST


def _strict_upper(k: int) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (cols > rows).astype(jnp.float32)


def block_offsets(counts: jnp.ndarray, gw: int = GW) -> jnp.ndarray:
    """Exclusive prefix of per-block count sums: (n_gblocks + 1,) int32.

    counts must be (G_pad,) with G_pad a multiple of gw. Uses one (n, n)
    triangular matmul instead of a cumsum (long-axis cumsums serialize on
    TPU; block counts are small so f32 is exact far below 2^24).
    """
    g_pad = counts.shape[0]
    n = g_pad // gw
    sums = counts.reshape(n, gw).sum(axis=1).astype(jnp.float32)
    incl = jax.lax.dot_general(
        sums[None, :], _strict_upper(n).T,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGHEST,
    )[0] + sums  # inclusive prefix
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), incl.astype(jnp.int32)]
    )


def start_offsets(counts: jnp.ndarray, gw: int = GW):
    """Per-gaussian exclusive prefix of counts as an exact f32 row, plus the
    int32 block offsets. One batched triangular matmul; no cumsum."""
    g_pad = counts.shape[0]
    n = g_pad // gw
    offs = block_offsets(counts, gw)
    cnt_blocks = counts.reshape(n, gw).astype(jnp.float32)
    prefix_within = jax.lax.dot_general(
        cnt_blocks, _strict_upper(gw),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGHEST,
    )
    starts = (prefix_within + offs[:-1, None].astype(jnp.float32)).reshape(-1)
    return starts, offs


# ---------------------------------------------------------------------------
# Expansion (forward)
# ---------------------------------------------------------------------------


def _expand_kernel(
    offs_ref,        # scalar prefetch: (n_gblocks + 1,) int32 (unused; kept
                     #   so expand/contract share the prefetch layout)
    gmap_ref,        # scalar prefetch: (n_out_blocks,) int32
    *refs,           # N_FETCH VMEM blocks (r_pad, GW) f32, then out_ref
    start_idx: int,
    cnt_idx: int,
    n_gblocks: int,
):
    rows_refs = refs[:N_FETCH]
    out_ref = refs[N_FETCH]
    c = pl.program_id(0)
    j0 = gmap_ref[c]
    p0 = (c * OUT_BLOCK).astype(jnp.float32)
    d_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (OUT_BLOCK, GW), 0).astype(jnp.float32)
        + p0
    )

    acc = jnp.zeros_like(out_ref[:])
    for k, rows_ref in enumerate(rows_refs):
        live = (j0 + k < n_gblocks).astype(jnp.float32)
        block = rows_ref[:]                               # (r_pad, GW)
        start = block[start_idx : start_idx + 1, :]       # (1, GW)
        cnt = block[cnt_idx : cnt_idx + 1, :]             # (1, GW)
        n_t = jnp.logical_and(
            d_iota >= start, d_iota < start + cnt
        ).astype(jnp.float32) * live                      # (OUT_BLOCK, GW)
        acc = acc + jax.lax.dot_general(
            block, n_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HIGHEST,
        )
    out_ref[:] = acc


def expand_by_counts(
    rows: jnp.ndarray,      # (r_pad, G_pad) f32; must contain the exact f32
                            # prefix row at `start_idx` (from start_offsets)
                            # and counts as f32 at `cnt_idx`
    counts: jnp.ndarray,    # (G_pad,) int32; >= 1 for real gaussians except a
                            # trailing zero-padding run (see module docstring)
    pair_budget: int,       # P, multiple of OUT_BLOCK
    start_idx: int,
    cnt_idx: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Replicate columns by counts: (r_pad, P). See module docstring."""
    r_pad, g_pad = rows.shape
    assert g_pad % GW == 0 and pair_budget % OUT_BLOCK == 0
    assert r_pad % 8 == 0
    n_gblocks = g_pad // GW
    n_out = pair_budget // OUT_BLOCK

    offs = block_offsets(counts, GW)                       # (n_gblocks + 1,)
    p0s = jnp.arange(n_out, dtype=jnp.int32) * OUT_BLOCK
    gmap = (
        jnp.searchsorted(offs, p0s, side="right").astype(jnp.int32) - 1
    )
    gmap = jnp.clip(gmap, 0, n_gblocks - 1)

    def rows_spec(k):
        return pl.BlockSpec(
            (r_pad, GW),
            lambda c, offs_r, gmap_r, k=k: (
                0, jnp.minimum(gmap_r[c] + k, n_gblocks - 1)
            ),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_out,),
        in_specs=[rows_spec(k) for k in range(N_FETCH)],
        out_specs=pl.BlockSpec(
            (r_pad, OUT_BLOCK), lambda c, *_: (0, c)
        ),
    )
    kernel = functools.partial(
        _expand_kernel,
        start_idx=start_idx, cnt_idx=cnt_idx, n_gblocks=n_gblocks,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, pair_budget), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(offs, gmap, *([rows] * N_FETCH))


# ---------------------------------------------------------------------------
# Contraction (adjoint)
# ---------------------------------------------------------------------------


def _contract_kernel(
    offs_ref,        # scalar prefetch: (n_gblocks + 1,) int32
    meta_ref,        # VMEM block: (8, GW) f32 — row 0 starts, row 1 counts
    *refs,           # n_win VMEM blocks (r_pad, CHUNK) f32, then out_ref
    n_win: int,
    pair_budget: int,
):
    d_refs = refs[:n_win]
    out_ref = refs[n_win]
    j = pl.program_id(0)
    c_base = (offs_ref[j] // CHUNK) * CHUNK

    start = meta_ref[0:1, :]                               # (1, GW)
    cnt = meta_ref[1:2, :]

    d0 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, GW), 0).astype(jnp.float32)
    acc = jnp.zeros_like(out_ref[:])
    for k in range(n_win):
        d_abs = d0 + (c_base + k * CHUNK).astype(jnp.float32)
        n_mat = (
            (d_abs >= start)
            & (d_abs < start + cnt)
            & (d_abs < float(pair_budget))
        ).astype(jnp.float32)                              # (CHUNK, GW)
        acc = acc + jax.lax.dot_general(
            d_refs[k][:], n_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HIGHEST,
        )
    out_ref[:] = acc


def reduce_by_counts(
    d_pairs: jnp.ndarray,   # (r_pad, P) f32, pair-major (expanded layout)
    counts: jnp.ndarray,    # (G_pad,) int32 — same as given to expand
    max_count: int,         # static bound on counts (the tile cap)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Adjoint of expand_by_counts: sum pair columns per gaussian, (r_pad, G_pad)."""
    r_pad, pair_budget = d_pairs.shape
    g_pad = counts.shape[0]
    assert g_pad % GW == 0 and pair_budget % CHUNK == 0
    n_gblocks = g_pad // GW
    n_chunks = pair_budget // CHUNK
    # A GW-gaussian block spans <= GW * max_count pairs. Windows are
    # CHUNK-aligned starting at or before the block's first pair, so a block
    # whose start is misaligned by up to CHUNK-1 needs ceil(span/CHUNK) + 1
    # windows (floor undercovers whenever CHUNK does not divide the span and
    # silently zeroes the tail gaussians' gradients).
    n_win = -(-(GW * max_count) // CHUNK) + 1

    starts, offs = start_offsets(counts, GW)
    meta = jnp.zeros((8, g_pad), jnp.float32)
    meta = meta.at[0].set(starts).at[1].set(counts.astype(jnp.float32))

    def win_spec(k):
        return pl.BlockSpec(
            (r_pad, CHUNK),
            lambda j, offs_r, k=k: (
                0, jnp.minimum(offs_r[j] // CHUNK + k, n_chunks - 1)
            ),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_gblocks,),
        in_specs=[
            pl.BlockSpec((8, GW), lambda j, offs_r: (0, j)),
            *[win_spec(k) for k in range(n_win)],
        ],
        out_specs=pl.BlockSpec((r_pad, GW), lambda j, *_: (0, j)),
    )
    kernel = functools.partial(
        _contract_kernel, n_win=n_win, pair_budget=pair_budget
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, g_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(offs, meta, *([d_pairs] * n_win))
