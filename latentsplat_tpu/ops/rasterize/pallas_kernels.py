"""Pallas TPU kernels for tiled front-to-back Gaussian compositing.

TPU-native equivalent of the reference's CUDA tile rasterizer forward and
backward (external `latent-gaussian-rasterization`, characterized at
src/model/decoder/cuda_splatting.py:124-158), shaped by measured TPU
constraints rather than a CUDA translation:

  * XLA gathers / scatters / cumsums over millions of rows serialize
    (~3 us/row measured on v5e) — but `lax.sort` streams at ~60 ms for
    3.5M elements with 7 payload operands riding the sort network. So the
    CUDA duplicate-sort-bin pipeline is reproduced with SORTS ONLY: pairs
    are generated gaussian-major (pure broadcasting), stable-sorted once by
    a composite int32 key (tile << 19 | depth_rank — exact, since
    G < 2^19), and per-tile segment bounds come from searchsorted. No
    scatter anywhere; the backward returns pair gradients to gaussian-major
    order with the same sort trick (stable sort by the carried pair index)
    and reduces over the duplication axis with a reshape-sum.
  * Attributes are stored TRANSPOSED (n_attr_pad, n_pairs): TPU DMA slices
    need a lane-aligned minor dimension. Tile segments are NOT aligned;
    each tile reads CHUNK-aligned windows covering [start, end) and masks
    rows outside its segment.
  * The (n_attr_pad, CHUNK) chunk is transposed to pair-major via an
    identity matmul on the MXU (always lowers; narrow-matrix relayouts are
    version-dependent).
  * Per-chunk transmittance uses log-space prefix sums computed as a
    strictly-lower-triangular matmul on the MXU; channel accumulation is
    one [C,K]x[K,P] matmul per chunk, also on the MXU.
  * Early exit per tile when every pixel saturates (log T < log 1e-4),
    mirroring the CUDA kernel's T < 0.0001 cutoff. The number of processed
    chunks is emitted (as an extra output row — TPU pallas rejects narrow
    SMEM output blocks) so the backward replays exactly the same prefix.
  * Backward re-traverses the same chunks in reverse, reconstructing
    transmittance from the saved final value in log space (stable because
    alpha <= 0.99). Adjacent tiles' chunk windows can overlap (unaligned
    segments), so gradients ACCUMULATE into d_attrs via read-modify-write;
    grid steps on a TPU core run sequentially ("arbitrary" dimension
    semantics), making the RMW race-free — the TPU answer to CUDA's
    atomicAdd.

Attribute row layout (n_attr = 6 + n_ch where n_ch = payload channels + 1
expected-depth channel): [x, y, conic_a, conic_b, conic_c, opacity,
channels..., depth]; rows beyond 6 + n_ch are alignment padding (zeros).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16                      # pixels per tile side
PIX = TILE * TILE              # pixels per tile (lane axis)
CHUNK = 512                    # pairs composited per inner step
SCAN_BLOCK = 128               # prefix-scan matmul block (see _excl_scan)
ALPHA_THRESHOLD = 1.0 / 255.0
ALPHA_CLAMP = 0.99
LOG_SATURATION = math.log(1.0e-4)


def pad_attr_rows(n_attr: int) -> int:
    """Attribute rows padded to the f32 sublane tile (8)."""
    return ((n_attr + 7) // 8) * 8


def _pixel_coords(tile_id, tiles_x):
    """Flattened pixel-center coordinates of a tile: two (1, PIX) f32 arrays."""
    ty = tile_id // tiles_x
    tx = tile_id % tiles_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (tx * TILE + p % TILE).astype(jnp.float32)
    py = (ty * TILE + p // TILE).astype(jnp.float32)
    return px, py


def _strict_lower(k: int) -> jnp.ndarray:
    """L[i, j] = 1 if j < i (exclusive-prefix-sum matmul operator)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (cols < rows).astype(jnp.float32)


def _strict_upper(k: int) -> jnp.ndarray:
    """U[i, j] = 1 if j > i (exclusive-suffix-sum matmul operator)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (cols > rows).astype(jnp.float32)


def _eye(k: int) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (cols == rows).astype(jnp.float32)


def _transpose_mxu(m: jnp.ndarray) -> jnp.ndarray:
    """(a, b) -> (b, a) via an identity matmul on the MXU.

    MUST run at Precision.HIGHEST: Mosaic's DEFAULT f32 dot is a single
    bf16 pass (measured on v5e — max err 4.9 on coefficient-magnitude
    inputs, identical to explicitly bf16-cast inputs), which would round
    every attribute row to bf16 on its way into the compositor. An
    indicator (0/1) matmul at HIGHEST moves f32 values bitwise-exactly
    (NOTES.md TPU-facts table)."""
    return jax.lax.dot_general(
        m, _eye(m.shape[0]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _mm(a: jnp.ndarray, b: jnp.ndarray, dims, fast: bool) -> jnp.ndarray:
    """dot_general with f32 accumulation. `fast` feeds the MXU bf16 inputs
    (native-rate single pass, ~0.4% rel input quantization); non-fast runs
    Precision.HIGHEST — on TPU the DEFAULT f32 dot is itself a single bf16
    pass (measured, see _transpose_mxu), so exact mode must ask for the
    multi-pass decomposition explicitly. Used for the per-chunk
    scan/channel matmuls."""
    if fast:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _coef_basis() -> jnp.ndarray:
    """Tile-relative quadratic pixel basis (8, PIX) for coefficient-layout
    alpha evaluation: rows [px^2, px, py^2, py, px*py, 1, 0, 0].

    With tile-RELATIVE pixel coords (px, py in [0, TILE)) the basis is the
    same for every tile, and all products stay small enough that the f32
    matmul's error is ~1e-4 absolute in the exponent (extent-threshold
    relation bounds conic*offset^2 by ~2*log(255)). Rows 6-7 are zero so a
    (CHUNK, 8) @ (8, PIX) contraction can slice the first 8 attribute rows
    without masking whatever lives in rows 6-7 (channels)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    pxr = (p % TILE).astype(jnp.float32)
    pyr = (p // TILE).astype(jnp.float32)
    one = jnp.ones((1, PIX), jnp.float32)
    zero = jnp.zeros((2, PIX), jnp.float32)
    return jnp.concatenate(
        [pxr * pxr, pxr, pyr * pyr, pyr, pxr * pyr, one, zero], axis=0
    )


def _chunk_alpha_coef(attrs_rows, basis, chunk_offset, seg_start, seg_end):
    """Coefficient-layout alpha [CHUNK, PIX]: one MXU matmul per chunk.

    attrs_rows is the ROW-MAJOR (n_attr_pad, CHUNK) VMEM buffer — no full
    transpose needed: the contraction runs over the buffer's leading dim
    (lhs.T @ rhs form, native on the MXU). Rows 0-5 hold per-pair quadratic
    coefficients such that coef @ basis == power + log(opacity) (see
    tiled.py's inference fast path). Replaces ~11 VPU flops per
    (pair, pixel) of _chunk_alpha's elementwise quadratic with an MXU
    contraction — the compositor is VPU-bound, so alpha math rides the
    idle MXU instead. HIGHEST precision: a bf16 1-pass product of
    coefficients up to ~500 would put ~2.0 absolute error in the exponent.

    No power>0 wraparound guard: the projection clamps the conic to
    strict positive definiteness with a bf16-safe margin (camera.py), so
    `power <= 0` everywhere up to f32 evaluation rounding (~1e-3 in the
    exponent at the center, a <=0.1% alpha wiggle); exp(power_op) is
    bounded by opacity and the ALPHA_THRESHOLD mask handles the tail.
    """
    power_op = jax.lax.dot_general(
        attrs_rows[0:8, :], basis,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                              # (CHUNK, PIX)
    alpha = jnp.minimum(ALPHA_CLAMP, jnp.exp(power_op))
    alpha = jnp.where(alpha < ALPHA_THRESHOLD, 0.0, alpha)

    idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + chunk_offset
    in_segment = jnp.logical_and(idx >= seg_start, idx < seg_end)
    return jnp.where(in_segment, alpha, 0.0)


def _excl_scan(la, fast: bool):
    """Exclusive prefix sum of (CHUNK, PIX) along CHUNK, block-partitioned.

    A single strictly-lower-triangular matmul costs CHUNK^2 * PIX MACs; at
    CHUNK=512 that quadruples the CHUNK=256 cost. Splitting into
    SCAN_BLOCK-row blocks (within-block triangular matmul + a running
    between-block total) keeps the MXU cost linear in CHUNK, which is what
    lets CHUNK grow to amortize the compositor's per-chunk fixed overhead
    (loop/DMA bookkeeping, the early-exit cross-lane max) without paying a
    quadratic scan. Returns (excl, total) with total = sum over all rows.
    """
    lower = _strict_lower(SCAN_BLOCK)
    nb = CHUNK // SCAN_BLOCK
    tot = jnp.zeros((1, la.shape[1]), jnp.float32)
    parts = []
    for b in range(nb):
        la_b = la[b * SCAN_BLOCK : (b + 1) * SCAN_BLOCK]
        parts.append(_mm(lower, la_b, ((1,), (0,)), fast) + tot)
        tot = tot + jnp.sum(la_b, axis=0, keepdims=True)
    return jnp.concatenate(parts, axis=0), tot


def _suffix_scan(x, fast: bool):
    """Exclusive suffix sum of (CHUNK, PIX) along CHUNK, block-partitioned
    (reverse-order counterpart of _excl_scan). Returns (suffix, total)."""
    upper = _strict_upper(SCAN_BLOCK)
    nb = CHUNK // SCAN_BLOCK
    tot = jnp.zeros((1, x.shape[1]), jnp.float32)
    parts = []
    for b in reversed(range(nb)):
        x_b = x[b * SCAN_BLOCK : (b + 1) * SCAN_BLOCK]
        parts.append(_mm(upper, x_b, ((1,), (0,)), fast) + tot)
        tot = tot + jnp.sum(x_b, axis=0, keepdims=True)
    return jnp.concatenate(parts[::-1], axis=0), tot


def _row_sum(x: jnp.ndarray, fast: bool) -> jnp.ndarray:
    """Sum (CHUNK, PIX) over PIX into a (1, CHUNK) ROW via an MXU matvec
    against ones. Produces the row-major orientation the backward's
    gradient accumulator stores, so the per-chunk gradient block never
    needs the (CHUNK, n_attr) -> (n_attr, CHUNK) transpose a column-major
    jnp.sum layout would force (that transpose costs n_attr*CHUNK^2 MACs
    per chunk — comparable to the scan matmul at HIGHEST precision)."""
    ones = jnp.ones((1, x.shape[1]), jnp.float32)
    return _mm(ones, x, ((1,), (1,)), fast)


def _chunk_alpha(attrs, px, py, chunk_offset, seg_start, seg_end):
    """Alpha [CHUNK, PIX] of one attribute chunk, with validity masking.

    attrs: (CHUNK, n_attr_pad) pair-major VMEM values. chunk_offset: global
    index of this chunk's first pair; rows outside [seg_start, seg_end) —
    the tile's segment — are masked (chunks are CHUNK-aligned windows over
    an unaligned segment).
    Returns (alpha, power, dx, dy, exp_power).
    """
    x = attrs[:, 0:1]
    y = attrs[:, 1:2]
    ca = attrs[:, 2:3]
    cb = attrs[:, 3:4]
    cc = attrs[:, 4:5]
    op = attrs[:, 5:6]

    dx = px - x          # (CHUNK, PIX)
    dy = py - y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    # Clamp the exponent at 0: every row with power > 0 has its alpha
    # zeroed below, so the clamp never changes a live alpha — but WITHOUT
    # it, a near-degenerate conic (bf16 rounding in fast mode, or fp error
    # on near-singular covariances) can make the cross term dominate at
    # far in-window offsets (|dx*dy| ~ 6400 at the 64 px tile-relative
    # range), reaching power ~ +90 and exp(power) = inf. The forward
    # survives (alpha is zeroed) but the backward's
    # d_opacity = d_alpha * exp_power * mask becomes inf * 0 = NaN,
    # silently poisoning every parameter upstream of the rasterizer on the
    # first training step (caught by the on-chip convergence run,
    # benchmarks/convergence_128px.json).
    exp_power = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_CLAMP, op * exp_power)
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_THRESHOLD, 0.0, alpha)

    idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + chunk_offset
    in_segment = jnp.logical_and(idx >= seg_start, idx < seg_end)
    alpha = jnp.where(in_segment, alpha, 0.0)
    return alpha, power, dx, dy, exp_power


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    tile_starts,     # scalar prefetch: (num_tiles + 1,) int32 (unaligned)
    attrs,           # ANY/HBM: (n_attr_pad, n_pairs_pad) f32, tile-sorted
    out_ref,         # VMEM block: (1, n_ch + 2, PIX) f32
                     #   rows [0, n_ch) = channels, n_ch = T_final,
                     #   n_ch + 1 = processed-chunk count (broadcast f32)
    attr_buf0,       # VMEM scratch: (n_attr_pad, CHUNK) f32 (double buffer 0)
    attr_buf1,       # VMEM scratch: (n_attr_pad, CHUNK) f32 (double buffer 1)
    lt_ref,          # VMEM scratch: (1, PIX) f32 (log transmittance)
    sem0,            # DMA semaphore (buffer 0)
    sem1,            # DMA semaphore (buffer 1)
    *,
    n_ch: int,
    tiles_x: int,
    n_chunks_total: int,
    fast: bool,
    coef: bool,
):
    t = pl.program_id(0)
    start = tile_starts[t]
    end = tile_starts[t + 1]
    start_chunk = start // CHUNK
    n_chunks = (end + CHUNK - 1) // CHUNK - start_chunk

    if coef:
        basis = _coef_basis()
    else:
        px, py = _pixel_coords(t, tiles_x)

    out_ref[0] = jnp.zeros_like(out_ref[0])
    lt_ref[:] = jnp.zeros_like(lt_ref)

    bufs = (attr_buf0, attr_buf1)
    sems = (sem0, sem1)

    def fetch(i, parity):
        """Start the chunk-i DMA into the parity buffer (clamped in-range
        so the one-ahead prefetch never reads past the array)."""
        pos = jnp.minimum(start_chunk + i, n_chunks_total - 1) * CHUNK
        for p in (0, 1):

            @pl.when(parity == p)
            def _():
                pltpu.make_async_copy(
                    attrs.at[:, pl.ds(pos, CHUNK)], bufs[p], sems[p]
                ).start()

    @pl.when(n_chunks > 0)
    def _prefetch_first():
        fetch(jnp.int32(0), jnp.int32(0))

    def body(state):
        i, _ = state
        parity = jax.lax.rem(i, 2)
        # Start the next chunk's DMA before waiting on the current one.
        fetch(i + 1, 1 - parity)
        for p in (0, 1):

            @pl.when(parity == p)
            def _():
                pltpu.make_async_copy(
                    attrs.at[:, pl.ds(jnp.int32(0), CHUNK)], bufs[p], sems[p]
                ).wait()

        pos = (start_chunk + i) * CHUNK  # provably lane-aligned
        # Select the filled buffer (cheap VPU op); the forward needs NO
        # full-buffer transpose: alpha contracts over the buffer's row dim
        # (lhs.T @ rhs, native MXU form) and the channel accumulation reads
        # the channel rows in their stored (n_ch, CHUNK) orientation. Only
        # the non-coef path transposes the 6 geometry rows into columns
        # (a 6-row HIGHEST matmul, ~CHUNK*36 MACs).
        buf = jnp.where(parity == 0, attr_buf0[:], attr_buf1[:])

        if coef:
            alpha = _chunk_alpha_coef(buf, basis, pos, start, end)
        else:
            a6 = _transpose_mxu(buf[0:6, :])        # (CHUNK, 6)
            alpha, _, _, _, _ = _chunk_alpha(a6, px, py, pos, start, end)

        la = jnp.log1p(-alpha)                      # (CHUNK, PIX), <= 0
        excl, la_tot = _excl_scan(la, fast)
        lt = lt_ref[:]                              # (1, PIX)
        weight = alpha * jnp.exp(lt + excl)         # (CHUNK, PIX)

        chans = buf[6 : 6 + n_ch, :]                # (n_ch, CHUNK)
        acc = _mm(chans, weight, ((1,), (0,)), fast)  # (n_ch, PIX)
        out_ref[0, 0:n_ch, :] += acc

        lt_new = lt + la_tot
        lt_ref[:] = lt_new
        return i + 1, jnp.max(lt_new)

    def cond(state):
        i, ltmax = state
        return jnp.logical_and(i < n_chunks, ltmax > LOG_SATURATION)

    final_i, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))

    # Drain the in-flight prefetch so the next grid step's DMAs can't race
    # this tile's outstanding transfer (exactly one is pending whenever at
    # least one chunk was processed).
    @pl.when(n_chunks > 0)
    def _drain():
        parity = jax.lax.rem(final_i, 2)
        for p in (0, 1):

            @pl.when(parity == p)
            def _():
                pltpu.make_async_copy(
                    attrs.at[:, pl.ds(jnp.int32(0), CHUNK)], bufs[p], sems[p]
                ).wait()

    out_ref[0, n_ch, :] = jnp.exp(lt_ref[0])
    out_ref[0, n_ch + 1, :] = jnp.full((PIX,), final_i.astype(jnp.float32))


def composite_pairs_fwd(
    attrs_pairs: jnp.ndarray,   # (n_attr_pad, n_pairs_pad) f32, tile-sorted
    tile_starts: jnp.ndarray,   # (num_tiles + 1,) int32
    *,
    n_ch: int,
    tiles_x: int,
    tiles_y: int,
    interpret: bool = False,
    fast: bool = False,
    coef: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the forward kernel. Returns (out_tiles [T, n_ch+1, PIX], done [T]).

    coef=True switches alpha evaluation to the coefficient layout (rows 0-5
    are quadratic coefficients, row 6+n_ch is log-opacity; see
    _chunk_alpha_coef). Only the inference fast path produces this layout —
    the backward kernel reads the plain geometry layout."""
    num_tiles = tiles_x * tiles_y
    n_attr = attrs_pairs.shape[0]
    n_chunks_total = attrs_pairs.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, n_ch + 2, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_attr, CHUNK), jnp.float32),
            pltpu.VMEM((n_attr, CHUNK), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, n_ch=n_ch, tiles_x=tiles_x,
        n_chunks_total=n_chunks_total, fast=fast, coef=coef,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, n_ch + 2, PIX), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(tile_starts, attrs_pairs)
    out_tiles = out[:, : n_ch + 1]
    done = out[:, n_ch + 1, 0].astype(jnp.int32)
    return out_tiles, done


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    tile_starts,     # scalar prefetch: (num_tiles + 1,) int32
    done_s,          # scalar prefetch: (num_tiles,) int32
    attrs,           # ANY/HBM: (n_attr_pad, n_pairs_pad) f32
    g_tiles,         # VMEM block: (1, n_ch + 1, PIX) f32 cotangents
    t_final,         # VMEM block: (1, 1, PIX) f32 final transmittance
    d_attrs,         # ANY/HBM out: (n_attr_pad, n_pairs_pad) f32, ACCUMULATED
                     #   (program 0 zero-fills it first; the grid is
                     #   sequential so later programs see the memset, and
                     #   RMW accumulation makes overlapping chunk windows of
                     #   adjacent tiles race-free)
    attr_buf0,       # VMEM scratch: (n_attr_pad, CHUNK) f32 (double buffer 0)
    attr_buf1,       # VMEM scratch: (n_attr_pad, CHUNK) f32 (double buffer 1)
    grad_tmp,        # VMEM scratch: (n_attr_pad, CHUNK) f32 (row-major)
    acc_buf0,        # VMEM scratch: (n_attr_pad, CHUNK) f32 (RMW accumulator 0)
    acc_buf1,        # VMEM scratch: (n_attr_pad, CHUNK) f32 (RMW accumulator 1)
    lt_ref,          # VMEM scratch: (1, PIX) f32 (log T *after* current chunk)
    s_ref,           # VMEM scratch: (1, PIX) f32 (suffix dot-product state)
    sem_in0,         # DMA semaphores (attr loads, per buffer)
    sem_in1,
    sem_acc0,        # DMA semaphores (grad RMW loads, per buffer)
    sem_acc1,
    sem_out0,        # DMA semaphores (stores, per buffer)
    sem_out1,
    *,
    n_ch: int,
    tiles_x: int,
    n_chunks_total: int,
    fast: bool,
):
    t = pl.program_id(0)
    start = tile_starts[t]
    end = tile_starts[t + 1]
    start_chunk = start // CHUNK
    done = done_s[t]

    px, py = _pixel_coords(t, tiles_x)

    g_ch = g_tiles[0, 0:n_ch, :]          # (n_ch, PIX)
    g_t = g_tiles[0, n_ch, :][None, :]    # (1, PIX) cotangent of T_final
    t_n = t_final[0, 0, :][None, :]       # (1, PIX)

    # log T after the last processed chunk; exp/log round trip is safe since
    # T_final is exactly exp(lt) from the forward.
    lt_ref[:] = jnp.log(jnp.maximum(t_n, 1e-38))
    s_ref[:] = g_t * t_n

    # Zero the padding columns once; the loop only writes [0, 6 + n_ch).
    grad_tmp[:] = jnp.zeros_like(grad_tmp)

    # Program 0 initializes the gradient accumulator (sequential grid).
    @pl.when(t == 0)
    def _memset():
        acc_buf0[:] = jnp.zeros_like(acc_buf0)

        def zero_chunk(j, _):
            store = pltpu.make_async_copy(
                acc_buf0, d_attrs.at[:, pl.ds(j * CHUNK, CHUNK)], sem_out0
            )
            store.start()
            store.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks_total, zero_chunk, 0)

    # Double-buffered pipeline over descending chunk index i (parity i & 1):
    # while chunk i computes, chunk i-1's attr + accumulator loads are in
    # flight into the other buffers and chunk i+1's store drains. A store
    # from buffer b must complete before the NEXT acc load overwrites b —
    # body(i) waits store(i+1) (buffer 1-p) right before loading into 1-p.
    abufs = (attr_buf0, attr_buf1)
    asems = (sem_in0, sem_in1)
    cbufs = (acc_buf0, acc_buf1)
    csems = (sem_acc0, sem_acc1)
    osems = (sem_out0, sem_out1)

    def attr_start(i, parity, cond):
        pos = jnp.maximum(start_chunk + i, 0) * CHUNK
        for p in (0, 1):

            @pl.when(jnp.logical_and(cond, parity == p))
            def _():
                pltpu.make_async_copy(
                    attrs.at[:, pl.ds(pos, CHUNK)], abufs[p], asems[p]
                ).start()

    def acc_start(i, parity, cond):
        pos = jnp.maximum(start_chunk + i, 0) * CHUNK
        for p in (0, 1):

            @pl.when(jnp.logical_and(cond, parity == p))
            def _():
                pltpu.make_async_copy(
                    d_attrs.at[:, pl.ds(pos, CHUNK)], cbufs[p], csems[p]
                ).start()

    def _wait(bufs, sems, src, parity, cond):
        for p in (0, 1):

            @pl.when(jnp.logical_and(cond, parity == p))
            def _():
                pltpu.make_async_copy(
                    src.at[:, pl.ds(jnp.int32(0), CHUNK)], bufs[p], sems[p]
                ).wait()

    def store_start(i, parity):
        pos = (start_chunk + i) * CHUNK
        for p in (0, 1):

            @pl.when(parity == p)
            def _():
                pltpu.make_async_copy(
                    cbufs[p], d_attrs.at[:, pl.ds(pos, CHUNK)], osems[p]
                ).start()

    def store_wait(parity, cond):
        for p in (0, 1):

            @pl.when(jnp.logical_and(cond, parity == p))
            def _():
                pltpu.make_async_copy(
                    cbufs[p], d_attrs.at[:, pl.ds(jnp.int32(0), CHUNK)],
                    osems[p],
                ).wait()

    first = done - 1
    first_par = jax.lax.rem(jnp.maximum(first, 0), 2)
    attr_start(first, first_par, done > 0)
    acc_start(first, first_par, done > 0)

    def body(state):
        (i,) = state
        pos = (start_chunk + i) * CHUNK
        parity = jax.lax.rem(i, 2)
        # Prefetch chunk i-1's attrs; drain store(i+1) before its acc load
        # reuses buffer 1-parity.
        attr_start(i - 1, 1 - parity, i > 0)
        store_wait(1 - parity, i < first)
        acc_start(i - 1, 1 - parity, i > 0)

        _wait(abufs, asems, attrs, parity, True)
        # Select first, then transpose ONLY the 6 geometry rows into
        # columns (see fwd kernel); channels contract straight from their
        # stored (n_ch, CHUNK) orientation.
        buf = jnp.where(parity == 0, attr_buf0[:], attr_buf1[:])
        a = _transpose_mxu(buf[0:6, :])                # (CHUNK, 6)
        alpha, _, dx, dy, exp_power = _chunk_alpha(a, px, py, pos, start, end)
        op = a[:, 5:6]
        ca = a[:, 2:3]
        cb = a[:, 3:4]
        cc = a[:, 4:5]

        la = jnp.log1p(-alpha)
        excl, total = _excl_scan(la, fast)             # total: (1, PIX)
        lt_out = lt_ref[:]
        lt_in = lt_out - total
        t_i = jnp.exp(lt_in + excl)                    # (CHUNK, PIX)
        w = alpha * t_i

        cg = _mm(buf[6 : 6 + n_ch, :], g_ch, ((0,), (0,)), fast)
        contrib = w * cg                               # (CHUNK, PIX)
        suffix, contrib_tot = _suffix_scan(contrib, fast)
        s_full = suffix + s_ref[:]

        d_alpha = cg * t_i - s_full / (1.0 - alpha)

        live = (alpha > 0.0).astype(jnp.float32)
        unclamped = (op * exp_power < ALPHA_CLAMP).astype(jnp.float32)
        m = live * unclamped

        d_op_px = d_alpha * exp_power * m              # (CHUNK, PIX)
        d_pow = d_alpha * alpha * m

        d_op = _row_sum(d_op_px, fast)                 # (1, CHUNK)
        d_ca = _row_sum(-0.5 * dx * dx * d_pow, fast)
        d_cb = _row_sum(-dx * dy * d_pow, fast)
        d_cc = _row_sum(-0.5 * dy * dy * d_pow, fast)
        d_mx = _row_sum((ca * dx + cb * dy) * d_pow, fast)
        d_my = _row_sum((cc * dy + cb * dx) * d_pow, fast)

        d_chans = _mm(g_ch, w, ((1,), (1,)), fast)     # (n_ch, CHUNK)

        grad_tmp[0:1, :] = d_mx
        grad_tmp[1:2, :] = d_my
        grad_tmp[2:3, :] = d_ca
        grad_tmp[3:4, :] = d_cb
        grad_tmp[4:5, :] = d_cc
        grad_tmp[5:6, :] = d_op
        grad_tmp[6 : 6 + n_ch, :] = d_chans

        _wait(cbufs, csems, d_attrs, parity, True)
        g_acc = grad_tmp[:]
        for p in (0, 1):

            @pl.when(parity == p)
            def _():
                cbufs[p][:] = cbufs[p][:] + g_acc

        store_start(i, parity)

        s_ref[:] = s_ref[:] + contrib_tot
        lt_ref[:] = lt_in
        return (i - 1,)

    jax.lax.while_loop(lambda s: s[0] >= 0, body, (done - 1,))

    # Drain the final store (iteration 0, buffer 0) before the next grid
    # step's acc load can touch the same chunk window.
    store_wait(jnp.int32(0), done > 0)


def composite_pairs_bwd(
    attrs_pairs: jnp.ndarray,   # (n_attr_pad, n_pairs_pad) f32
    tile_starts: jnp.ndarray,   # (num_tiles + 1,) int32
    done: jnp.ndarray,          # (num_tiles,) int32
    g_tiles: jnp.ndarray,       # (T, n_ch + 1, PIX)
    t_final: jnp.ndarray,       # (T, 1, PIX)
    *,
    n_ch: int,
    tiles_x: int,
    tiles_y: int,
    interpret: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """Run the backward kernel. Returns accumulated d_attrs_pairs."""
    num_tiles = tiles_x * tiles_y
    n_attr = attrs_pairs.shape[0]
    n_chunks_total = attrs_pairs.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_ch + 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_attr, CHUNK), jnp.float32),
            pltpu.VMEM((n_attr, CHUNK), jnp.float32),
            pltpu.VMEM((n_attr, CHUNK), jnp.float32),
            pltpu.VMEM((n_attr, CHUNK), jnp.float32),
            pltpu.VMEM((n_attr, CHUNK), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, n_ch=n_ch, tiles_x=tiles_x,
        n_chunks_total=n_chunks_total, fast=fast,
    )
    d_attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(attrs_pairs.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(tile_starts, done, attrs_pairs, g_tiles, t_final)
    return d_attrs
