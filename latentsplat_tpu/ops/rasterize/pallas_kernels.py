"""Pallas TPU kernels for tiled front-to-back Gaussian compositing.

TPU-native equivalent of the reference's CUDA tile rasterizer forward and
backward (external `latent-gaussian-rasterization`, characterized at
src/model/decoder/cuda_splatting.py:124-158). Design (see also
ops/rasterize/tiled.py for the XLA-side binning):

  * One grid program per 16x16 pixel tile; pixels are kept flattened as the
    lane axis (256 = 2x128 lanes).
  * The tile's depth-ordered pair list is contiguous in HBM after the
    stable tile sort; chunks of K pairs are DMA'd into VMEM inside a
    while loop with a per-tile dynamic trip count (scalar-prefetched
    tile offsets).
  * Per-chunk transmittance uses log-space prefix sums computed as a
    strictly-lower-triangular matmul on the MXU (instead of a sequential
    scan, the CUDA approach); channel accumulation is one [C,K]x[K,P]
    matmul per chunk, also on the MXU.
  * Early exit per tile when every pixel saturates (log T < log 1e-4),
    mirroring the CUDA kernel's T < 0.0001 cutoff. The number of processed
    chunks is emitted so the backward pass replays exactly the same prefix.
  * Backward re-traverses chunks in reverse, reconstructing transmittance
    from the saved final value in log space (stable because alpha <= 0.99),
    and computes per-pair gradients for mean2d/conic/opacity/channels that
    the caller scatter-adds back per Gaussian (atomics-free, unlike CUDA's
    atomicAdd).

Attribute row layout (n_attr = 6 + n_ch where n_ch = payload channels + 1
expected-depth channel): [x, y, conic_a, conic_b, conic_c, opacity,
channels..., depth].
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
CHUNK = 128                    # pairs composited per inner step
ALPHA_THRESHOLD = 1.0 / 255.0
ALPHA_CLAMP = 0.99
LOG_SATURATION = math.log(1.0e-4)


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


def _chunk_alpha(attrs, px, py, pair_offset, pair_end):
    """Alpha [CHUNK, PIX] of one attribute chunk, with validity masking.

    attrs: (CHUNK, n_attr) VMEM values. pair_offset/pair_end: global pair
    index bounds for overrun masking (a tile's last chunk may read into the
    next tile's pairs).
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
    exp_power = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_CLAMP, op * exp_power)
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_THRESHOLD, 0.0, alpha)

    idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + pair_offset
    alpha = jnp.where(idx < pair_end, alpha, 0.0)
    return alpha, power, dx, dy, exp_power


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    tile_starts,     # scalar prefetch: (num_tiles + 1,) int32
    attrs,           # ANY/HBM: (n_pairs_padded, n_attr) f32
    out_ref,         # VMEM block: (1, n_ch + 1, PIX) f32
    done_ref,        # SMEM block: (1,) int32
    attr_buf,        # VMEM scratch: (CHUNK, n_attr) f32
    lt_ref,          # VMEM scratch: (1, PIX) f32 (log transmittance)
    sem,             # DMA semaphore
    *,
    n_ch: int,
    tiles_x: int,
):
    t = pl.program_id(0)
    start = tile_starts[t]
    end = tile_starts[t + 1]
    n = end - start
    n_chunks = (n + CHUNK - 1) // CHUNK

    px, py = _pixel_coords(t, tiles_x)

    out_ref[0] = jnp.zeros_like(out_ref[0])
    lt_ref[:] = jnp.zeros_like(lt_ref)

    lower = _strict_lower(CHUNK)

    def body(state):
        i, _ = state
        pos = start + i * CHUNK
        copy = pltpu.make_async_copy(
            attrs.at[pl.ds(pos, CHUNK), :], attr_buf, sem
        )
        copy.start()
        copy.wait()
        a = attr_buf[:]

        alpha, _, _, _, _ = _chunk_alpha(a, px, py, pos, end)

        la = jnp.log1p(-alpha)                      # (CHUNK, PIX), <= 0
        excl = jnp.dot(lower, la, preferred_element_type=jnp.float32)
        lt = lt_ref[:]                              # (1, PIX)
        weight = alpha * jnp.exp(lt + excl)         # (CHUNK, PIX)

        chans = a[:, 6 : 6 + n_ch]                  # (CHUNK, n_ch)
        acc = jax.lax.dot_general(
            chans, weight,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (n_ch, PIX)
        out_ref[0, 0:n_ch, :] += acc

        lt_new = lt + jnp.sum(la, axis=0, keepdims=True)
        lt_ref[:] = lt_new
        return i + 1, jnp.max(lt_new)

    def cond(state):
        i, ltmax = state
        return jnp.logical_and(i < n_chunks, ltmax > LOG_SATURATION)

    final_i, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))

    out_ref[0, n_ch, :] = jnp.exp(lt_ref[0])
    done_ref[0] = final_i


def composite_pairs_fwd(
    attrs_pairs: jnp.ndarray,   # (n_pairs_padded, n_attr) f32
    tile_starts: jnp.ndarray,   # (num_tiles + 1,) int32
    *,
    n_ch: int,
    tiles_x: int,
    tiles_y: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the forward kernel. Returns (out_tiles [T, n_ch+1, PIX], done [T])."""
    num_tiles = tiles_x * tiles_y
    n_attr = attrs_pairs.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, n_ch + 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda t, *_: (t,), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, n_attr), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_fwd_kernel, n_ch=n_ch, tiles_x=tiles_x)
    out_tiles, done = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, n_ch + 1, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
        ),
        interpret=interpret,
    )(tile_starts, attrs_pairs)
    return out_tiles, done


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    tile_starts,     # scalar prefetch: (num_tiles + 1,) int32
    done_s,          # scalar prefetch: (num_tiles,) int32
    attrs,           # ANY/HBM: (n_pairs_padded, n_attr) f32
    g_tiles,         # VMEM block: (1, n_ch + 1, PIX) f32 cotangents
    t_final,         # VMEM block: (1, 1, PIX) f32 final transmittance
    d_attrs,         # ANY/HBM out: (n_pairs_padded, n_attr) f32
    attr_buf,        # VMEM scratch: (CHUNK, n_attr) f32
    grad_buf,        # VMEM scratch: (CHUNK, n_attr) f32
    lt_ref,          # VMEM scratch: (1, PIX) f32 (log T *after* current chunk)
    s_ref,           # VMEM scratch: (1, PIX) f32 (suffix dot-product state)
    sem_in,          # DMA semaphore (loads)
    sem_out,         # DMA semaphore (stores)
    *,
    n_ch: int,
    tiles_x: int,
):
    t = pl.program_id(0)
    start = tile_starts[t]
    end = tile_starts[t + 1]
    n = end - start
    n_chunks = (n + CHUNK - 1) // CHUNK
    done = done_s[t]

    px, py = _pixel_coords(t, tiles_x)

    g_ch = g_tiles[0, 0:n_ch, :]          # (n_ch, PIX)
    g_t = g_tiles[0, n_ch, :][None, :]    # (1, PIX) cotangent of T_final
    t_n = t_final[0, 0, :][None, :]       # (1, PIX)

    # log T after the last processed chunk; exp/log round trip is safe since
    # T_final is exactly exp(lt) from the forward.
    lt_ref[:] = jnp.log(jnp.maximum(t_n, 1e-38))
    s_ref[:] = g_t * t_n

    lower = _strict_lower(CHUNK)
    upper = _strict_upper(CHUNK)

    def body(state):
        (i,) = state
        pos = start + i * CHUNK
        load = pltpu.make_async_copy(
            attrs.at[pl.ds(pos, CHUNK), :], attr_buf, sem_in
        )
        load.start()
        load.wait()

        @pl.when(i < done)
        def _():
            a = attr_buf[:]
            alpha, _, dx, dy, exp_power = _chunk_alpha(a, px, py, pos, end)
            op = a[:, 5:6]
            ca = a[:, 2:3]
            cb = a[:, 3:4]
            cc = a[:, 4:5]

            la = jnp.log1p(-alpha)
            total = jnp.sum(la, axis=0, keepdims=True)     # (1, PIX)
            lt_out = lt_ref[:]
            lt_in = lt_out - total
            excl = jnp.dot(lower, la, preferred_element_type=jnp.float32)
            t_i = jnp.exp(lt_in + excl)                    # (CHUNK, PIX)
            w = alpha * t_i

            chans = a[:, 6 : 6 + n_ch]                     # (CHUNK, n_ch)
            cg = jnp.dot(chans, g_ch, preferred_element_type=jnp.float32)
            contrib = w * cg                               # (CHUNK, PIX)
            suffix = jnp.dot(upper, contrib, preferred_element_type=jnp.float32)
            s_full = suffix + s_ref[:]

            d_alpha = cg * t_i - s_full / (1.0 - alpha)

            live = (alpha > 0.0).astype(jnp.float32)
            unclamped = (op * exp_power < ALPHA_CLAMP).astype(jnp.float32)
            m = live * unclamped

            d_op_px = d_alpha * exp_power * m              # (CHUNK, PIX)
            d_pow = d_alpha * alpha * m

            d_op = jnp.sum(d_op_px, axis=1, keepdims=True)             # (CHUNK, 1)
            d_ca = jnp.sum(-0.5 * dx * dx * d_pow, axis=1, keepdims=True)
            d_cb = jnp.sum(-dx * dy * d_pow, axis=1, keepdims=True)
            d_cc = jnp.sum(-0.5 * dy * dy * d_pow, axis=1, keepdims=True)
            d_mx = jnp.sum((ca * dx + cb * dy) * d_pow, axis=1, keepdims=True)
            d_my = jnp.sum((cc * dy + cb * dx) * d_pow, axis=1, keepdims=True)

            d_chans = jax.lax.dot_general(
                w, g_ch,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (CHUNK, n_ch)

            grad_buf[:, 0:1] = d_mx
            grad_buf[:, 1:2] = d_my
            grad_buf[:, 2:3] = d_ca
            grad_buf[:, 3:4] = d_cb
            grad_buf[:, 4:5] = d_cc
            grad_buf[:, 5:6] = d_op
            grad_buf[:, 6 : 6 + n_ch] = d_chans

            s_ref[:] = s_ref[:] + jnp.sum(contrib, axis=0, keepdims=True)
            lt_ref[:] = lt_in

        @pl.when(i >= done)
        def _():
            grad_buf[:] = jnp.zeros_like(grad_buf)

        store = pltpu.make_async_copy(
            grad_buf, d_attrs.at[pl.ds(pos, CHUNK), :], sem_out
        )
        store.start()
        store.wait()
        return (i - 1,)

    jax.lax.while_loop(
        lambda s: s[0] >= 0, body, (n_chunks - 1,)
    )


def composite_pairs_bwd(
    attrs_pairs: jnp.ndarray,
    tile_starts: jnp.ndarray,
    done: jnp.ndarray,
    g_tiles: jnp.ndarray,    # (T, n_ch + 1, PIX)
    t_final: jnp.ndarray,    # (T, 1, PIX)
    *,
    n_ch: int,
    tiles_x: int,
    tiles_y: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the backward kernel. Returns d_attrs_pairs (same shape as attrs)."""
    num_tiles = tiles_x * tiles_y
    n_attr = attrs_pairs.shape[-1]
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
            pltpu.VMEM((CHUNK, n_attr), jnp.float32),
            pltpu.VMEM((CHUNK, n_attr), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.VMEM((1, PIX), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_bwd_kernel, n_ch=n_ch, tiles_x=tiles_x)
    d_attrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(attrs_pairs.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, done, attrs_pairs, g_tiles, t_final)
    return d_attrs
