"""Dense O(G * pixels) compositing oracle (pure jnp).

Exact front-to-back alpha compositing semantics of the tile rasterizer,
without binning. Serves two purposes (SURVEY.md §7 step 2a):
  1. immediate end-to-end correctness (differentiable via autodiff), and
  2. the numerical oracle for the Pallas tiled kernel's fwd/bwd tests.

With `tile_size` set, the per-(gaussian, pixel) visibility test reproduces
the tiled kernel's tile-rect culling exactly, so dense and tiled outputs
match bit-for-bit modulo accumulation order.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .camera import ALPHA_CLAMP, ALPHA_THRESHOLD
from .types import ScreenGaussians


def composite_dense(
    sg: ScreenGaussians,
    image_shape: tuple[int, int],
    background: Optional[jnp.ndarray] = None,  # (C,) background per channel
    tile_size: Optional[int] = None,
    chunk: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite screen Gaussians densely.

    Returns:
      channels_img: (C, H, W)
      mask: (H, W) accumulated alpha
      depth: (H, W) expected depth (sum alpha*T*z)
    """
    h, w = image_shape
    g = sg.num_gaussians

    # Global front-to-back order; a single depth sort induces the correct
    # per-pixel compositing order everywhere.
    order = jnp.argsort(sg.depth)
    mean2d = sg.mean2d[order]
    conic = sg.conic[order]
    opacity = sg.opacity[order]
    channels = sg.channels[order]
    depth = sg.depth[order]
    radius = sg.radius[order]

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
    py = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
    p = h * w

    c = channels.shape[-1]
    out = jnp.zeros((p, c), jnp.float32)
    out_depth = jnp.zeros((p,), jnp.float32)
    transmittance = jnp.ones((p,), jnp.float32)

    if tile_size is not None:
        tx = (px / tile_size).astype(jnp.int32)
        ty = (py / tile_size).astype(jnp.int32)

    # Process gaussians in depth-ordered chunks to bound peak memory.
    num_chunks = -(-g // chunk)
    for ci in range(num_chunks):
        sl = slice(ci * chunk, min((ci + 1) * chunk, g))
        m = mean2d[sl]
        co = conic[sl]
        op = opacity[sl]
        ch = channels[sl]
        de = depth[sl]
        ra = radius[sl]

        dx = px[None, :] - m[:, 0:1]  # (K, P)
        dy = py[None, :] - m[:, 1:2]
        power = -0.5 * (co[:, 0:1] * dx * dx + co[:, 2:3] * dy * dy) - co[:, 1:2] * dx * dy
        # min(power, 0): power > 0 rows are zeroed below, but a raw
        # exp(power) = inf there would turn the AD backward's
        # where-cotangent (0) into inf * 0 = NaN d_opacity — same guard as
        # pallas_kernels._chunk_alpha (near-degenerate conics can reach
        # power ~ +90 at far offsets).
        alpha = jnp.minimum(ALPHA_CLAMP, op[:, None] * jnp.exp(jnp.minimum(power, 0.0)))
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.where(alpha < ALPHA_THRESHOLD, 0.0, alpha)
        alpha = jnp.where(ra[:, None] > 0.0, alpha, 0.0)

        if tile_size is not None:
            # Reproduce tile-rect culling: gaussian touches pixel's tile iff
            # its radius-rect overlaps the tile rect.
            gx0 = jnp.floor((m[:, 0:1] - ra[:, None]) / tile_size)
            gx1 = jnp.floor((m[:, 0:1] + ra[:, None]) / tile_size)
            gy0 = jnp.floor((m[:, 1:2] - ra[:, None]) / tile_size)
            gy1 = jnp.floor((m[:, 1:2] + ra[:, None]) / tile_size)
            touches = (
                (tx[None, :] >= gx0) & (tx[None, :] <= gx1)
                & (ty[None, :] >= gy0) & (ty[None, :] <= gy1)
            )
            alpha = jnp.where(touches, alpha, 0.0)

        # Exclusive cumulative transmittance within the chunk, carried across
        # chunks through `transmittance`.
        one_minus = 1.0 - alpha
        t_within = jnp.concatenate(
            [jnp.ones((1, p), jnp.float32), jnp.cumprod(one_minus, axis=0)[:-1]], axis=0
        )
        weight = alpha * t_within * transmittance[None, :]  # (K, P)

        out = out + weight.T @ ch
        out_depth = out_depth + weight.T @ de
        transmittance = transmittance * jnp.prod(one_minus, axis=0)

    mask = 1.0 - transmittance
    if background is not None:
        out = out + transmittance[:, None] * background[None, :]

    channels_img = out.T.reshape(c, h, w)
    return channels_img, mask.reshape(h, w), out_depth.reshape(h, w)
