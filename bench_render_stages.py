"""Render-internal timing at the TRAIN shape (256px, G~24.5k, 8 views).

The fused train step renders b=2 scenes x v=4 views sequentially at
~24.5k gaussians each; render_fwd measured 168 ms (21 ms/view) vs the
flagship's 9.8 ms/view at 393k gaussians -- fixed per-call costs dominate.
Splits: projection+SH, tile rects + count_pair_overflow, expansion, sort,
compositor.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 3
SIZE = 256
BATCH = 2
VTGT = 4


def _time(fn, *args, label=""):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    from __graft_entry__ import _arc_batch, _flagship_model

    overrides = [
        f"dataset.image_shape=[{SIZE},{SIZE}]",
        "model.decoder.precision=fast",
    ]
    cfg, model = _flagship_model(overrides)
    dev = jax.devices()[0]
    print(f"render stages on {dev.platform}:{dev.device_kind}", file=sys.stderr)
    batch = _arc_batch(b=BATCH, v_ctx=2, v_tgt=VTGT, h=SIZE, w=SIZE)
    k = jax.random.PRNGKey(0)

    params = model.init_params(jax.random.PRNGKey(0), batch)
    gaussians = jax.jit(
        lambda p: model.apply_encoder(
            p, batch["context"], jnp.zeros((), jnp.int32), k, deterministic=False
        ).sample(k)
    )(params["generator"])
    jax.block_until_ready(gaussians.means)
    G = gaussians.means.shape[1]
    print(f"G per scene = {G}", flush=True)

    tgt = batch["target"]
    dec_cfg = cfg.model.decoder

    # full render fwd (all scenes/views) — the reference point
    def full(g_means, g_cov, g_op, g_csh, g_fsh):
        from latentsplat_tpu.ops.rasterize import render
        out = render(
            tgt["extrinsics"], tgt["intrinsics"], tgt["near"], tgt["far"],
            (SIZE, SIZE), jnp.zeros((BATCH, 3)),
            g_means, g_cov, g_op, g_csh, g_fsh,
            max_tiles_per_gaussian=dec_cfg.max_tiles_per_gaussian,
            pair_budget_factor=dec_cfg.pair_budget_factor,
            precision=dec_cfg.precision,
        )
        return jnp.sum(out.color) + jnp.sum(out.feature) + jnp.sum(out.mask) + jnp.sum(out.depth)

    args = (gaussians.means, gaussians.covariances, gaussians.opacities,
            gaussians.color_harmonics, gaussians.feature_harmonics)
    t = _time(jax.jit(full), *args, label="full")
    print(f"render_full_fwd: {t*1e3:.1f} ms ({t*1e3/(BATCH*VTGT):.1f}/view)", flush=True)

    # single view at this scale, pieces
    from latentsplat_tpu.ops.rasterize.camera import project_gaussians_to_screen
    from latentsplat_tpu.ops.rasterize.tiled import (
        composite_tiled, count_pair_overflow, _tile_rects,
    )
    from latentsplat_tpu.ops.sh import eval_sh
    from math import isqrt

    ext = tgt["extrinsics"][0, 0]
    intr = tgt["intrinsics"][0, 0]
    nr = tgt["near"][0, 0]
    mns, covs, ops = gaussians.means[0], gaussians.covariances[0], gaussians.opacities[0]
    csh, fsh = gaussians.color_harmonics[0], gaussians.feature_harmonics[0]

    def project_only(mns, covs, ops, csh, fsh):
        cam = ext[:3, 3]
        d = mns - cam[None]
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
        col = jnp.maximum(eval_sh(isqrt(csh.shape[-1]) - 1, csh, d) + 0.5, 0.0)
        feat = eval_sh(isqrt(fsh.shape[-1]) - 1, fsh, d) + 0.5
        ch = jnp.concatenate([col, feat], axis=-1).astype(jnp.float32)
        s = 1.0 / nr
        sg = project_gaussians_to_screen(
            mns * s, covs * (s * s), ops, ch, ext.at[:3, 3].multiply(s), intr,
            (SIZE, SIZE),
        )
        return sg

    sg = jax.jit(project_only)(mns, covs, ops, csh, fsh)
    jax.block_until_ready(sg.mean2d)
    t = _time(
        jax.jit(lambda *a: jax.tree.map(jnp.sum, project_only(*a).mean2d)),
        mns, covs, ops, csh, fsh, label="proj",
    )
    print(f"project_sh_one_view: {t*1e3:.2f} ms", flush=True)

    t = _time(
        jax.jit(lambda s_: count_pair_overflow(
            s_, (SIZE, SIZE),
            max_tiles_per_gaussian=dec_cfg.max_tiles_per_gaussian,
            pair_budget_factor=dec_cfg.pair_budget_factor,
            precision=dec_cfg.precision,
        )), sg, label="overflow",
    )
    print(f"count_pair_overflow_one_view: {t*1e3:.2f} ms", flush=True)

    def comp(s_):
        img, mask, depth = composite_tiled(
            s_, (SIZE, SIZE), jnp.zeros((sg.channels.shape[-1],)),
            max_tiles_per_gaussian=dec_cfg.max_tiles_per_gaussian,
            pair_budget_factor=dec_cfg.pair_budget_factor,
            precision=dec_cfg.precision,
        )
        return jnp.sum(img) + jnp.sum(mask) + jnp.sum(depth)

    t = _time(jax.jit(comp), sg, label="composite_tiled")
    print(f"composite_tiled_one_view (incl expand+sort+kernel): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
