"""Encoder-internal stage timing at the flagship train shape (256px b2).

Isolates: DINO backbone, epipolar transformer (incl. sampler), and the
full encoder (known ~343 ms fwd+bwd remat'd) so the residual attributes
the depth predictor + heads + adapter.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 3
SIZE = 256
BATCH = 2


def _sum_tree(tree):
    leaves = [
        jnp.sum(x) for x in jax.tree.leaves(tree)
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    return sum(leaves[1:], leaves[0])


def _time(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    from __graft_entry__ import _arc_batch, _flagship_model

    overrides = [
        f"dataset.image_shape=[{SIZE},{SIZE}]",
        "model.remat=true",
        "model.decoder.remat=true",
        "model.decoder.precision=fast",
    ]
    cfg, model = _flagship_model(overrides)
    dev = jax.devices()[0]
    print(f"enc stages on {dev.platform}:{dev.device_kind}", file=sys.stderr)
    batch = _arc_batch(b=BATCH, v_ctx=2, v_tgt=4, h=SIZE, w=SIZE)
    k = jax.random.PRNGKey(0)

    ecfg = cfg.model.encoder

    # --- DINO backbone alone (b*v images) ---
    from latentsplat_tpu.model.encoder.backbone import get_backbone

    bb = get_backbone(ecfg.backbone, 3, ecfg.d_backbone, model.scale_factor)
    imgs = batch["context"]["image"].reshape(BATCH * 2, SIZE, SIZE, 3)
    p_bb = jax.jit(bb.init)(k, imgs)

    def bb_loss(p):
        f = jax.checkpoint(lambda pp: bb.apply(pp, imgs))(p)
        return jnp.sum(f)

    fn = jax.jit(lambda p: _sum_tree(jax.grad(bb_loss)(p)))
    t = _time(fn, p_bb)
    print(f"backbone_fwd_bwd: {t*1e3:.1f} ms", flush=True)

    # --- epipolar SAMPLER alone (the gather fwd / scatter-add bwd suspect) ---
    from latentsplat_tpu.model.encoder.epipolar_sampler import (
        sample_epipolar_features,
    )

    h = w = SIZE // 4
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 2, h, w, ecfg.d_feature), jnp.float32
    )
    ctx = batch["context"]

    def sampler_loss(f):
        def run(ff):
            return sample_epipolar_features(
                ff, ctx["extrinsics"], ctx["intrinsics"], ctx["near"],
                ctx["far"], ecfg.epipolar_transformer.num_samples,
            ).features
        return jnp.sum(jax.checkpoint(run)(f))

    fn = jax.jit(lambda f: jnp.sum(jax.grad(sampler_loss)(f)))
    t = _time(fn, feats)
    print(f"epipolar_sampler_fwd_bwd: {t*1e3:.1f} ms", flush=True)

    # --- epipolar transformer alone (on random backbone-scale features) ---
    from latentsplat_tpu.model.encoder.epipolar_transformer import (
        EpipolarTransformer,
    )

    # The real encoder hands the ET backbone-RESOLUTION features (the ET's
    # own strided conv does the 4x downscale internally,
    # epipolar_transformer.py:78-84); feeding it SIZE//4 features here would
    # run the sampler/attention at 1/16 the real ray count.
    et = EpipolarTransformer(ecfg.epipolar_transformer, ecfg.d_feature)
    feats_full = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, 2, SIZE, SIZE, ecfg.d_feature),
        jnp.float32,
    )
    p_et = jax.jit(
        lambda kk: et.init(
            kk, feats_full, ctx["extrinsics"], ctx["intrinsics"], ctx["near"],
            ctx["far"],
        )
    )(k)

    def et_loss(p, f):
        def run(ff):
            out, _ = et.apply(
                p, ff, ctx["extrinsics"], ctx["intrinsics"], ctx["near"], ctx["far"]
            )
            return out
        return jnp.sum(jax.checkpoint(run)(f))

    fn = jax.jit(lambda p, f: _sum_tree(jax.grad(et_loss, argnums=(0, 1))(p, f)))
    t = _time(fn, p_et, feats_full)
    print(f"epipolar_transformer_fwd_bwd: {t*1e3:.1f} ms", flush=True)

    # --- full encoder (reference point; includes remat like the real step) ---
    params = model.init_params(jax.random.PRNGKey(0), batch)
    params_gen = params["generator"]

    def encode(p):
        fn_ = lambda pp: model.apply_encoder(
            pp, batch["context"], jnp.zeros((), jnp.int32), k, deterministic=False
        )
        fn_ = jax.checkpoint(fn_)
        g = fn_(p)
        return (
            _sum_tree(g.means) + _sum_tree(g.covariances)
            + _sum_tree(g.opacities) + _sum_tree(g.color_harmonics)
            + _sum_tree(g.feature_harmonics.mean)
        )

    fn = jax.jit(lambda p: _sum_tree(jax.grad(encode)(p)))
    t = _time(fn, params_gen)
    print(f"encoder_full_fwd_bwd: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
