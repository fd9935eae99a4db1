"""Train-step benchmark: full flagship VAE-GAN step time on one TPU chip.

Measures the fused generator+discriminator train step (encoder -> splat ->
VAE decode -> losses incl. GAN + adaptive weighting -> both optimizer
updates) at a configurable scale. The reference trains at 256x256 with
per-GPU batch 2 on A100-40GB (README.md:63-69); run with --full for that
shape, default is 128px batch 1 (fits comfortably and compiles faster).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 4


def main() -> None:
    full = "--full" in sys.argv
    size = 256 if full else 128
    # The reference's per-A100-40GB shape is 256px batch 2 (README.md:63-69);
    # with model.remat + decoder.remat it fits a 16 GB v5e chip:
    # `--full --batch 2`.
    batch = 1
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])

    from __graft_entry__ import _arc_batch, _flagship_model
    from latentsplat_tpu.loss.losses import get_loss_group
    from latentsplat_tpu.training.step import (
        GROUP_NAMES,
        TrainState,
        build_optimizers,
        make_step_flags,
        make_train_step,
    )

    dev = jax.devices()[0]
    print(f"train-step bench on {dev.platform}:{dev.device_kind} "
          f"({size}px, batch {batch})", file=sys.stderr)

    fast = "--fast" in sys.argv
    bf16 = "--bf16" in sys.argv
    # Per-site mixed precision, e.g. --compute encoder:bfloat16,vae:bfloat16
    # (see training/step._mixed_site). Overrides --bf16 when given.
    compute = None
    if "--compute" in sys.argv:
        compute = sys.argv[sys.argv.index("--compute") + 1]
    remat_policy = "nothing"
    if "--remat-policy" in sys.argv:
        remat_policy = sys.argv[sys.argv.index("--remat-policy") + 1]
    # Keep per-view rasterizer residuals live instead of recomputing the
    # render in the backward (HBM permitting).
    no_dec_remat = "--no-decoder-remat" in sys.argv
    overrides = [
        f"dataset.image_shape=[{size},{size}]",
        f"model.remat_policy={remat_policy}",
        *(
            [f"model.compute_dtype={compute}"]
            if compute
            else (["model.compute_dtype=bfloat16"] if bf16 else [])
        ),
        # Half-precision rasterizer sort payload + bf16 compositor matmuls
        # (gradients flow through the same quantized attributes).
        *(["model.decoder.precision=fast"] if fast else []),
        # 256px activations exceed 16 GB HBM without rematerialization.
        f"model.remat={'true' if full else 'false'}",
        # Per-view rasterizer residuals (~160 MB/view) are the next-largest
        # block; recompute them in the backward at full scale.
        f"model.decoder.remat={'true' if full and not no_dec_remat else 'false'}",
        # Activate the full objective from step 0 (the reference's late-
        # schedule losses are the expensive ones).
        "loss.target_render_image.nll=[{name: mse, weight: 10}, {name: lpips, weight: 0.5}]",
        "loss.target_combined.nll=[{name: l1}, {name: lpips}]",
        "loss.target_combined.generator={name: generator, weight: 0.5}",
        "loss.target_combined.discriminator={name: discriminator, loss: hinge}",
    ]
    cfg, model = _flagship_model(overrides)
    losses = {n: get_loss_group(n, getattr(cfg.loss, n)) for n in GROUP_NAMES}

    batch_data = _arc_batch(b=batch, v_ctx=2, v_tgt=4, h=size, w=size)
    params = model.init_params(jax.random.PRNGKey(0), batch_data)
    opt_gen, opt_disc = build_optimizers(model, cfg.optimizer, batch)
    state = TrainState(
        params_gen=params["generator"],
        params_disc=params.get("discriminator"),
        lpips_params=params["lpips"],
        opt_gen=opt_gen.init(params["generator"]),
        opt_disc=opt_disc.init(params["discriminator"]) if opt_disc else None,
        step=jnp.zeros((), jnp.int32),
    )
    flags = make_step_flags(losses, 0)
    assert flags.disc and flags.gen_gan
    step_fn = jax.jit(
        make_train_step(model, losses, opt_gen, opt_disc), static_argnums=(3,)
    )

    t0 = time.perf_counter()
    state, logs = step_fn(state, batch_data, jax.random.PRNGKey(1), flags)
    total = float(logs["generator/total"])  # forces completion
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(generator/total={total:.3f})", file=sys.stderr)
    assert np.isfinite(total)

    # FLOPs from XLA's own cost model, for MFU accounting (VERDICT r2 #5).
    flops = 0.0
    try:
        cost = (
            step_fn.lower(state, batch_data, jax.random.PRNGKey(1), flags)
            .compile()
            .cost_analysis()
        )
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        print(f"XLA flops/step: {flops:.3e}", file=sys.stderr)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        state, logs = step_fn(
            state, batch_data, jax.random.PRNGKey(2 + i), flags
        )
        float(logs["generator/total"])
        times.append(time.perf_counter() - t0)
    times.sort()
    sec = times[len(times) // 2]
    print(f"step times: {['%.2f' % t for t in times]}", file=sys.stderr)
    variant = (
        ("_fast" if fast else "")
        + (
            "_" + compute.replace(":", "-").replace(",", "+")
            if compute
            else ("_bf16" if bf16 else "")
        )
        + (
            "_" + remat_policy.replace(":", "-").replace(",", "+")
            if remat_policy != "nothing"
            else ""
        )
        + ("_keepres" if no_dec_remat else "")
    )
    result = {
        "metric": f"train_step_{size}px_batch{batch}_vae_gan" + variant,
        "value": round(1.0 / sec, 3),
        "unit": "steps/sec/chip",
        # Anchor: the reference trains this shape on a 40 GB A100
        # (README.md:63-69) and publishes no step timing; 1 step/s is the
        # working anchor, on a 16 GB v5e.
        "vs_baseline": round((1.0 / sec) / 1.0, 3),
    }
    # MFU vs the chip's bf16 peak (PEAK_FLOPS keys match device_kind).
    from bench import PEAK_FLOPS

    peak = next(
        (v for k, v in PEAK_FLOPS.items() if k in dev.device_kind.lower()), None
    )
    if peak is not None and flops > 0:
        result["train_mfu"] = round(flops * (1.0 / sec) / peak, 4)
        result["train_flops_per_step"] = flops
    print(json.dumps(result))
    # Persist for bench.py to surface in the driver-visible headline line.
    from pathlib import Path

    out_dir = Path(__file__).resolve().parent / "benchmarks"
    out_dir.mkdir(exist_ok=True)
    record = dict(result)
    record["device"] = f"{dev.platform}:{dev.device_kind}"
    record["measured_unix"] = int(time.time())
    (out_dir / f"train_step_{size}px_b{batch}{variant}.json").write_text(
        json.dumps(record, indent=1)
    )


if __name__ == "__main__":
    main()
