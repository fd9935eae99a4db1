"""Convergence run: prove the full VAE-GAN training loop learns.

Overfits the flagship model (random init — no pretrained weights in this
environment) on ONE synthetic scene with the complete objective active
from step 0: render MSE+LPIPS, combined L1+LPIPS, generator loss with the
adaptive GAN weight, and the hinge discriminator — i.e. every branch of
the fused train step (ref: src/model/model_wrapper.py:286-514), in the
shipped fast precision mode. Records the loss / train-PSNR curves to
benchmarks/convergence_{size}px.json.

Run `--precision both` to repeat the run in exact mode with identical
seeds, quantifying the fast-mode gradient quality as a final-loss /
final-PSNR delta (VERDICT r2 weak item 3).

Usage: python bench_convergence.py [--size 128] [--steps 600]
       [--precision fast|exact|both] [--log-every 1]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def overfit_batch(size: int, v_tgt: int = 4, batch: int = 1) -> dict:
    """Fixed synthetic-scene batch(es): 2 context views at the arc ends,
    v_tgt targets spread between them (geometrically consistent renders).
    `batch` stacks that many distinct scenes along the batch axis — batch=2
    is the reference's flagship per-GPU shape (README.md:63-69)."""
    from latentsplat_tpu.dataset.synthetic import DatasetSynthetic, render_blob_scene
    from latentsplat_tpu.dataset.types import DatasetSyntheticCfg

    n_frames = v_tgt + 2
    cfg = DatasetSyntheticCfg(
        name="synthetic",
        image_shape=[size, size],
        background_color=[0.0, 0.0, 0.0],
        num_scenes=8,
        num_frames=n_frames,
        seed=0,
    )
    ds = DatasetSynthetic(cfg, "test", view_sampler=None)

    def one_scene(scene_id):
        means, colors, radii, extrinsics, intrinsics = ds._scene(scene_id)

        def views(indices):
            images = np.stack(
                [
                    render_blob_scene(
                        means, colors, radii, extrinsics[i], intrinsics[i],
                        (size, size),
                    )
                    for i in indices
                ]
            )
            k = len(indices)
            return {
                "extrinsics": extrinsics[indices][None],
                "intrinsics": intrinsics[indices][None],
                "image": images[None].astype(np.float32),
                "near": np.full((1, k), ds.near, np.float32),
                "far": np.full((1, k), ds.far, np.float32),
                "index": np.asarray(indices, np.int32)[None],
            }

        ctx = np.asarray([0, n_frames - 1])
        tgt = np.arange(1, 1 + v_tgt)
        return {"context": views(ctx), "target": views(tgt)}

    scenes = [one_scene(3 + i) for i in range(batch)]
    return {
        side: {
            k: np.concatenate([s[side][k] for s in scenes], axis=0)
            for k in scenes[0][side]
        }
        for side in ("context", "target")
    }


def run_mode(
    size: int, steps: int, precision: str, log_every: int, seed: int = 0,
    batch: int = 1, objective: str = "full", spike_guard: float = 0.0,
    sh_l2: float = 0.0,
) -> dict:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from latentsplat_tpu.loss.losses import get_loss_group
    from latentsplat_tpu.training.step import (
        GROUP_NAMES,
        TrainState,
        build_optimizers,
        make_step_flags,
        make_train_step,
    )

    full = size >= 256
    overrides = [
        f"dataset.image_shape=[{size},{size}]",
        f"model.decoder.precision={precision}",
        f"model.remat={'true' if full else 'false'}",
        f"model.decoder.remat={'true' if full else 'false'}",
        # Full objective from step 0 (the reference's schedule activates
        # these at 50k/100k/125k; the convergence artifact exercises them
        # all at once, like bench_train.py).
        "loss.target_render_image.nll=[{name: mse, weight: 10}, {name: lpips, weight: 0.5}]",
        "loss.target_combined.nll=[{name: l1}, {name: lpips}]",
        # objective="nogan" drops the adversarial pair to isolate GAN
        # dynamics from rasterizer-gradient quality when comparing
        # precision modes (the exact-vs-fast anomaly diagnosis).
        *(
            [
                "loss.target_combined.generator={name: generator, weight: 0.5}",
                "loss.target_combined.discriminator={name: discriminator, loss: hinge}",
            ]
            if objective == "full"
            else []
        ),
        # --sh-l2 adds the color-SH magnitude regularizer (pins the
        # compositor's cancellation null space; round-5 collapse fix).
        (
            "loss.gaussian.nll=[{name: kl, weight: 0.0001}, "
            f"{{name: sh_l2, weight: {sh_l2}}}]"
            if sh_l2
            else "loss.gaussian.nll=[{name: kl, weight: 0.0001}]"
        ),
        # The reference's 2000-step warmup from a 5e-4 start factor would
        # keep the LR negligible for a short run; compress it.
        "optimizer.generator.warm_up_steps=50",
        "optimizer.generator.warm_up_start_factor=0.1",
    ]
    cfg, model = _flagship_model(overrides)
    losses = {n: get_loss_group(n, getattr(cfg.loss, n)) for n in GROUP_NAMES}

    batch = overfit_batch(size, batch=batch)
    params = model.init_params(jax.random.PRNGKey(seed), batch)
    opt_gen, opt_disc = build_optimizers(model, cfg.optimizer, batch["context"]["image"].shape[0])
    state = TrainState(
        params_gen=params["generator"],
        params_disc=params.get("discriminator"),
        lpips_params=params["lpips"],
        opt_gen=opt_gen.init(params["generator"]),
        opt_disc=opt_disc.init(params["discriminator"]) if opt_disc else None,
        step=jnp.zeros((), jnp.int32),
        gen_loss_ema=jnp.zeros(()) if spike_guard else None,
        spike_skip_count=jnp.zeros((), jnp.int32) if spike_guard else None,
    )
    flags = make_step_flags(losses, 0)
    if objective == "full":
        assert flags.disc and flags.gen_gan, "GAN branches must be active"
    step_fn = jax.jit(
        make_train_step(
            model, losses, opt_gen, opt_disc,
            skip_loss_spike_factor=spike_guard or None,
        ),
        static_argnums=(3,),
    )

    tracked = (
        "generator/total",
        "discriminator/total",
        "train/target_render/psnr",
        "train/target_combined/psnr",
        "target_render_image/mse",
        "target_render_image/lpips",
        "target_combined/l1",
        "target_combined/lpips",
        "gaussian/kl",
        "gaussian/sh_l2",
        "target_combined/adaptive_weight",
        # Divergence localization (absent keys log None).
        "grad_norm/generator",
        "grad_norm/encoder",
        "grad_norm/autoencoder",
        "rasterizer/pairs_dropped",
        "diag/max_world_scale",
        "diag/max_opacity",
        "diag/max_abs_color_sh",
        "diag/max_abs_feature_mean",
        "diag/max_feature_logvar",
        "optimizer/loss_spike_skipped",
        "optimizer/loss_spike_forced",
    )
    curve: dict[str, list] = {k: [] for k in tracked}
    curve["step"] = []

    t0 = time.perf_counter()
    rng = jax.random.PRNGKey(7 + 1000 * seed)
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, logs = step_fn(state, batch, sub, flags)
        if i == 0:
            jax.block_until_ready(state.params_gen)
            print(
                f"[{precision}] compile+first step: "
                f"{time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            t0 = time.perf_counter()
        if i % log_every == 0 or i == steps - 1:
            curve["step"].append(i)
            for k in tracked:
                curve[k].append(
                    round(float(logs[k]), 5) if k in logs else None
                )
            if i % (log_every * 25) == 0 or i == steps - 1:
                fmt = lambda k, p: (  # noqa: E731 — absent groups log None
                    "n/a" if curve[k][-1] is None else f"{curve[k][-1]:.{p}f}"
                )
                print(
                    f"[{precision}] step {i}: gen {fmt('generator/total', 4)} "
                    f"disc {fmt('discriminator/total', 4)} "
                    f"render_psnr {fmt('train/target_render/psnr', 2)} "
                    f"combined_psnr {fmt('train/target_combined/psnr', 2)}",
                    file=sys.stderr,
                )
    wall = time.perf_counter() - t0
    print(
        f"[{precision}] {steps - 1} post-compile steps in {wall:.1f}s "
        f"({(steps - 1) / wall:.2f} steps/s)",
        file=sys.stderr,
    )

    def smoothed(key, first):
        vals = [v for v in curve[key] if v is not None]
        n = max(1, min(10, len(vals) // 5))
        chunk = vals[:n] if first else vals[-n:]
        return round(float(np.mean(chunk)), 4)

    return {
        "precision": precision,
        "steps": steps,
        "steps_per_sec": round((steps - 1) / wall, 3),
        "initial_render_psnr": smoothed("train/target_render/psnr", True),
        "final_render_psnr": smoothed("train/target_render/psnr", False),
        "initial_combined_psnr": smoothed("train/target_combined/psnr", True),
        "final_combined_psnr": smoothed("train/target_combined/psnr", False),
        "initial_generator_total": smoothed("generator/total", True),
        "final_generator_total": smoothed("generator/total", False),
        "curve": curve,
    }


def main() -> None:
    def arg(name, default, cast):
        return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    size = arg("--size", 128, int)
    steps = arg("--steps", 600, int)
    precision = arg("--precision", "fast", str)
    log_every = arg("--log-every", 1, int)
    seed = arg("--seed", 0, int)
    tag = arg("--tag", "", str)
    batch = arg("--batch", 1, int)
    objective = arg("--objective", "full", str)
    # opt-in transient divergence guard (optimizer.generator.
    # skip_loss_spike_factor); 0 = off
    spike_guard = arg("--spike-guard", 0.0, float)
    # color-SH L2 regularizer weight; 0 = off (reference objective)
    sh_l2 = arg("--sh-l2", 0.0, float)

    import jax

    dev = jax.devices()[0]
    if precision == "both":
        modes = ["fast", "exact"]
    else:
        modes = precision.split(",")
    results = [
        run_mode(
            size, steps, m, log_every, seed, batch, objective, spike_guard,
            sh_l2,
        )
        for m in modes
    ]

    out = {
        "metric": f"convergence_{size}px",
        "device": f"{dev.platform}:{dev.device_kind}",
        "seed": seed,
        "batch": batch,
        "objective_name": objective,
        "sh_l2_weight": sh_l2,
        "spike_guard_factor": spike_guard,
        "measured_unix": int(time.time()),
        "objective": "full VAE-GAN (mse+lpips render, l1+lpips combined, "
        "adaptive-weighted generator, hinge discriminator, kl)",
        "runs": results,
    }
    for r in results:
        gain = r["final_render_psnr"] - r["initial_render_psnr"]
        out[f"render_psnr_gain_db_{r['precision']}"] = round(gain, 3)
        print(
            f"[{r['precision']}] render PSNR {r['initial_render_psnr']:.2f} -> "
            f"{r['final_render_psnr']:.2f} dB (gain {gain:+.2f}), "
            f"combined PSNR {r['initial_combined_psnr']:.2f} -> "
            f"{r['final_combined_psnr']:.2f} dB, "
            f"gen loss {r['initial_generator_total']:.3f} -> "
            f"{r['final_generator_total']:.3f}",
            file=sys.stderr,
        )
    if len(results) == 2:
        out["fast_vs_exact_final_render_psnr_db"] = round(
            results[0]["final_render_psnr"] - results[1]["final_render_psnr"], 3
        )
        out["fast_vs_exact_final_generator_total"] = round(
            results[0]["final_generator_total"]
            - results[1]["final_generator_total"],
            4,
        )

    out_dir = Path(__file__).resolve().parent / "benchmarks"
    out_dir.mkdir(exist_ok=True)
    path = out_dir / f"convergence_{size}px{tag}.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"convergence_{size}px_render_psnr_gain",
                "value": out[f"render_psnr_gain_db_{results[0]['precision']}"],
                "unit": "dB",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
