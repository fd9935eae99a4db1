"""Training / validation / test orchestration.

The JAX replacement for the reference's Lightning ModelWrapper + Trainer
(src/model/model_wrapper.py:132-984, src/main.py:93-152):

  * `fit` — the fused generator+discriminator step (training.step) jitted
    over a data-parallel mesh; loss-group activity recompiles at the handful
    of apply_after_step boundaries (static StepFlags keyed jit cache, the
    reference's get_active_loss_groups host branching).
  * `validate` — dual probabilistic/deterministic pass, low/high-res PSNR,
    comparison grids (model_wrapper.py:577-934).
  * `test` — per-scene render + PNG dump + benchmark.json/peak_memory.json
    (model_wrapper.py:517-575).
"""

from __future__ import annotations

import time
from fractions import Fraction
from functools import partial
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset import get_dataset
from ..dataset.loader import make_loader
from ..dataset.shims import apply_bounds_shim, apply_patch_shim
from ..dataset.view_samplers import get_view_sampler
from ..evaluation.metrics import compute_psnr
from ..loss.losses import get_loss_group
from ..misc.benchmarker import Benchmarker
from ..model.latentsplat import LatentSplat
from ..parallel import make_mesh, make_parallel_train_step, shard_batch
from ..visualization.annotation import add_label
from ..visualization.layout import add_border, hcat, vcat
from .checkpointing import (
    latest_checkpoint,
    load_checkpoint,
    load_generator_weights,
    save_checkpoint,
)
from .logger import get_logger
from .step import (
    GROUP_NAMES,
    TrainState,
    build_optimizers,
    make_step_flags,
    make_train_step,
)
from .step_tracker import StepTracker


def _device_keys(views: dict) -> dict:
    return {
        k: views[k]
        for k in ("extrinsics", "intrinsics", "image", "near", "far")
        if k in views
    }


def strip_batch(batch: dict) -> dict:
    """Keep only array fields the compiled step consumes."""
    return {
        "context": _device_keys(batch["context"]),
        "target": _device_keys(batch["target"]),
    }


class Trainer:
    def __init__(self, cfg, output_dir: Optional[Path] = None):
        self.cfg = cfg
        self.output_dir = Path(output_dir or cfg.output_dir)
        self.model = LatentSplat(
            cfg.model, tuple(cfg.dataset.background_color)
        )
        self.losses = {
            name: get_loss_group(name, getattr(cfg.loss, name))
            for name in GROUP_NAMES
        }
        self.step_tracker = StepTracker(cfg.train.step_offset)
        self.logger = get_logger(cfg.wandb, self.output_dir / "local")
        self.benchmarker = Benchmarker()
        devices = jax.devices()
        if cfg.trainer.num_devices is not None:
            devices = devices[: cfg.trainer.num_devices]
        self.mesh = make_mesh(devices)
        self.checkpoint_dir = self.output_dir / "checkpoints"

        enc = cfg.model.encoder
        self._patch_multiple = (
            enc.epipolar_transformer.self_attention.patch_size
            * enc.epipolar_transformer.downscale
        )
        self._apply_bounds = enc.apply_bounds_shim
        self._near_disparity = enc.near_disparity

    # -- data -----------------------------------------------------------------
    def _dataset(self, stage: str):
        view_sampler = get_view_sampler(
            self.cfg.dataset.view_sampler,
            stage,
            self.cfg.dataset.overfit_to_scene is not None,
            self.cfg.dataset.cameras_are_circular,
            self.step_tracker,
        )
        dataset = get_dataset(self.cfg.dataset, stage, view_sampler)
        # Multi-host: each process feeds its own scene shard (the jnp
        # analog of the reference's per-worker chunk sharding,
        # dataset_re10k.py:80-86, across hosts instead of loader workers).
        if jax.process_count() > 1 and hasattr(dataset, "num_shards"):
            dataset.shard_index = jax.process_index()
            dataset.num_shards = jax.process_count()
        return dataset

    def _loader(self, stage: str, batch_size: int, repeat: bool) -> Iterator:
        lcfg = getattr(self.cfg.data_loader, stage)
        # Forked loader workers only pay off for disk-backed datasets
        # (chunk read + JPEG decode); the in-memory synthetic dataset
        # stays on the thread-prefetch path.
        num_workers = (
            lcfg.num_workers if self.cfg.dataset.name != "synthetic" else 0
        )
        seed = lcfg.seed if lcfg.seed is not None else self.cfg.seed
        return make_loader(
            self._dataset(stage), batch_size, repeat=repeat,
            drop_last=stage == "train",
            num_workers=num_workers, seed=seed, stage=stage,
        )

    def data_shim(self, batch: dict) -> dict:
        """Patch + bounds shims (the encoder's get_data_shim,
        ref encoder_epipolar.py:244-259), traced into the compiled step."""
        batch = apply_patch_shim(batch, self._patch_multiple)
        if self._apply_bounds:
            h, w = batch["context"]["image"].shape[-3:-1]
            # near disparity is in fractional-image units in the config;
            # scale to pixels like the reference (encoder_epipolar.py:253-256).
            batch = apply_bounds_shim(
                batch, self._near_disparity * min(h, w), 0.5
            )
        return batch

    # -- state ----------------------------------------------------------------
    def init_state(self, example_batch: dict) -> TrainState:
        cfg = self.cfg
        batch_size = cfg.data_loader.train.batch_size
        effective_batch = batch_size * max(jax.device_count(), 1)
        params = self.model.init_params(
            jax.random.PRNGKey(cfg.seed), example_batch
        )
        self.opt_gen, self.opt_disc = build_optimizers(
            self.model, cfg.optimizer, effective_batch, freeze=cfg.freeze
        )
        state = TrainState(
            params_gen=params["generator"],
            params_disc=params.get("discriminator"),
            lpips_params=params["lpips"],
            opt_gen=self.opt_gen.init(params["generator"]),
            opt_disc=self.opt_disc.init(params["discriminator"])
            if self.opt_disc is not None
            else None,
            step=jnp.zeros((), jnp.int32),
            gen_loss_ema=(
                jnp.zeros(())
                if cfg.optimizer.generator.skip_loss_spike_factor is not None
                else None
            ),
            spike_skip_count=(
                jnp.zeros((), jnp.int32)
                if cfg.optimizer.generator.skip_loss_spike_factor is not None
                else None
            ),
        )

        ckpt = cfg.checkpointing
        if ckpt.load is not None:
            if ckpt.resume:
                state = load_checkpoint(Path(ckpt.load), state)
                print(f"resumed full state from {ckpt.load}")
            else:
                state = state.replace(
                    params_gen=load_generator_weights(
                        Path(ckpt.load), state.params_gen
                    )
                )
                print(f"loaded generator weights from {ckpt.load}")
        return state

    # -- training ---------------------------------------------------------------
    def fit(self, max_steps: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        max_steps = max_steps if max_steps is not None else cfg.trainer.max_steps
        # Per-device batch semantics like the reference's per-GPU batch size
        # (README.md:69): the global batch is per-device x mesh size.
        n_dev = self.mesh.devices.size
        global_batch = cfg.data_loader.train.batch_size * n_dev
        loader = self._loader("train", global_batch, repeat=True)

        first = strip_batch(next(loader))
        shimmed = jax.tree_util.tree_map(jnp.asarray, self.data_shim(first))
        state = self.init_state(shimmed)

        raw_step = make_train_step(
            self.model, self.losses, self.opt_gen, self.opt_disc,
            skip_loss_spike_factor=(
                cfg.optimizer.generator.skip_loss_spike_factor
            ),
            skip_loss_spike_patience=(
                cfg.optimizer.generator.skip_loss_spike_patience
            ),
        )

        def shimmed_step(state, batch, rng, flags):
            return raw_step(state, self.data_shim(batch), rng, flags)

        p_step = make_parallel_train_step(shimmed_step, self.mesh)
        rng = jax.random.PRNGKey(cfg.seed + 1)

        step = int(state.step)
        batch = first
        log_every = cfg.trainer.log_every_n_steps
        t_last = time.perf_counter()
        while step < max_steps:
            self.step_tracker.set_step(step)
            flags = make_step_flags(self.losses, step)
            rng, step_rng = jax.random.split(rng)
            sharded = shard_batch(batch, self.mesh)
            state, logs = p_step(state, sharded, step_rng, flags)
            # Overlap: fetch the next batch while the device runs.
            batch = strip_batch(next(loader))
            step += 1

            if step % log_every == 0 or step == 1:
                host_logs = {k: float(v) for k, v in logs.items()}
                dt = (time.perf_counter() - t_last) / (log_every if step > 1 else 1)
                t_last = time.perf_counter()
                host_logs["steps_per_sec"] = 1.0 / max(dt, 1e-9)
                self.logger.log_scalars(host_logs, step)
                gen_total = host_logs.get("generator/total", float("nan"))
                print(f"step {step}: generator/total={gen_total:.4f} "
                      f"({host_logs['steps_per_sec']:.2f} it/s)")

            if cfg.trainer.val_check_interval and step % cfg.trainer.val_check_interval == 0:
                self.validate(state, step)

            if cfg.checkpointing.every_n_train_steps and (
                step % cfg.checkpointing.every_n_train_steps == 0
            ):
                save_checkpoint(state, self.checkpoint_dir, step)

        save_checkpoint(state, self.checkpoint_dir, step)
        return state

    # -- forward passes for eval ------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 4))
    def _render_full(self, params_gen, batch, rng, deterministic: bool):
        """encoder -> splat -> VAE decode; the test/val generator path
        (ref: model_wrapper.py:535-560)."""
        model = self.model
        batch = self.data_shim(batch)
        k_enc, k_gauss, k_latent, k_ae = jax.random.split(rng, 4)
        context_latents = None
        if model.cfg.encode_latents:
            # Encoder consumes AE latents instead of pixels (ref:
            # model_wrapper.py:334-350) — same branch the timed test path
            # takes via _test_ae_encode.
            posterior = model.ae_encode(params_gen, batch["context"]["image"])
            context_latents = (
                posterior.mode() if deterministic else posterior.sample(k_ae)
            )
        gaussians = model.apply_encoder(
            params_gen, batch["context"], 0,
            None if deterministic else k_enc,
            features=context_latents,
            deterministic=deterministic,
        )
        target = batch["target"]
        size = model.scaled_size(model.scale_factor, target["image"].shape[-3:-1])
        lowered = (
            gaussians.mode() if deterministic else gaussians.sample(k_gauss)
        )
        rendered = model.decoder(
            lowered,
            target["extrinsics"], target["intrinsics"],
            target["near"], target["far"], size,
        )
        posterior = rendered.feature_posterior
        latent = posterior.mode() if deterministic else posterior.sample(k_latent)
        z = model.rescale(latent, Fraction(1, model.cfg.supersampling_factor))
        skip_z = None
        if model.autoencoder.expects_skip:
            skip_z = (
                jnp.concatenate([rendered.color, latent], axis=-1)
                if model.autoencoder.expects_skip_extra
                else latent
            )
        image = model.ae_decode(params_gen, z, skip_z)
        return {
            "image": image,                  # (b, v, H, W, 3) full res
            "render": rendered.color,        # (b, v, h, w, 3) low res
            "depth": rendered.depth,
            "target_shim": target["image"],
        }

    # -- staged test path (timed like ref model_wrapper.py:529-560) ---------------

    @partial(jax.jit, static_argnums=(0, 4))
    def _test_encode(
        self, params_gen, context, rng, deterministic: bool, features=None
    ):
        k_enc, k_gauss = jax.random.split(rng)
        gaussians = self.model.apply_encoder(
            params_gen, context, 0,
            None if deterministic else k_enc,
            features=features,
            deterministic=deterministic,
        )
        return gaussians.mode() if deterministic else gaussians.sample(k_gauss)

    @partial(jax.jit, static_argnums=(0,))
    def _test_ae_encode(self, params_gen, images, rng):
        return self.model.ae_encode(params_gen, images).sample(rng)

    @partial(jax.jit, static_argnums=(0, 3))
    def _test_splat(self, lowered, target, size):
        return self.model.decoder(
            lowered,
            target["extrinsics"], target["intrinsics"],
            target["near"], target["far"], size,
        )

    @partial(jax.jit, static_argnums=(0, 4))
    def _test_ae_decode(self, params_gen, rendered, rng, deterministic: bool):
        model = self.model
        posterior = rendered.feature_posterior
        latent = posterior.mode() if deterministic else posterior.sample(rng)
        z = model.rescale(latent, Fraction(1, model.cfg.supersampling_factor))
        skip_z = None
        if model.autoencoder.expects_skip:
            skip_z = (
                jnp.concatenate([rendered.color, latent], axis=-1)
                if model.autoencoder.expects_skip_extra
                else latent
            )
        return model.ae_decode(params_gen, z, skip_z)

    def _render_full_timed(
        self, params_gen, batch, rng, deterministic: bool, benchmarker
    ):
        """The test-mode generator path as three separately dispatched
        stages, each timed under the reference's benchmark.json tags
        (encoder / decoder per view / autoencoder_decoder per view,
        ref model_wrapper.py:529-560) so generate_benchmark_table
        consumes the dump unchanged."""
        batch = self.data_shim(batch)
        target = batch["target"]
        v = target["image"].shape[1]
        size = self.model.scaled_size(
            self.model.scale_factor, target["image"].shape[-3:-1]
        )
        k_enc, k_latent, k_ae = jax.random.split(rng, 3)
        context_latents = None
        if self.model.cfg.encode_latents:
            # Encoder consumes AE latents instead of pixels; timed under the
            # reference's autoencoder_encoder tag (model_wrapper.py:529-534,
            # per context view).
            context_latents = benchmarker.time_fn(
                "autoencoder_encoder", self._test_ae_encode, params_gen,
                batch["context"]["image"], k_ae,
                num_calls=batch["context"]["image"].shape[1],
            )
        lowered = benchmarker.time_fn(
            "encoder", self._test_encode, params_gen, batch["context"],
            k_enc, deterministic, context_latents,
        )
        rendered = benchmarker.time_fn(
            "decoder", self._test_splat, lowered, target, size, num_calls=v,
        )
        image = benchmarker.time_fn(
            "autoencoder_decoder", self._test_ae_decode, params_gen,
            rendered, k_latent, deterministic, num_calls=v,
        )
        if rendered.pairs_dropped is not None:
            dropped = int(jnp.sum(rendered.pairs_dropped))
            if dropped > 0:
                print(
                    f"WARNING: rasterizer pair budget truncated {dropped} "
                    "tile pairs this scene — raise "
                    "model.decoder.pair_budget_factor"
                )
        return {
            "image": image,
            "render": rendered.color,
            "depth": rendered.depth,
            "target_shim": target["image"],
        }

    # -- validation ---------------------------------------------------------------
    def validate(self, state: TrainState, step: int, num_batches: int = 1) -> Dict[str, float]:
        """Probabilistic + deterministic dual pass (ref: model_wrapper.py:577-700)."""
        return self.validate_params(state.params_gen, step, num_batches)

    def validate_params(
        self, params_gen, step: int = 0, num_batches: int = 1
    ) -> Dict[str, float]:
        cfg = self.cfg
        loader = self._loader("val", cfg.data_loader.val.batch_size, repeat=False)
        rng = jax.random.PRNGKey(cfg.seed + 2)
        metrics: Dict[str, list] = {}
        for i, batch in enumerate(loader):
            if i >= num_batches:
                break
            batch = strip_batch(batch)
            outs = {}
            for name, det in (("probabilistic", False), ("deterministic", True)):
                outs[name] = self._render_full(params_gen, batch, rng, det)
            target = outs["probabilistic"]["target_shim"]
            rows = []
            for name, out in outs.items():
                psnr = float(compute_psnr(target, out["image"]).mean())
                metrics.setdefault(f"val/psnr_{name}", []).append(psnr)
                rows.append(
                    hcat(*[np.asarray(out["image"][0, v]) for v in range(out["image"].shape[1])])
                )
            target_row = hcat(*[np.asarray(target[0, v]) for v in range(target.shape[1])])
            grid = add_border(
                vcat(
                    add_label(target_row, "Ground Truth"),
                    add_label(rows[0], "Probabilistic"),
                    add_label(rows[1], "Deterministic"),
                )
            )
            self.logger.log_image("comparison", grid, step)

        out = {k: float(np.mean(v)) for k, v in metrics.items()}
        if out:
            self.logger.log_scalars(out, step)
            print("  val:", {k: round(v, 3) for k, v in out.items()})

        if self.cfg.train.video_wobble or self.cfg.train.video_interpolation:
            loader = self._loader("val", 1, repeat=False)
            batch = strip_batch(next(loader))
            if self.cfg.train.video_wobble:
                self.render_video(params_gen, batch, "wobble", step)
            if self.cfg.train.video_interpolation:
                self.render_video(params_gen, batch, "interpolation", step)
        return out

    # -- validation videos (ref: model_wrapper.py:736-934) ----------------------
    def render_video(
        self,
        params_gen,
        batch: dict,
        mode: str,
        step: int,
        num_frames: int = 30,
        loop_reverse: bool = True,
    ) -> None:
        """Render a camera trajectory video (wobble or pose interpolation)
        through the full probabilistic generator path."""
        from ..visualization.camera_trajectory import (
            generate_wobble,
            interpolate_extrinsics,
            interpolate_intrinsics,
        )
        from ..visualization.color_map import apply_depth_color_map
        from ..visualization.layout import vcat

        ctx = jax.tree_util.tree_map(np.asarray, batch["context"])
        t = np.linspace(0, 1, num_frames, dtype=np.float32)
        t = (np.cos(np.pi * (t + 1)) + 1) / 2  # smooth ease-in/out

        e0, e1 = ctx["extrinsics"][0, 0], ctx["extrinsics"][0, -1]
        i0, i1 = ctx["intrinsics"][0, 0], ctx["intrinsics"][0, -1]
        if mode == "wobble":
            delta = np.linalg.norm(e0[:3, 3] - e1[:3, 3])
            extrinsics = generate_wobble(e0, np.asarray(delta * 0.25), t)
            intrinsics = np.tile(i0[None], (num_frames, 1, 1))
        else:
            extrinsics = interpolate_extrinsics(e0, e1, t)
            intrinsics = interpolate_intrinsics(i0, i1, t)

        video_batch = {
            "context": batch["context"],
            "target": {
                "extrinsics": extrinsics[None],
                "intrinsics": intrinsics[None],
                "image": np.zeros(
                    (1, num_frames, *np.asarray(ctx["image"]).shape[2:]), np.float32
                ),
                "near": np.tile(ctx["near"][:, :1], (1, num_frames)),
                "far": np.tile(ctx["far"][:, :1], (1, num_frames)),
            },
        }
        out = self._render_full(
            params_gen,
            jax.tree_util.tree_map(jnp.asarray, video_batch),
            jax.random.PRNGKey(self.cfg.seed + 4),
            False,
        )
        images = np.asarray(out["image"][0])
        depths = np.asarray(out["depth"][0])
        frames = [
            vcat(images[v], apply_depth_color_map(depths[v]), gap=2)
            for v in range(num_frames)
        ]
        if loop_reverse:
            frames = frames + frames[-2:0:-1]
        self.logger.log_video(f"video/{mode}", frames, step)

    # -- test ---------------------------------------------------------------------
    def test(self, state_or_params, name: str = "latentsplat_tpu") -> None:
        """Render the evaluation index and dump PNGs + benchmark.json
        (ref: model_wrapper.py:517-575)."""
        cfg = self.cfg
        params_gen = (
            state_or_params.params_gen
            if isinstance(state_or_params, TrainState)
            else state_or_params
        )
        loader = self._loader("test", 1, repeat=False)
        out_root = Path(cfg.test.output_path) / name
        rng = jax.random.PRNGKey(cfg.seed + 3)
        from ..misc.image_io import save_image

        for batch in loader:
            scene = batch["scene"][0] if isinstance(batch["scene"], list) else batch["scene"]
            arrays = strip_batch(batch)
            out = self._render_full_timed(
                params_gen, arrays, rng, False, self.benchmarker
            )
            images = np.asarray(out["image"][0])
            ctx_str = "_".join(
                str(int(i)) for i in np.sort(np.asarray(batch["context"]["index"][0]))
            )
            for v in range(images.shape[0]):
                index = int(np.asarray(batch["target"]["index"])[0, v])
                save_image(
                    images[v], out_root / scene / ctx_str / "color" / f"{index:0>6}.png"
                )
        self.benchmarker.dump(out_root / "benchmark.json")
        self.benchmarker.dump_memory(out_root / "peak_memory.json")
