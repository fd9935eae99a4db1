"""End-to-end Trainer integration: fit a tiny VAE-GAN on the synthetic
dataset for a few steps, validate, test-render, checkpoint and resume.

Everything touching the `tiny_run` fixture (or its own fit) compiles real
train steps on CPU — all `slow`. The quick tier keeps the compile-free
construction/loader/shim test at the bottom."""

import json
from pathlib import Path

import numpy as np
import pytest

from latentsplat_tpu.config import load_config
from latentsplat_tpu.training.trainer import Trainer

# Every fit/validate/test call below compiles a real step: slow. The quick
# construction test at the bottom stays unmarked.
slow = pytest.mark.slow

TINY_OVERRIDES = [
    "dataset={name: synthetic, num_scenes: 6, num_frames: 12, image_shape: [32, 32], "
    "background_color: [0,0,0], view_sampler: {name: bounded, num_target_views: 1, "
    "num_context_views: 2, min_distance_between_context_views: 4, "
    "max_distance_between_context_views: 6, max_distance_to_context_views: 2, "
    "context_gap_warm_up_steps: 1, target_gap_warm_up_steps: 1, "
    "initial_min_distance_between_context_views: 4, "
    "initial_max_distance_between_context_views: 6, "
    "initial_max_distance_to_context_views: 2}}",
    "data_loader.train.batch_size=1",
    "data_loader.val.batch_size=1",
    "model.encoder.backbone={name: resnet, model: resnet18, num_layers: 1, use_first_pool: false}",
    "model.encoder.d_backbone=16",
    "model.encoder.d_feature=16",
    "model.encoder.num_monocular_samples=4",
    "model.encoder.gaussians_per_pixel=1",
    "model.encoder.epipolar_transformer.num_samples=4",
    "model.encoder.epipolar_transformer.num_layers=1",
    "model.encoder.epipolar_transformer.num_heads=2",
    "model.encoder.epipolar_transformer.d_dot=16",
    "model.encoder.epipolar_transformer.d_mlp=16",
    "model.encoder.epipolar_transformer.self_attention.num_layers=1",
    "model.encoder.epipolar_transformer.self_attention.num_heads=2",
    "model.encoder.epipolar_transformer.self_attention.d_token=16",
    "model.encoder.epipolar_transformer.self_attention.d_dot=16",
    "model.encoder.epipolar_transformer.self_attention.d_mlp=16",
    "model.encoder.gaussian_adapter.color_sh_degree=1",
    "model.encoder.gaussian_adapter.feature_sh_degree=0",
    "model.autoencoder={name: id}",
    "model.variational=gaussians",
    "model.supersampling_factor=1",
    "loss.target_render_image.nll=[{name: mse, weight: 1}]",
    "loss.gaussian.nll=[{name: kl, weight: 0.0001}]",
    "trainer.max_steps=3",
    "trainer.num_devices=2",
    "trainer.val_check_interval=0",
    "trainer.log_every_n_steps=1",
    "checkpointing.every_n_train_steps=2",
    "optimizer.generator.warm_up_steps=2",
]


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    cfg = load_config(None, TINY_OVERRIDES + [f"output_dir={out}", "test.output_path="
                                              f"{out}/test"])
    trainer = Trainer(cfg, out)
    state = trainer.fit()
    return cfg, trainer, state, out


@slow
def test_fit_produces_finite_losses(tiny_run):
    cfg, trainer, state, out = tiny_run
    metrics_file = out / "local" / "metrics.jsonl"
    assert metrics_file.exists()
    records = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    totals = [r["generator/total"] for r in records if "generator/total" in r]
    assert totals and all(np.isfinite(t) for t in totals)


@slow
def test_checkpoints_written(tiny_run):
    cfg, trainer, state, out = tiny_run
    ckpts = sorted((out / "checkpoints").glob("step_*"))
    assert ckpts, "periodic + final checkpoints expected"


@slow
def test_validate(tiny_run):
    cfg, trainer, state, out = tiny_run
    metrics = trainer.validate(state, step=3)
    assert "val/psnr_probabilistic" in metrics
    assert np.isfinite(metrics["val/psnr_probabilistic"])
    # comparison grid image logged
    assert list((out / "local" / "comparison").glob("*.png"))


@slow
def test_test_renders_and_benchmark(tiny_run):
    cfg, trainer, state, out = tiny_run
    trainer.test(state, name="tiny")
    root = Path(cfg.test.output_path) / "tiny"
    pngs = list(root.rglob("color/*.png"))
    assert pngs, "test mode must dump rendered target views"
    assert (root / "benchmark.json").exists()
    assert (root / "peak_memory.json").exists()
    # The reference's timing tags (model_wrapper.py:529-560) so
    # generate_benchmark_table-style tooling consumes the dump unchanged.
    import json

    bench = json.loads((root / "benchmark.json").read_text())
    assert {"encoder", "decoder", "autoencoder_decoder"} <= set(bench)


@slow
def test_encode_latents_emits_autoencoder_encoder_tag(tmp_path):
    """encode_latents=true feeds the encoder AE latents on BOTH eval paths:
    the timed test path (under the reference's autoencoder_encoder tag,
    model_wrapper.py:529-534) and validate's _render_full. A real KL
    autoencoder (latent_channels=2 != 3) makes the plumbing load-bearing —
    dropping `features` would shape-error the encoder's input conv."""
    overrides = TINY_OVERRIDES + [
        "model.encode_latents=true",
        "model.autoencoder={name: kl, model: kl_f8, "
        "down_block_types: [DownEncoderBlock2D, DownEncoderBlock2D], "
        "up_block_types: [UpDecoderBlock2D, UpDecoderBlock2D], "
        "block_out_channels: [8, 16], layers_per_block: 1, "
        "latent_channels: 2, skip_connections: false, pretrained: false}",
        "trainer.max_steps=1",
        f"output_dir={tmp_path}",
        f"test.output_path={tmp_path}/test",
    ]
    cfg = load_config(None, overrides)
    trainer = Trainer(cfg, tmp_path)
    state = trainer.fit()
    metrics = trainer.validate(state, step=1)
    assert np.isfinite(metrics["val/psnr_probabilistic"])
    trainer.test(state, name="lat")
    root = Path(cfg.test.output_path) / "lat"
    bench = json.loads((root / "benchmark.json").read_text())
    assert {"autoencoder_encoder", "encoder", "decoder", "autoencoder_decoder"} <= set(bench)


def test_construction_loader_and_shims(tmp_path):
    """Quick tier: Trainer construction, the train loader, and the
    patch/bounds data shims — everything host-side before the first
    compile. Catches config-plumbing and dataset-pipeline breaks in
    seconds."""
    cfg = load_config(
        None, TINY_OVERRIDES + [f"output_dir={tmp_path}",
                                f"test.output_path={tmp_path}/test"]
    )
    trainer = Trainer(cfg, tmp_path)
    assert trainer.mesh.devices.size == 2
    loader = trainer._loader("train", batch_size=2, repeat=False)
    from latentsplat_tpu.training.trainer import strip_batch

    batch = trainer.data_shim(strip_batch(next(loader)))
    ctx = batch["context"]
    assert ctx["image"].shape[:2] == (2, 2)  # (batch, context views)
    assert ctx["image"].shape[-1] == 3
    # patch shim keeps dims a multiple of patch_size * downscale
    m = trainer._patch_multiple
    assert ctx["image"].shape[-3] % m == 0 and ctx["image"].shape[-2] % m == 0
    # bounds shim produced finite near/far with near < far
    assert np.all(np.isfinite(ctx["near"])) and np.all(ctx["near"] < ctx["far"])


@slow
def test_resume_from_checkpoint(tiny_run, tmp_path):
    cfg, trainer, state, out = tiny_run
    ckpt = sorted((out / "checkpoints").glob("step_*"))[-1]
    cfg2 = load_config(
        None,
        TINY_OVERRIDES
        + [
            f"output_dir={tmp_path}",
            f"checkpointing.load={ckpt}",
            "checkpointing.resume=true",
            "trainer.max_steps=4",
        ],
    )
    trainer2 = Trainer(cfg2, tmp_path)
    state2 = trainer2.fit()
    assert int(state2.step) == 4
