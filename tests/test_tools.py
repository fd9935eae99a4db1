"""Tests for drawing, 3D validation viz, PLY export, CO3D reader, and the
offline scripts."""

import gzip
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsplat_tpu.model.ply_export import export_ply, load_ply
from latentsplat_tpu.visualization.drawing import draw_cameras, draw_lines, draw_points


def _arc(v=2):
    from latentsplat_tpu.dataset.synthetic import _look_at

    ext = np.stack(
        [
            _look_at(np.asarray([0.5 * i, 0, -2], np.float32), np.asarray([0, 0, 4], np.float32))
            for i in range(v)
        ]
    )
    intr = np.tile(np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (v, 1, 1))
    return ext, intr


def test_draw_lines_antialiased():
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_lines(img, [[0.1, 0.5]], [[0.9, 0.5]], [1.0, 0.0, 0.0], radius=1.0)
    # The horizontal line renders red pixels along the middle row.
    assert out[16, 16, 0] > 0.5 and out[16, 16, 1] < 0.1
    assert out[2, 16, 0] == 0.0  # far from the line


def test_draw_points():
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_points(img, [[0.5, 0.5]], [0.0, 1.0, 0.0], radius=2.0)
    assert out[16, 16, 1] > 0.5
    assert out[0, 0, 1] == 0.0


def test_draw_cameras_projections():
    ext, intr = _arc()
    projs = draw_cameras(
        64, ext, intr, np.ones((2, 3), np.float32),
        near=np.full(2, 0.5), far=np.full(2, 5.0),
    )
    assert len(projs) == 3
    for p in projs:
        assert p.ndim == 3 and p.shape[-1] == 3
        assert p.max() > 0.1  # something was drawn


@pytest.mark.slow
def test_render_projections_orthographic():
    from latentsplat_tpu.model.types import Gaussians
    from latentsplat_tpu.visualization.validation_in_3d import render_projections

    g = 64
    key = jax.random.PRNGKey(0)
    means = jax.random.uniform(key, (1, g, 3), minval=-1, maxval=1)
    covs = jnp.broadcast_to(jnp.eye(3) * 1e-4, (1, g, 3, 3))
    gaussians = Gaussians(
        means=means,
        covariances=covs,
        opacities=jnp.full((1, g), 0.9),
        color_harmonics=jax.random.uniform(jax.random.fold_in(key, 1), (1, g, 3, 1)),
        feature_harmonics=None,
    )
    proj = render_projections(gaussians, 32, draw_label=False)
    assert proj.shape[:2] == (1, 3)
    assert np.isfinite(proj).all()


def test_ply_export_roundtrip(tmp_path):
    g = 32
    rng = np.random.default_rng(0)
    means = rng.normal(size=(g, 3)).astype(np.float32)
    scales = np.full((g, 3), 0.02, np.float32)
    quats = np.tile(np.asarray([0, 0, 0, 1], np.float32), (g, 1))
    sh = rng.normal(size=(g, 3, 4)).astype(np.float32)
    ops = rng.uniform(0.1, 1, size=(g,)).astype(np.float32)
    ext = np.eye(4, dtype=np.float32)

    path = tmp_path / "gaussians.ply"
    export_ply(ext, means, scales, quats, sh, ops, path)
    back = load_ply(path)
    assert back["x"].shape == (g,)
    # Opacity passes through unchanged.
    np.testing.assert_allclose(back["opacity"], ops, atol=1e-6)
    # Scales are stored in log space and rescaled by the scene normalization.
    assert np.isfinite(back["scale_0"]).all()
    # DC color band passes through.
    np.testing.assert_allclose(back["f_dc_0"], sh[:, 0, 0], atol=1e-6)


def test_co3d_reader_with_synthetic_annotations(tmp_path):
    from latentsplat_tpu.dataset.co3d import DatasetCO3D
    from latentsplat_tpu.dataset.types import DatasetCO3DCfg
    from latentsplat_tpu.dataset.view_samplers import (
        ViewSamplerArbitraryCfg,
        get_view_sampler,
    )
    from latentsplat_tpu.misc.image_io import save_image

    rng = np.random.default_rng(0)
    n_frames, h, w = 6, 48, 64
    frames = []
    split = []
    img_dir = tmp_path / "hydrant" / "seq1" / "images"
    for i in range(n_frames):
        rel = f"hydrant/seq1/images/frame{i:03d}.jpg"
        save_image(rng.uniform(size=(h, w, 3)).astype(np.float32), tmp_path / rel)
        angle = 2 * np.pi * i / n_frames
        # Simple circular rig in pytorch3d convention (R row-major).
        frames.append(
            {
                "sequence_name": "seq1",
                "frame_number": i,
                "image": {"path": rel, "size": [h, w]},
                "viewpoint": {
                    "R": np.eye(3).tolist(),
                    "T": [np.sin(angle), 0.0, 4.0 + np.cos(angle)],
                    "focal_length": [1.8, 1.8],
                    "principal_point": [0.0, 0.0],
                    "intrinsics_format": "ndc_isotropic",
                },
            }
        )
        split.append(["seq1", i, rel])
    with gzip.open(tmp_path / "hydrant" / "frame_annotations.jgz", "wt") as f:
        json.dump(frames, f)
    split_path = tmp_path / "split.json"
    split_path.write_text(json.dumps(split))

    cfg = DatasetCO3DCfg(
        roots=[str(tmp_path)],
        scene="hydrant",
        planes=[0.5, 40.0],
        train_split_json=str(split_path),
        eval_split_json=str(split_path),
        image_shape=[32, 32],
        augment=False,
    )
    sampler = get_view_sampler(
        ViewSamplerArbitraryCfg(num_context_views=2, num_target_views=1),
        "train", False, True, None,
    )
    examples = list(DatasetCO3D(cfg, "train", sampler))
    assert examples, "reader should yield at least one example"
    ex = examples[0]
    assert ex["context"]["image"].shape == (2, 32, 32, 3)
    assert ex["context"]["extrinsics"].shape == (2, 4, 4)
    dets = np.linalg.det(ex["context"]["extrinsics"][:, :3, :3])
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
    np.testing.assert_allclose(ex["target"]["near"], 0.5)


def test_benchmark_table_script(tmp_path):
    from latentsplat_tpu.scripts.generate_benchmark_table import main

    method_dir = tmp_path / "ours"
    method_dir.mkdir(parents=True)
    (method_dir / "benchmark.json").write_text(
        json.dumps({"encoder": [0.1, 0.2], "decoder": [0.01]})
    )
    (method_dir / "peak_memory.json").write_text(json.dumps({"tpu:0": 2_000_000_000}))
    out = tmp_path / "table.tex"
    main([f"methods=[{{name: Ours, path: {method_dir}}}]", f"output_path={out}"])
    table = out.read_text()
    assert "Ours" in table and "150.0" in table and "2.00" in table


def test_visualize_epipolar_lines_script(tmp_path):
    from latentsplat_tpu.scripts.visualize_epipolar_lines import main

    main(
        [
            "dataset={name: synthetic, num_scenes: 1, num_frames: 4, "
            "image_shape: [32, 32], background_color: [0,0,0], "
            "view_sampler: {name: arbitrary, num_context_views: 2, num_target_views: 1}}",
            f"output_path={tmp_path}",
        ]
    )
    assert list(Path(tmp_path).glob("*.png"))


def test_dists_converter_structure():
    import jax as jax_

    from latentsplat_tpu.evaluation.metrics import DISTSNet
    from latentsplat_tpu.training.pretrained import convert_dists, merge_params

    rng = np.random.default_rng(0)
    stage_convs = {1: (0, 2), 2: (1, 3), 3: (1, 3, 5), 4: (1, 3, 5), 5: (1, 3, 5)}
    widths = {1: [(3, 64), (64, 64)], 2: [(64, 128), (128, 128)],
              3: [(128, 256), (256, 256), (256, 256)],
              4: [(256, 512), (512, 512), (512, 512)],
              5: [(512, 512), (512, 512), (512, 512)]}
    sd = {}
    for stage, idxs in stage_convs.items():
        for idx, (ci, co) in zip(idxs, widths[stage]):
            sd[f"stage{stage}.{idx}.weight"] = rng.normal(size=(co, ci, 3, 3)).astype(np.float32) * 0.02
            sd[f"stage{stage}.{idx}.bias"] = np.zeros((co,), np.float32)
    total = 3 + 64 + 128 + 256 + 512 + 512
    sd["alpha"] = np.abs(rng.normal(size=(1, total, 1, 1))).astype(np.float32)
    sd["beta"] = np.abs(rng.normal(size=(1, total, 1, 1))).astype(np.float32)

    net = DISTSNet()
    x = jnp.zeros((1, 32, 32, 3))
    params = net.init(jax_.random.PRNGKey(0), x, x)["params"]
    merged = merge_params(params, convert_dists(sd))
    out = net.apply({"params": merged}, x, x)
    assert abs(float(out[0])) < 1e-4  # identical inputs -> ~0 distance


def test_encoder_visualizations():
    from latentsplat_tpu.model.encoder.epipolar_sampler import (
        sample_epipolar_features,
    )
    from latentsplat_tpu.model.encoder.visualization import (
        visualize_depth,
        visualize_epipolar_samples,
    )
    from latentsplat_tpu.model.types import Gaussians

    ext, intr = _arc(2)
    h = w = 32
    rng = np.random.default_rng(0)
    context = {
        "image": rng.uniform(size=(1, 2, h, w, 3)).astype(np.float32),
        "extrinsics": ext[None],
        "intrinsics": intr[None],
        "near": np.full((1, 2), 0.5, np.float32),
        "far": np.full((1, 2), 20.0, np.float32),
    }
    features = jnp.asarray(rng.normal(size=(1, 2, 8, 8, 16)).astype(np.float32))
    sampling = sample_epipolar_features(
        features,
        jnp.asarray(context["extrinsics"]),
        jnp.asarray(context["intrinsics"]),
        jnp.asarray(context["near"]),
        jnp.asarray(context["far"]),
        num_samples=4,
    )
    img = visualize_epipolar_samples(context, sampling, num_rays=4)
    assert img.ndim == 3 and img.shape[-1] == 3

    g = 2 * h * w  # one gaussian per pixel
    gaussians = Gaussians(
        means=jnp.asarray(rng.normal(size=(1, g, 3)).astype(np.float32) + [0, 0, 4]),
        covariances=jnp.broadcast_to(jnp.eye(3) * 1e-4, (1, g, 3, 3)),
        opacities=jnp.ones((1, g)),
        color_harmonics=jnp.ones((1, g, 3, 1)),
        feature_harmonics=None,
    )
    depth_img = visualize_depth(context, gaussians, gaussians_per_pixel=1)
    assert depth_img.ndim == 3 and np.isfinite(depth_img).all()


def test_main_cli_arg_parsing():
    from latentsplat_tpu.main import parse_args

    experiment, overrides = parse_args(
        ["+experiment=re10k", "mode=test", "trainer.max_steps=5"]
    )
    assert experiment == "re10k"
    assert overrides == ["mode=test", "trainer.max_steps=5"]
    with pytest.raises(SystemExit):
        parse_args(["not-an-override"])


def test_profiler_trace_and_annotation(tmp_path):
    """jax.profiler wrapper captures a trace directory and annotations
    work inside it (SURVEY.md §5 tracing equivalent)."""
    import jax
    import jax.numpy as jnp

    from latentsplat_tpu.misc.profiler import annotate, trace

    with trace(tmp_path / "trace"):
        with annotate("tiny_matmul"):
            out = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        jax.block_until_ready(out)
    produced = list((tmp_path / "trace").rglob("*"))
    assert produced, "trace must write profile artifacts"
