"""End-to-end test of the RE10k `.torch` chunk ingestion path against
realistic fixture chunks built with torch.save (the reference's container
format: a list of {key, cameras (n,18) tensor, images: list of uint8 tensors
holding JPEG bytes, url, timestamps} — src/dataset/dataset_re10k.py:93-135)."""

import json
from io import BytesIO

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from latentsplat_tpu.dataset.re10k import NEAR, DatasetRE10k, convert_poses
from latentsplat_tpu.dataset.types import DatasetRE10kCfg
from latentsplat_tpu.dataset.view_samplers import (
    ViewSamplerArbitrary,
    ViewSamplerArbitraryCfg,
)
from latentsplat_tpu.training.step_tracker import StepTracker


def _jpeg_bytes(rng, h=360, w=640):
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = BytesIO()
    img.save(buf, "JPEG")
    return torch.tensor(
        np.frombuffer(buf.getvalue(), dtype=np.uint8).copy()
    )


def _camera_row(i):
    """18 floats: fx fy cx cy 0 0 + 3x4 w2c (camera i shifted along x)."""
    w2c = np.eye(4, dtype=np.float32)
    w2c[0, 3] = -0.5 * i
    return np.concatenate(
        [np.asarray([0.8, 1.2, 0.5, 0.5, 0.0, 0.0], np.float32),
         w2c[:3].reshape(-1)]
    )


def _make_chunks(root, scenes_per_chunk=2, n_views=6, n_chunks=2):
    rng = np.random.default_rng(0)
    index = {}
    for stage in ("train", "test"):
        d = root / stage
        d.mkdir(parents=True)
        for c in range(n_chunks):
            chunk = []
            for s in range(scenes_per_chunk):
                key = f"{stage}_scene_{c}_{s}"
                chunk.append(
                    {
                        "key": key,
                        "url": f"https://example.com/{key}",
                        "timestamps": torch.arange(n_views),
                        "cameras": torch.tensor(
                            np.stack([_camera_row(i) for i in range(n_views)])
                        ),
                        "images": [_jpeg_bytes(rng) for _ in range(n_views)],
                    }
                )
                index[key] = f"{c:0>6}.torch"
            torch.save(chunk, d / f"{c:0>6}.torch")
        with (d / "index.json").open("w") as f:
            json.dump(
                {k: v for k, v in index.items() if k.startswith(stage)}, f
            )


def _dataset(root, stage="train", **cfg_kw):
    cfg = DatasetRE10kCfg(
        roots=[str(root)],
        image_shape=[180, 320],
        augment=False,
        **cfg_kw,
    )
    sampler = ViewSamplerArbitrary(
        ViewSamplerArbitraryCfg(
            name="arbitrary",
            num_context_views=2,
            num_target_views=2,
            context_views=[0, 4],
            target_views=[1, 3],
        ),
        stage, False, False, StepTracker(),
    )
    return DatasetRE10k(cfg, stage, sampler)


class TestRE10kChunks:
    def test_iterates_and_shapes(self, tmp_path):
        _make_chunks(tmp_path)
        ds = _dataset(tmp_path)
        examples = list(ds)
        assert len(examples) == 4  # 2 chunks x 2 scenes
        ex = examples[0]
        assert ex["context"]["image"].shape == (2, 180, 320, 3)
        assert ex["target"]["image"].shape == (2, 180, 320, 3)
        assert ex["context"]["extrinsics"].shape == (2, 4, 4)
        assert ex["context"]["index"].tolist() == [0, 4]

    def test_baseline_normalized_to_1(self, tmp_path):
        _make_chunks(tmp_path)
        ex = next(iter(_dataset(tmp_path)))
        a, b = ex["context"]["extrinsics"][:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(a - b), 1.0, rtol=1e-5)
        # near/far rescale with the baseline: baseline was 0.5 * 4 = 2.0.
        np.testing.assert_allclose(ex["context"]["near"], NEAR / 2.0, rtol=1e-5)

    def test_pose_conversion_roundtrip(self):
        rows = np.stack([_camera_row(i) for i in range(3)])
        extr, intr = convert_poses(rows)
        # w2c built with camera at x = +0.5*i -> c2w translation = +0.5*i.
        np.testing.assert_allclose(extr[2, 0, 3], 1.0, atol=1e-6)
        np.testing.assert_allclose(intr[0, 0, 0], 0.8, atol=1e-6)
        np.testing.assert_allclose(intr[0, 1, 2], 0.5, atol=1e-6)

    def test_fov_filter_skips_wide_scenes(self, tmp_path):
        _make_chunks(tmp_path)
        ds = _dataset(tmp_path, max_fov=30.0)  # fy=1.2 -> ~45 deg > 30
        assert list(ds) == []

    def test_test_stage_sharding(self, tmp_path):
        _make_chunks(tmp_path)
        cfg = dict()
        ds0 = _dataset(tmp_path, **cfg)
        ds0.stage = "test"
        all_scenes = {e["scene"] for e in _dataset(tmp_path, **cfg)}
        shards = []
        for i in range(2):
            d = _dataset(tmp_path, **cfg)
            d.stage = "test"
            d.shard_index, d.num_shards = i, 2
            shards.append({e["scene"] for e in d})
        assert shards[0].isdisjoint(shards[1])

    def test_overfit_to_scene(self, tmp_path):
        _make_chunks(tmp_path)
        ds = _dataset(tmp_path, overfit_to_scene="test_scene_0_1")
        scenes = {e["scene"] for e in ds}
        assert scenes == {"test_scene_0_1"}
