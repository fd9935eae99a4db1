"""CO3D camera-conversion and reader tests.

The PyTorch3D-NDC -> OpenCV conversion (reference src/dataset/utils.py:18-87,
itself from pytorch3d's opencv_from_cameras_projection) is a sign/convention
minefield; these tests pin it three ways:

1. hand-computed literal fixtures for both intrinsics formats on a
   non-square image;
2. a projection-consistency identity: a world point projected through the
   original PyTorch3D camera (row-vector x_cam = X R + T, NDC axes +x left /
   +y up, u_screen = -x_ndc*scale + W/2) must land on the same pixel as the
   OpenCV camera our conversion emits;
3. an end-to-end iteration over a synthetic frame_annotations.jgz tree
   (mirroring what test_re10k_chunks.py does for RE10k), covering det(R)
   filtering, undersized-image skipping, and the camera-radius near/far.
"""

import gzip
import json

import numpy as np
import pytest

from latentsplat_tpu.dataset.co3d import DatasetCO3D, _ndc_to_opencv
from latentsplat_tpu.dataset.types import DatasetCO3DCfg
from latentsplat_tpu.dataset.view_samplers import (
    ViewSamplerArbitrary,
    ViewSamplerArbitraryCfg,
)
from latentsplat_tpu.training.step_tracker import StepTracker

H, W = 400, 600  # non-square so per-axis handling is exercised


def _random_rotation(seed):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )


class TestNdcToOpencvFixtures:
    def test_ndc_isotropic_hand_computed(self):
        """R = I, T = (0.1, 0.2, 3), f = (2.0, 1.5), p = (0.1, -0.2) on a
        600x400 image: scale = 200, c0 = (300, 200) =>
        f_px = (400, 300), p_px = (-0.1*200+300, 0.2*200+200) = (280, 240)."""
        c2w, K = _ndc_to_opencv(
            np.eye(3), np.asarray([0.1, 0.2, 3.0]),
            np.asarray([2.0, 1.5]), np.asarray([0.1, -0.2]),
            "ndc_isotropic", (H, W),
        )
        np.testing.assert_allclose(
            K,
            [[400 / 600, 0, 280 / 600], [0, 300 / 400, 240 / 400], [0, 0, 1]],
            atol=1e-6,
        )
        # Axis flip maps R=I to diag(-1,-1,1); w2c translation (-0.1,-0.2,3)
        # => c2w translation (-0.1, -0.2, -3).
        np.testing.assert_allclose(
            c2w,
            [[-1, 0, 0, -0.1], [0, -1, 0, -0.2], [0, 0, 1, -3], [0, 0, 0, 1]],
            atol=1e-6,
        )

    def test_ndc_norm_image_bounds_hand_computed(self):
        """Legacy format first rescales per axis by size_wh / min(size_wh) =
        (1.5, 1.0): f -> (3.0, 1.5), p -> (0.15, -0.2), then as isotropic:
        f_px = (600, 300), p_px = (270, 240)."""
        _, K = _ndc_to_opencv(
            np.eye(3), np.zeros(3),
            np.asarray([2.0, 1.5]), np.asarray([0.1, -0.2]),
            "ndc_norm_image_bounds", (H, W),
        )
        np.testing.assert_allclose(
            K,
            [[600 / 600, 0, 270 / 600], [0, 300 / 400, 240 / 400], [0, 0, 1]],
            atol=1e-6,
        )

    def test_square_image_formats_agree(self):
        """On a square image, per-axis scale is (1, 1): both formats must
        produce identical cameras."""
        R = _random_rotation(3)
        T = np.asarray([0.3, -0.2, 2.5])
        f = np.asarray([1.8, 1.8])
        p = np.asarray([0.05, 0.02])
        a = _ndc_to_opencv(R, T, f, p, "ndc_isotropic", (128, 128))
        b = _ndc_to_opencv(R, T, f, p, "ndc_norm_image_bounds", (128, 128))
        np.testing.assert_allclose(a[0], b[0], atol=1e-6)
        np.testing.assert_allclose(a[1], b[1], atol=1e-6)

    def test_unknown_format_raises(self):
        with pytest.raises(ValueError, match="intrinsics format"):
            _ndc_to_opencv(
                np.eye(3), np.zeros(3), np.ones(2), np.zeros(2),
                "screen", (H, W),
            )


class TestProjectionConsistency:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("fmt", ["ndc_isotropic", "ndc_norm_image_bounds"])
    def test_pixel_parity_with_pytorch3d_convention(self, seed, fmt):
        """A world point projected through the original PyTorch3D camera and
        through our converted OpenCV camera must hit the same pixel.

        PyTorch3D convention (docs/cameras.md): camera coords via row-vector
        x_cam = X R + T; NDC projection u_ndc = f_ndc * x/z + p_ndc with +x
        pointing LEFT and +y UP; screen conversion (the same one
        opencv_from_cameras_projection inverts) u_px = -u_ndc*s + W/2 with
        s = min(W, H) / 2.
        """
        rng = np.random.default_rng(seed + 10)
        R = _random_rotation(seed)
        T = rng.uniform(-1, 1, 3)
        T[2] += 4.0
        f = rng.uniform(1.0, 3.0, 2)
        p = rng.uniform(-0.3, 0.3, 2)

        c2w, K = _ndc_to_opencv(R, T, f, p, fmt, (H, W))

        # The conversion's own per-axis NDC rescale for the legacy format.
        f_ndc, p_ndc = f.copy(), p.copy()
        if fmt == "ndc_norm_image_bounds":
            per_axis = np.asarray([W, H], np.float64) / min(W, H)
            f_ndc, p_ndc = f_ndc * per_axis, p_ndc * per_axis

        scale = min(W, H) / 2.0
        c0 = np.asarray([W, H], np.float64) / 2.0

        pts = rng.uniform(-1, 1, (16, 3))
        # PyTorch3D side (independent of the conversion under test).
        x_cam = pts @ R + T
        assert (x_cam[:, 2] > 0.1).all()
        ndc = f_ndc * x_cam[:, :2] / x_cam[:, 2:3] + p_ndc
        px_p3d = -ndc * scale + c0

        # OpenCV side through our converted camera.
        w2c = np.linalg.inv(c2w.astype(np.float64))
        x_cv = (w2c[:3, :3] @ pts.T).T + w2c[:3, 3]
        uv_norm = (
            np.stack([K[0, 0] * x_cv[:, 0], K[1, 1] * x_cv[:, 1]], -1)
            / x_cv[:, 2:3]
            + np.asarray([K[0, 2], K[1, 2]])
        )
        px_cv = uv_norm * np.asarray([W, H], np.float64)

        np.testing.assert_allclose(px_cv, px_p3d, atol=1e-4)

    def test_camera_center_preserved(self):
        """The camera center is convention-independent: c2w translation must
        equal the PyTorch3D center -T R^{-1} (row-vector solve)."""
        R = _random_rotation(7)
        T = np.asarray([0.4, -0.7, 3.2])
        c2w, _ = _ndc_to_opencv(
            R, T, np.ones(2), np.zeros(2), "ndc_isotropic", (H, W)
        )
        center_p3d = -T @ np.linalg.inv(R)
        np.testing.assert_allclose(c2w[:3, 3], center_p3d, atol=1e-5)
        # And the rotation stays orthonormal with det +1.
        np.testing.assert_allclose(
            np.linalg.det(c2w[:3, :3]), 1.0, atol=1e-6
        )


# ---------------------------------------------------------------------------
# End-to-end synthetic frame_annotations.jgz iteration
# ---------------------------------------------------------------------------


def _frame(seq, num, h, w, seed, bad_rotation=False):
    rng = np.random.default_rng(seed)
    R = _random_rotation(seed)
    if bad_rotation:
        R = R * np.asarray([1.0, 1.0, -1.0])  # det(R) = -1
    angle = 0.4 * num
    T = [0.5 * np.sin(angle), 0.1, 4.0 + 0.2 * np.cos(angle)]
    return {
        "sequence_name": seq,
        "frame_number": num,
        # Real CO3D paths are dataset-root-relative, category included.
        "image": {"size": [h, w], "path": f"hydrant/images/{seq}_{num}.jpg"},
        "viewpoint": {
            "R": R.tolist(),
            "T": T,
            "focal_length": [2.0 + 0.1 * rng.random(), 2.0],
            "principal_point": [0.01, -0.02],
            "intrinsics_format": "ndc_isotropic",
        },
    }


def _write_tree(root, frames, category="hydrant"):
    cat = root / category
    (cat / "images").mkdir(parents=True)
    with gzip.open(cat / "frame_annotations.jgz", "wt") as f:
        json.dump(frames, f)
    from PIL import Image

    rng = np.random.default_rng(0)
    for fr in frames:
        h, w = fr["image"]["size"]
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(root / fr["image"]["path"])
    split = [[fr["sequence_name"], fr["frame_number"], fr["image"]["path"]]
             for fr in frames]
    split_path = root / "split.json"
    with split_path.open("w") as f:
        json.dump(split, f)
    return split_path


def _dataset(root, split_path, stage="train", planes=None):
    cfg = DatasetCO3DCfg(
        roots=[str(root)],
        scene="hydrant",
        image_shape=[32, 32],
        augment=False,
        planes=planes,
        train_split_json=str(split_path),
        eval_split_json=str(split_path),
    )
    sampler = ViewSamplerArbitrary(
        ViewSamplerArbitraryCfg(
            name="arbitrary",
            num_context_views=2,
            num_target_views=1,
            context_views=[0, 2],
            target_views=[1],
        ),
        stage, False, False, StepTracker(),
    )
    return DatasetCO3D(cfg, stage, sampler)


class TestDatasetCO3D:
    def test_iterates_shapes_and_near_far(self, tmp_path):
        frames = [_frame("seq_a", i, 48, 64, seed=i) for i in range(4)]
        split = _write_tree(tmp_path, frames)
        ds = _dataset(tmp_path, split)
        examples = list(ds)
        assert len(examples) == 1
        ex = examples[0]
        assert ex["scene"] == "seq_a"
        assert ex["context"]["image"].shape == (2, 32, 32, 3)
        assert ex["target"]["image"].shape == (1, 32, 32, 3)
        assert ex["context"]["extrinsics"].shape == (2, 4, 4)
        # Camera-radius near/far heuristic (ref dataset_co3d.py:213-224):
        # near = clamp(|c| - 8, 0.5), far = |c| + 8.
        radius = np.linalg.norm(ex["context"]["extrinsics"][:, :3, 3], axis=-1)
        np.testing.assert_allclose(
            ex["context"]["near"], np.clip(radius - 8.0, 0.5, None), rtol=1e-5
        )
        np.testing.assert_allclose(
            ex["context"]["far"], radius + 8.0, rtol=1e-5
        )

    def test_configured_planes(self, tmp_path):
        frames = [_frame("seq_a", i, 48, 64, seed=i) for i in range(4)]
        split = _write_tree(tmp_path, frames)
        ds = _dataset(tmp_path, split, planes=[1.25, 9.5])
        ex = next(iter(ds))
        assert (ex["target"]["near"] == 1.25).all()
        assert (ex["target"]["far"] == 9.5).all()

    def test_det_filter_skips_sequence(self, tmp_path):
        frames = [
            _frame("seq_bad", i, 48, 64, seed=i, bad_rotation=(i == 1))
            for i in range(4)
        ]
        split = _write_tree(tmp_path, frames)
        assert list(_dataset(tmp_path, split)) == []

    def test_undersized_images_skipped(self, tmp_path):
        frames = [_frame("seq_small", i, 24, 64, seed=i) for i in range(4)]
        split = _write_tree(tmp_path, frames)  # h=24 <= image_shape 32
        assert list(_dataset(tmp_path, split)) == []
