"""Tests for the visualization toolkit (layout, annotation, color maps,
camera trajectories) and the benchmarker."""

import numpy as np

from latentsplat_tpu.visualization.annotation import add_label, draw_label
from latentsplat_tpu.visualization.camera_trajectory import (
    generate_spin,
    generate_wobble,
    generate_wobble_transformation,
    interpolate_extrinsics,
    interpolate_intrinsics,
)
from latentsplat_tpu.visualization.color_map import (
    apply_color_map_to_image,
    apply_depth_color_map,
    turbo,
)
from latentsplat_tpu.visualization.layout import add_border, hcat, overlay, resize, vcat


def _look_at(pos, tgt):
    from latentsplat_tpu.dataset.synthetic import _look_at as f

    return f(np.asarray(pos, np.float32), np.asarray(tgt, np.float32))


def test_hcat_vcat_shapes():
    a = np.zeros((10, 20, 3))
    b = np.zeros((14, 8, 3))
    out = hcat(a, b, gap=4)
    assert out.shape == (14, 32, 3)
    out = vcat(a, b, gap=2)
    assert out.shape == (26, 20, 3)


def test_hcat_promotes_grayscale():
    a = np.zeros((10, 10))
    b = np.zeros((10, 10, 1))
    assert hcat(a, b).shape[-1] == 3


def test_add_border():
    img = np.zeros((4, 6, 3))
    out = add_border(img, border=3, color=1.0)
    assert out.shape == (10, 12, 3)
    assert out[0, 0, 0] == 1.0 and out[5, 5, 0] == 0.0


def test_overlay_alignment():
    base = np.zeros((10, 10, 3))
    over = np.ones((4, 4, 3))
    out = overlay(base, over, "horizontal", "end", "end")
    assert out[-1, -1, 0] == 1.0 and out[0, 0, 0] == 0.0


def test_resize():
    img = np.random.rand(16, 32, 3)
    assert resize(img, width=16).shape == (8, 16, 3)
    assert resize(img, height=8).shape == (8, 16, 3)
    assert resize(img, shape=(4, 4)).shape == (4, 4, 3)


def test_labels():
    label = draw_label("PSNR 30.0")
    assert label.ndim == 3 and label.shape[-1] == 3
    assert label.min() < 0.9  # some dark text pixels exist
    img = add_label(np.ones((16, 64, 3)) * 0.5, "test")
    assert img.shape[0] > 16


def test_turbo_colormap_range():
    x = np.linspace(0, 1, 64)
    rgb = turbo(x)
    assert rgb.shape == (64, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # turbo goes blue -> red (compare inside the ramp; x=0 is near-black)
    low, high = turbo(np.asarray([0.1, 0.9]))
    assert low[2] > low[0] and high[0] > high[2]


def test_depth_color_map():
    depth = np.random.rand(8, 8) * 10 + 0.1
    rgb = apply_depth_color_map(depth, near=0.1, far=11.0)
    assert rgb.shape == (8, 8, 3)
    assert apply_color_map_to_image(np.random.rand(4, 4)).shape == (4, 4, 3)


def test_interpolate_extrinsics_endpoints():
    e0 = _look_at([0, 0, -2], [0, 0, 4])
    e1 = _look_at([1.5, 0.3, -1.5], [0, 0, 4])
    t = np.linspace(0, 1, 7)
    out = interpolate_extrinsics(e0, e1, t)
    assert out.shape == (7, 4, 4)
    assert np.abs(out[0] - e0).max() < 1e-4
    assert np.abs(out[-1] - e1).max() < 1e-4
    # All poses are rigid transforms.
    for m in out:
        r = m[:3, :3]
        assert np.abs(r @ r.T - np.eye(3)).max() < 1e-4
        assert abs(np.linalg.det(r) - 1.0) < 1e-4


def test_interpolate_extrinsics_parallel_looks():
    e0 = _look_at([0, 0, -2], [0, 0, 4])
    e1 = e0.copy()
    e1[:3, 3] += np.asarray([0.5, 0.0, 0.0], np.float32)
    out = interpolate_extrinsics(e0, e1, np.linspace(0, 1, 3))
    assert np.isfinite(out).all()
    assert np.abs(out[0] - e0).max() < 1e-4
    assert np.abs(out[-1] - e1).max() < 1e-4


def test_interpolate_intrinsics():
    intr = np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32)
    out = interpolate_intrinsics(intr, intr * 2, np.asarray([0.0, 0.5, 1.0]))
    assert out.shape == (3, 3, 3)
    assert np.allclose(out[1], intr * 1.5)


def test_wobble():
    e0 = _look_at([0, 0, -2], [0, 0, 4])
    t = np.linspace(0, 1, 5)
    tf = generate_wobble_transformation(np.asarray(0.5), t)
    assert tf.shape == (5, 4, 4)
    # t=0 -> no displacement when radius scales with t
    assert np.abs(tf[0] - np.eye(4)).max() < 1e-6
    out = generate_wobble(e0, np.asarray(0.5), t)
    assert out.shape == (5, 4, 4)
    assert np.abs(out[0] - e0).max() < 1e-6


def test_spin():
    out = generate_spin(8, elevation=15.0, radius=2.0)
    assert out.shape == (8, 4, 4)
    # Camera stays at constant distance from origin.
    d = np.linalg.norm(out[:, :3, 3], axis=-1)
    assert np.allclose(d, d[0], atol=1e-5)


def test_benchmarker(tmp_path):
    import jax.numpy as jnp

    from latentsplat_tpu.misc.benchmarker import Benchmarker

    b = Benchmarker()
    with b.time("op"):
        pass
    b.time_fn("fn", lambda: jnp.ones(4) * 2)
    b.dump(tmp_path / "benchmark.json")
    b.dump_memory(tmp_path / "peak_memory.json")
    assert (tmp_path / "benchmark.json").exists()
    assert (tmp_path / "peak_memory.json").exists()
    assert set(b.summarize()) == {"op", "fn"}


def test_encoder_visualizer_panels():
    """All encoder-visualizer panels render on a tiny synthetic scene
    (ref encoder_visualizer_epipolar.py surface: overlaps, gaussians,
    probabilities, attention, color samples)."""
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from latentsplat_tpu.model.encoder.epipolar_sampler import (
        sample_epipolar_features,
    )
    from latentsplat_tpu.model.encoder.visualization import (
        visualize_attention_maps,
        visualize_epipolar_color_samples,
        visualize_gaussians,
        visualize_overlaps,
        visualize_probabilities,
    )

    v, h, w, s = 2, 8, 8, 4
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (1, v, h, w, 3))
    ext = jnp.tile(jnp.eye(4)[None, None], (1, v, 1, 1))
    ext = ext.at[0, 1, 0, 3].set(0.5)  # second camera offset in x
    intr = jnp.tile(
        jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])[None, None],
        (1, v, 1, 1),
    )
    near = jnp.full((1, v), 0.5)
    far = jnp.full((1, v), 20.0)
    ctx = {
        "image": images, "extrinsics": ext, "intrinsics": intr,
        "near": near, "far": far,
    }
    sampling = sample_epipolar_features(images, ext, intr, near, far, s)

    g = v * h * w
    gaussians = SimpleNamespace(
        opacities=jax.random.uniform(key, (1, g)),
        color_harmonics=jax.random.uniform(key, (1, g, 3, 1)),
        covariances=jnp.tile(jnp.eye(3)[None, None], (1, g, 1, 1)) * 1e-3,
    )

    panels = [
        visualize_overlaps(ctx, sampling),
        visualize_gaussians(ctx, gaussians, gaussians_per_pixel=1),
        visualize_probabilities(
            ctx, sampling, np.ones((1, v, h * w, s)) / s, num_rays=4
        ),
        visualize_attention_maps(
            ctx, sampling, np.ones((2, 2, h * w, s)) / s, num_rays=4
        ),
        visualize_epipolar_color_samples(ctx, num_rays=4, num_samples=s),
    ]
    for p in panels:
        assert p.ndim == 3 and p.shape[-1] == 3
        assert np.isfinite(p).all()
        assert p.shape[0] > 8 and p.shape[1] > 8
