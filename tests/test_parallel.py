"""Unit tests for the data-parallel mesh utilities."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from latentsplat_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    replicate_sharding,
    shard_batch,
)


def test_mesh_spans_requested_devices():
    devices = jax.devices()[:4]
    mesh = make_mesh(devices)
    assert mesh.devices.size == 4
    assert mesh.axis_names == ("data",)


def test_shard_batch_partitions_leading_axis():
    mesh = make_mesh(jax.devices()[:4])
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    sharded = shard_batch(batch, mesh)
    shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
    assert shard_shapes == {(2, 3)}
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_parallel_step_matches_single_device_gradients():
    """A toy sharded SGD step must equal the single-device computation:
    XLA's inserted all-reduce averages per-shard gradients exactly like a
    big-batch single-device step (the DDP semantics, src/main.py:93-105)."""
    mesh = make_mesh(jax.devices()[:4])

    def train_step(state, batch, rng, flags):
        params = state

        def loss_fn(p):
            pred = batch["x"] @ p
            return jnp.mean((pred - batch["y"]) ** 2)

        grads = jax.grad(loss_fn)(params)
        return params - 0.1 * grads, {"loss": loss_fn(params)}

    p_step = make_parallel_train_step(train_step, mesh)

    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    batch = {
        "x": rng.normal(size=(8, 3)).astype(np.float32),
        "y": rng.normal(size=(8,)).astype(np.float32),
    }
    # Reference first: p_step donates its params argument.
    ref_params, ref_logs = train_step(
        params, {k: jnp.asarray(v) for k, v in batch.items()}, None, None
    )
    sharded = shard_batch(batch, mesh)
    new_params, logs = p_step(params, sharded, jax.random.PRNGKey(0), None)
    np.testing.assert_allclose(np.asarray(new_params), np.asarray(ref_params), atol=1e-6)
    np.testing.assert_allclose(float(logs["loss"]), float(ref_logs["loss"]), atol=1e-6)


def test_replicate_sharding_is_full_copy():
    mesh = make_mesh(jax.devices()[:2])
    x = jax.device_put(jnp.ones((4,)), replicate_sharding(mesh))
    assert {s.data.shape for s in x.addressable_shards} == {(4,)}


@pytest.mark.slow
def test_view_parallel_render_matches_single_device():
    """shard_map over the view axis renders identically to the plain path
    (views independent, gaussians replicated)."""
    import numpy as np
    from latentsplat_tpu.ops.gaussians import build_covariance
    from latentsplat_tpu.ops.rasterize import render
    from latentsplat_tpu.parallel.mesh import make_mesh
    from latentsplat_tpu.parallel.render import make_view_parallel_render

    v = 8
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    n = 32
    xy = jax.random.uniform(ks[0], (n, 2), minval=-0.4, maxval=0.4)
    z = jax.random.uniform(ks[1], (n,), minval=2.0, maxval=5.0)
    means = jnp.concatenate([xy * z[:, None], z[:, None]], axis=-1)
    covs = build_covariance(
        jax.random.uniform(ks[2], (n, 3), minval=0.05, maxval=0.15),
        jax.random.normal(ks[3], (n, 4)),
    )
    cams = {
        "extrinsics": jnp.tile(jnp.eye(4)[None, None], (1, v, 1, 1)),
        "intrinsics": jnp.tile(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])[None, None],
            (1, v, 1, 1),
        ),
        "near": jnp.full((1, v), 0.5),
        "far": jnp.full((1, v), 20.0),
    }
    gauss = {
        "background_color": jnp.zeros((1, 3)),
        "gaussian_means": means[None],
        "gaussian_covariances": covs[None],
        "gaussian_opacities": jax.random.uniform(ks[4], (n,), minval=0.3, maxval=0.9)[None],
        "gaussian_color_sh": jax.random.normal(ks[5], (n, 3, 1))[None] * 0.3,
        "gaussian_feature_sh": jax.random.normal(ks[5], (n, 2, 1))[None] * 0.3,
    }

    mesh = make_mesh()
    fn = make_view_parallel_render(mesh, (16, 16), backend="dense")
    sharded_out = fn(cams, gauss)
    plain = render(
        cams["extrinsics"], cams["intrinsics"], cams["near"], cams["far"],
        (16, 16), backend="dense", **gauss,
    )
    np.testing.assert_allclose(
        np.asarray(sharded_out.color), np.asarray(plain.color), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded_out.mask), np.asarray(plain.mask), atol=1e-5
    )
