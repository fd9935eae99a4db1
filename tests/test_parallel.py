"""Unit tests for the data-parallel mesh utilities."""

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
