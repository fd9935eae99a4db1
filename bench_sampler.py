"""Epipolar-sampler micro-bench: attribute the measured ~66 ms fwd+bwd
(bench_enc_stages) between the forward gather and the backward scatter-add,
and measure the gather-free one-hot matmul alternative (ops/grid_sample.
grid_sample_2d_mxu) at the flagship shape.

Usage: python -u bench_sampler.py
"""
import sys
import time

import jax
import jax.numpy as jnp

ITERS = 5
SIZE, BATCH = 256, 2


def _time(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    from __graft_entry__ import _arc_batch, _flagship_model
    from latentsplat_tpu.model.encoder.epipolar_sampler import (
        sample_epipolar_features,
    )

    cfg, model = _flagship_model([f"dataset.image_shape=[{SIZE},{SIZE}]"])
    ecfg = cfg.model.encoder
    batch = _arc_batch(b=BATCH, v_ctx=2, v_tgt=4, h=SIZE, w=SIZE)
    ctx = batch["context"]
    h = w = SIZE // 4
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 2, h, w, ecfg.d_feature), jnp.float32
    )
    ns = ecfg.epipolar_transformer.num_samples

    def run(f):
        return jnp.sum(
            sample_epipolar_features(
                f, ctx["extrinsics"], ctx["intrinsics"], ctx["near"],
                ctx["far"], ns,
            ).features
        )

    fwd = jax.jit(run)
    t = _time(fwd, feats)
    print(f"sampler_fwd: {t*1e3:.1f} ms", flush=True)

    fwdbwd = jax.jit(lambda f: jnp.sum(jax.grad(run)(f)))
    t = _time(fwdbwd, feats)
    print(f"sampler_fwd_bwd: {t*1e3:.1f} ms", flush=True)

    # Same with the one-hot MXU sampler patched in.
    import latentsplat_tpu.model.encoder.epipolar_sampler as es
    from latentsplat_tpu.ops.grid_sample import grid_sample_2d_mxu

    orig = es.grid_sample_2d
    es.grid_sample_2d = grid_sample_2d_mxu
    try:
        fwd2 = jax.jit(run)
        t = _time(fwd2, feats)
        print(f"sampler_mxu_fwd: {t*1e3:.1f} ms", flush=True)
        fwdbwd2 = jax.jit(lambda f: jnp.sum(jax.grad(run)(f)))
        t = _time(fwdbwd2, feats)
        print(f"sampler_mxu_fwd_bwd: {t*1e3:.1f} ms", flush=True)

        # parity
        a = jax.jit(lambda f: sample_epipolar_features(
            f, ctx["extrinsics"], ctx["intrinsics"], ctx["near"], ctx["far"],
            ns).features)(feats)
    finally:
        es.grid_sample_2d = orig
    b = jax.jit(lambda f: sample_epipolar_features(
        f, ctx["extrinsics"], ctx["intrinsics"], ctx["near"], ctx["far"],
        ns).features)(feats)
    print(f"mxu_vs_gather_max_abs_diff: {float(jnp.max(jnp.abs(a-b))):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
