"""Profile ONE fused train step on the TPU and aggregate device op times.

Runs the flagship 256px b2 VAE-GAN step (fast precision, best remat
config), captures a jax.profiler trace of one post-warmup step, and prints
the top device ops by total duration.
"""
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

SIZE, BATCH = 256, 2


def main():
    from __graft_entry__ import _arc_batch, _flagship_model
    from latentsplat_tpu.loss.losses import get_loss_group
    from latentsplat_tpu.training.step import (
        GROUP_NAMES, TrainState, build_optimizers, make_step_flags,
        make_train_step,
    )

    overrides = [
        f"dataset.image_shape=[{SIZE},{SIZE}]",
        "model.remat_policy=vae:off,lpips:off",
        "model.decoder.precision=fast",
        "model.remat=true",
        "model.decoder.remat=true",
        "loss.target_render_image.nll=[{name: mse, weight: 10}, {name: lpips, weight: 0.5}]",
        "loss.target_combined.nll=[{name: l1}, {name: lpips}]",
        "loss.target_combined.generator={name: generator, weight: 0.5}",
        "loss.target_combined.discriminator={name: discriminator, loss: hinge}",
    ]
    cfg, model = _flagship_model(overrides)
    losses = {n: get_loss_group(n, getattr(cfg.loss, n)) for n in GROUP_NAMES}
    batch_data = _arc_batch(b=BATCH, v_ctx=2, v_tgt=4, h=SIZE, w=SIZE)
    params = model.init_params(jax.random.PRNGKey(0), batch_data)
    opt_gen, opt_disc = build_optimizers(model, cfg.optimizer, BATCH)
    state = TrainState(
        params_gen=params["generator"],
        params_disc=params.get("discriminator"),
        lpips_params=params["lpips"],
        opt_gen=opt_gen.init(params["generator"]),
        opt_disc=opt_disc.init(params["discriminator"]) if opt_disc else None,
        step=jnp.zeros((), jnp.int32),
    )
    flags = make_step_flags(losses, 0)
    step_fn = jax.jit(
        make_train_step(model, losses, opt_gen, opt_disc), static_argnums=(3,)
    )
    t0 = time.perf_counter()
    state, logs = step_fn(state, batch_data, jax.random.PRNGKey(1), flags)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    state, logs = step_fn(state, batch_data, jax.random.PRNGKey(2), flags)
    float(logs["generator/total"])

    jax.profiler.start_trace("/tmp/train_trace")
    state, logs = step_fn(state, batch_data, jax.random.PRNGKey(3), flags)
    float(logs["generator/total"])
    jax.profiler.stop_trace()

    files = sorted(glob.glob("/tmp/train_trace/plugins/profile/*/*.trace.json.gz"))
    assert files, "no trace produced"
    d = json.load(gzip.open(files[-1]))
    events = d["traceEvents"]
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))
    }
    total = 0.0
    by_name = defaultdict(float)
    by_count = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            # strip trailing .N indices
            base = re.sub(r"\.\d+$", "", name)
            by_name[base] += e.get("dur", 0.0)
            by_count[base] += 1
            total += e.get("dur", 0.0)
    print(f"total device time: {total/1e3:.1f} ms over {sum(by_count.values())} op instances")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in rows[:60]:
        print(f"{dur/1e3:9.2f} ms  x{by_count[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
