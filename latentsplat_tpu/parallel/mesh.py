"""Device-mesh data parallelism.

The reference's only parallelism is Lightning DDP over GPUs with NCCL
all-reduce (src/main.py:93-105, strategy="ddp_find_unused_parameters_true").
The TPU-native replacement: a `jax.sharding.Mesh` over the chips' ICI with
the batch axis sharded; `jax.jit` with explicit in/out shardings compiles
the whole train step as one SPMD program, and XLA inserts the gradient
all-reduce collectives. The reference's `find_unused_parameters` hack (loss
groups activate at different steps) is unnecessary: branch activity is a
*static* `StepFlags` argument, so every compiled graph touches exactly the
parameters it uses and gradients for unused subtrees are structural zeros.

Multi-host: call `jax.distributed.initialize()` before `make_mesh`; the
mesh spans all processes' devices and per-host data loading feeds each
process its batch shard (mirroring the per-worker chunk sharding in
dataset_re10k.py:80-86).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """A 1D data-parallel mesh over all (or the given) devices.

    The model is ~100M params and activation-dominated; pure DP over ICI is
    the right mapping (see SURVEY.md §2.2 — the reference has no TP/PP/SP
    either). Rays/views are independent, so batch sharding scales linearly.
    """
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def make_parallel_train_step(train_step, mesh: Mesh):
    """jit the fused train step over the mesh.

    state/rng replicated; batch sharded on its leading axis; StepFlags is a
    static argument (it keys the compiled-graph cache exactly like the
    reference's host-side `get_active_loss_groups` decides which branches
    run, model_wrapper.py:276-284).
    """
    repl = replicate_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        static_argnums=(3,),
        donate_argnums=(0,),
    )
