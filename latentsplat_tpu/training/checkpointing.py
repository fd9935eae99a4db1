"""Checkpoint save / load / resume (orbax).

Parity with the reference's Lightning ModelCheckpoint + two load modes
(src/main.py:78-85,138-146): periodic full-state checkpoints
(every_n_train_steps, save_top_k=-1 semantics = keep all), `load` for
weights-only initialization vs `resume` for full optimizer/step state.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(state: Any, directory: Path, step: int) -> Path:
    """Write the full TrainState under directory/step_<step>."""
    directory = Path(directory)
    directory.mkdir(exist_ok=True, parents=True)
    path = directory / f"step_{step:08d}"
    # Orbax wants host arrays for cross-backend portability.
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, state
    )
    _checkpointer().save(path.absolute(), host_state, force=True)
    latest = directory / "latest"
    tmp = directory / ".latest.tmp"
    tmp.write_text(path.name)
    tmp.replace(latest)
    return path


def latest_checkpoint(directory: Path) -> Optional[Path]:
    directory = Path(directory)
    pointer = directory / "latest"
    if pointer.exists():
        path = directory / pointer.read_text().strip()
        if path.exists():
            return path
    steps = sorted(directory.glob("step_*"))
    return steps[-1] if steps else None


def load_checkpoint(path: Path, target: Any = None) -> Any:
    """Load a checkpoint; `target` (a matching pytree) restores exact
    structure/dtypes when given."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    if target is None:
        return checkpointer.restore(Path(path).absolute())
    host_target = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, target
    )
    restored = checkpointer.restore(
        Path(path).absolute(), item=host_target
    )
    return jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r) if hasattr(t, "dtype") else r,
        target,
        restored,
    )


def load_generator_weights(path: Path, params_gen: Any) -> Any:
    """Weights-only load (the reference's `checkpointing.load` with
    resume=false: load_from_checkpoint(..., strict=False), src/main.py:141-144).
    Missing subtrees keep their fresh initialization."""
    restored = load_checkpoint(path)
    source = restored.get("params_gen", restored)

    def merge(target, src):
        if isinstance(target, dict) and isinstance(src, dict):
            return {
                k: merge(v, src[k]) if k in src else v for k, v in target.items()
            }
        if src is None:
            return target
        return jax.numpy.asarray(src)

    return merge(params_gen, source)


def resolve_checkpoint_uri(uri: str, download_dir: Path = Path("checkpoints")) -> Path:
    """Resolve `wandb://run_id:version` checkpoint URIs to a local path.

    Parity with reference src/misc/wandb_tools.py:87-138: download the
    model artifact of a W&B run. Plain paths pass through unchanged; the
    wandb scheme requires the wandb package and network access.
    """
    if not uri.startswith("wandb://"):
        return Path(uri)
    import wandb  # raises ImportError in offline environments

    run_id, _, version = uri[len("wandb://"):].partition(":")
    version = version or "latest"
    api = wandb.Api()
    artifact = api.artifact(f"{run_id.replace(':', '/')}:{version}", type="model")
    path = Path(artifact.download(root=str(download_dir / run_id)))
    candidates = sorted(path.glob("*.ckpt")) + sorted(path.glob("step_*"))
    return candidates[-1] if candidates else path
