"""Evaluation-index generation (offline tooling).

Parity with reference src/evaluation/evaluation_index_generator.py:33-168
(RE10k ray-overlap search) and co3d_evaluation_index_generator.py:27-116
(CO3D frame-distance windows with circular modulo). Plain functions over a
dataset iterator (batch size 1 semantics) instead of Lightning test steps;
the per-pair ray-overlap check is one jitted program over all rays.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import get_world_rays, project_rays, sample_image_grid
from .types import IndexEntry


@dataclass
class EvaluationIndexGeneratorCfg:
    num_target_views: int
    min_context_overlap: float
    max_context_overlap: float
    min_context_distance: int
    max_context_distance: int
    max_target_distance: int
    intra_context: bool
    output_path: Path
    save_previews: bool = False
    seed: int = 0
    num_context_pairs_per_scene: int = 1


@dataclass
class CO3DEvaluationIndexGeneratorCfg:
    num_target_views: int
    min_context_distance: int
    max_context_distance: int
    intra_context: bool
    output_path: Path
    save_previews: bool = False
    seed: int = 0
    num_context_pairs_per_scene: int = 1


@partial(jax.jit, static_argnames=("image_shape",))
def _mutual_overlap(
    ext_a: jnp.ndarray,
    intr_a: jnp.ndarray,
    ext_b: jnp.ndarray,
    intr_b: jnp.ndarray,
    image_shape: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fraction of view-a rays overlapping image b, and vice versa."""
    xy, _ = sample_image_grid(image_shape)
    xy = xy.reshape(-1, 2)
    origins_a, dirs_a = get_world_rays(xy, ext_a, intr_a)
    origins_b, dirs_b = get_world_rays(xy, ext_b, intr_b)
    onto_b = project_rays(origins_a, dirs_a, ext_b, intr_b)
    onto_a = project_rays(origins_b, dirs_b, ext_a, intr_a)
    return (
        onto_a["overlaps_image"].astype(jnp.float32).mean(),
        onto_b["overlaps_image"].astype(jnp.float32).mean(),
    )


def generate_evaluation_index_for_scene(
    cfg: EvaluationIndexGeneratorCfg,
    extrinsics: np.ndarray,   # (v, 4, 4)
    intrinsics: np.ndarray,   # (v, 3, 3)
    image_shape: tuple[int, int],
    rng: np.random.Generator,
) -> List[IndexEntry]:
    """Ray-overlap-filtered context pair + target view search for one scene
    (ref: evaluation_index_generator.py:45-159)."""
    v = extrinsics.shape[0]
    ext = jnp.asarray(extrinsics)
    intr = jnp.asarray(intrinsics)
    views: List[IndexEntry] = []

    for context_index in rng.permutation(v):
        context_index = int(context_index)
        valid_indices = []
        for step in (1, -1):
            current_index = context_index + step * cfg.min_context_distance
            while 0 <= current_index < v:
                overlap_a, overlap_b = _mutual_overlap(
                    ext[context_index], intr[context_index],
                    ext[current_index], intr[current_index],
                    tuple(image_shape),
                )
                overlap_a, overlap_b = float(overlap_a), float(overlap_b)
                overlap = min(overlap_a, overlap_b)
                delta = abs(current_index - context_index)

                if cfg.min_context_overlap <= overlap <= cfg.max_context_overlap:
                    valid_indices.append(current_index)
                if overlap < cfg.min_context_overlap or delta > cfg.max_context_distance:
                    break
                current_index += step

        if not valid_indices:
            continue
        chosen = valid_indices[int(rng.integers(len(valid_indices)))]
        context_left = min(chosen, context_index)
        context_right = max(chosen, context_index)

        if cfg.intra_context:
            target_views = np.arange(context_left, context_right + 1)
        else:
            target_views = np.concatenate(
                [
                    np.arange(
                        max(context_left - cfg.max_target_distance, 0), context_left
                    ),
                    np.arange(
                        context_right + 1,
                        min(context_right + cfg.max_target_distance + 1, v),
                    ),
                ]
            )
        if len(target_views) < cfg.num_target_views:
            continue
        target_views = rng.permutation(target_views)[: cfg.num_target_views]
        views.append(
            IndexEntry(
                context=(context_left, context_right),
                target=tuple(int(t) for t in np.sort(target_views)),
            )
        )
        if len(views) == cfg.num_context_pairs_per_scene:
            break
    return views


def generate_co3d_evaluation_index_for_scene(
    cfg: CO3DEvaluationIndexGeneratorCfg,
    num_views: int,
    rng: np.random.Generator,
) -> List[IndexEntry]:
    """Circular-camera frame-distance context pairs + targets for one scene
    (ref: co3d_evaluation_index_generator.py:48-108)."""
    v = num_views
    views: List[IndexEntry] = []
    context_indices = rng.permutation(v)[: cfg.num_context_pairs_per_scene]
    offsets = np.arange(cfg.min_context_distance, cfg.max_context_distance)
    offsets = np.concatenate([-offsets, offsets])

    for context_index in context_indices:
        partner = int(context_index) + int(offsets[rng.integers(len(offsets))])
        context_left, context_right = sorted((int(context_index), partner))

        if cfg.intra_context:
            target_views = np.arange(context_left, context_right + 1)
        else:
            if context_left < 0 and context_right < v:
                target_views = np.arange(context_right + 1, context_left % v)
            elif context_left >= 0 and context_right < v:
                target_views = np.concatenate(
                    [np.arange(0, context_left), np.arange(context_right, v)]
                )
            elif context_left >= 0 and context_right >= v:
                target_views = np.arange(context_right % v + 1, context_left)
            else:
                raise ValueError("Impossible context window")

        if len(target_views) < cfg.num_target_views:
            continue
        target_views = rng.permutation(target_views)[: cfg.num_target_views]
        target_views = np.sort(target_views)
        # Circular wrap AFTER sorting (perceptual order is already correct).
        views.append(
            IndexEntry(
                context=(context_left % v, context_right % v),
                target=tuple(int(t) % v for t in target_views),
            )
        )
    return views


def save_index(index: Dict[str, List[IndexEntry]], output_path: Path) -> None:
    output_path = Path(output_path)
    output_path.mkdir(exist_ok=True, parents=True)
    with (output_path / "evaluation_index.json").open("w") as f:
        json.dump(
            {k: [v.to_dict() for v in entries] for k, entries in index.items()}, f
        )


def load_index(path: Path) -> Dict[str, Optional[List[IndexEntry]]]:
    """Read an evaluation_index.json (also accepts the reference's
    {scene: {context, target}} single-entry format)."""
    with Path(path).open() as f:
        raw = json.load(f)
    out: Dict[str, Optional[List[IndexEntry]]] = {}
    for scene, entries in raw.items():
        if entries is None:
            out[scene] = None
        elif isinstance(entries, dict):
            out[scene] = [IndexEntry.from_dict(entries)]
        else:
            out[scene] = [IndexEntry.from_dict(e) for e in entries]
    return out
