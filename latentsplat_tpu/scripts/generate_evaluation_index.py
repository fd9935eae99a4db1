"""Generate an evaluation index (frozen context/target view selections).

Parity with reference src/scripts/generate_evaluation_index.py +
evaluation_index_generator.py:33-168: per scene, find ray-overlap-filtered
context pairs and sample target views, then write evaluation_index.json.

    python -m latentsplat_tpu.scripts.generate_evaluation_index \\
        +experiment=re10k dataset.view_sampler='{name: all}' \\
        index_generator.output_path=outputs/evaluation_index_re10k
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..config import load_config
from ..config.loader import parse_cli_value
from ..dataset import get_dataset
from ..dataset.view_samplers import get_view_sampler
from ..evaluation.evaluation_index_generator import (
    EvaluationIndexGeneratorCfg,
    generate_evaluation_index_for_scene,
    save_index,
)
from ..training.step_tracker import StepTracker

DEFAULTS = dict(
    num_target_views=3,
    min_context_overlap=0.6,
    max_context_overlap=1.0,
    min_context_distance=45,
    max_context_distance=135,
    max_target_distance=45,
    intra_context=True,
    output_path="outputs/evaluation_index",
    seed=123,
    num_context_pairs_per_scene=1,
)


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    experiment = None
    overrides = []
    gen_kwargs = dict(DEFAULTS)
    for arg in argv:
        if arg.startswith("+experiment="):
            experiment = arg.split("=", 1)[1]
        elif arg.startswith("index_generator."):
            key, _, value = arg.partition("=")
            gen_kwargs[key[len("index_generator."):]] = parse_cli_value(value)
        else:
            overrides.append(arg)

    cfg = load_config(experiment, overrides)
    gen_cfg = EvaluationIndexGeneratorCfg(
        **{**gen_kwargs, "output_path": Path(gen_kwargs["output_path"])}
    )

    view_sampler = get_view_sampler(
        cfg.dataset.view_sampler, "test", False,
        cfg.dataset.cameras_are_circular, StepTracker(),
    )
    dataset = get_dataset(cfg.dataset, "test", view_sampler)

    rng = np.random.default_rng(gen_cfg.seed)
    index = {}
    for example in dataset:
        scene = example["scene"]
        if scene in index:
            continue
        target = example["target"]
        h, w = np.asarray(target["image"]).shape[-3:-1]
        entries = generate_evaluation_index_for_scene(
            gen_cfg,
            np.asarray(target["extrinsics"]),
            np.asarray(target["intrinsics"]),
            (h, w),
            rng,
        )
        index[scene] = entries
        print(f"{scene}: {len(entries)} entries")

    save_index(index, gen_cfg.output_path)
    print(f"index -> {gen_cfg.output_path}/evaluation_index.json")


if __name__ == "__main__":
    main()
