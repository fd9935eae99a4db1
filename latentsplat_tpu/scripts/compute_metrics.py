"""Offline metric computation over rendered PNG directories.

Parity with reference src/scripts/compute_metrics.py:33-54: iterate the
evaluation dataset (batch size 1, frozen index), feed each example's ground
truth + the configured methods' rendered frames to the MetricComputer, and
write the per-scene + mean scores JSON.

    python -m latentsplat_tpu.scripts.compute_metrics +experiment=re10k \\
        evaluation.methods='[{name: Ours, key: ours, path: outputs/test/ours}]' \\
        evaluation.output_metrics_path=outputs/metrics.json \\
        dataset.view_sampler='{name: evaluation, index_path: assets/evaluation_index/re10k_extra.json}'
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from ..config import load_config
from ..config.loader import parse_cli_value
from ..dataset import get_dataset
from ..dataset.view_samplers import get_view_sampler
from ..evaluation.metric_computer import EvaluationCfg, MethodCfg, MetricComputer
from ..training.step_tracker import StepTracker


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    experiment = None
    overrides = []
    eval_overrides = {}
    for arg in argv:
        if arg.startswith("+experiment="):
            experiment = arg.split("=", 1)[1]
        elif arg.startswith("evaluation."):
            key, _, value = arg.partition("=")
            eval_overrides[key[len("evaluation."):]] = parse_cli_value(value)
        else:
            overrides.append(arg)

    cfg = load_config(experiment, overrides)
    methods = [
        MethodCfg(m["name"], m["key"], Path(m["path"]))
        for m in eval_overrides.get("methods", [])
    ]
    assert methods, "pass evaluation.methods=[{name, key, path}, ...]"
    eval_cfg = EvaluationCfg(
        methods=methods,
        side_by_side_path=(
            Path(p) if (p := eval_overrides.get("side_by_side_path")) else None
        ),
        animate_side_by_side=bool(eval_overrides.get("animate_side_by_side", False)),
    )

    view_sampler = get_view_sampler(
        cfg.dataset.view_sampler, "test", False,
        cfg.dataset.cameras_are_circular, StepTracker(),
    )
    dataset = get_dataset(cfg.dataset, "test", view_sampler)

    computer = MetricComputer(eval_cfg)
    for example in dataset:
        batch = {
            "scene": example["scene"],
            "context": {"index": example["context"]["index"]},
            "target": {
                "index": example["target"]["index"],
                "image": example["target"]["image"][None],
            },
        }
        computer.step(batch)

    out_path = Path(eval_overrides.get("output_metrics_path", "outputs/metrics.json"))
    computer.save_scores(out_path)
    with out_path.with_suffix(".mean.json").open("w") as f:
        json.dump(computer.mean_scores(), f, indent=2)
    print(f"scores -> {out_path}")


if __name__ == "__main__":
    main()
