"""Dump ground-truth target frames into the method-directory layout so the
real captures can be scored/compared like a method.

Parity with reference src/scripts/generate_gt_image_directory.py +
evaluation/gt_saver.py:125-157.

    python -m latentsplat_tpu.scripts.generate_gt_image_directory \\
        +experiment=re10k output_path=outputs/gt \\
        dataset.view_sampler='{name: evaluation, index_path: assets/evaluation_index/re10k_extra.json}'
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..config import load_config
from ..dataset import get_dataset
from ..dataset.view_samplers import get_view_sampler
from ..misc.image_io import save_image
from ..training.step_tracker import StepTracker


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    experiment = None
    overrides = []
    output_path = Path("outputs/gt")
    for arg in argv:
        if arg.startswith("+experiment="):
            experiment = arg.split("=", 1)[1]
        elif arg.startswith("output_path="):
            output_path = Path(arg.split("=", 1)[1])
        else:
            overrides.append(arg)

    cfg = load_config(experiment, overrides)
    view_sampler = get_view_sampler(
        cfg.dataset.view_sampler, "test", False,
        cfg.dataset.cameras_are_circular, StepTracker(),
    )
    dataset = get_dataset(cfg.dataset, "test", view_sampler)

    for example in dataset:
        scene = example["scene"]
        ctx_str = "_".join(
            str(int(i)) for i in np.sort(np.asarray(example["context"]["index"]))
        )
        for image, index in zip(
            example["target"]["image"], example["target"]["index"]
        ):
            save_image(
                image, output_path / scene / ctx_str / "color" / f"{int(index):0>6}.png"
            )
        # Context frames feed the paper figures' "Ref." column
        # (paper/common.py context_panel).
        for image, index in zip(
            example["context"]["image"], example["context"]["index"]
        ):
            save_image(
                image,
                output_path / scene / ctx_str / "context" / f"{int(index):0>6}.png",
            )
        print(scene)


if __name__ == "__main__":
    main()
