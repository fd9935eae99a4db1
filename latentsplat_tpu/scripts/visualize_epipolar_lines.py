"""Visualize epipolar line segments between context views.

Parity with reference src/scripts/visualize_epipolar_lines.py: pick rays in
one context view, project them onto the other view's image plane
(geometry.epipolar_lines.project_rays), and draw the clipped segments +
sample points over the images.

    python -m latentsplat_tpu.scripts.visualize_epipolar_lines +experiment=re10k \\
        output_path=outputs/epipolar
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..dataset import get_dataset
from ..dataset.view_samplers import get_view_sampler
from ..geometry import get_world_rays, project_rays
from ..misc.image_io import save_image
from ..training.step_tracker import StepTracker
from ..visualization.color_map import turbo
from ..visualization.drawing.lines import draw_lines
from ..visualization.drawing.points import draw_points
from ..visualization.layout import hcat


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    experiment = None
    overrides = []
    output_path = Path("outputs/epipolar")
    num_rays = 6
    for arg in argv:
        if arg.startswith("+experiment="):
            experiment = arg.split("=", 1)[1]
        elif arg.startswith("output_path="):
            output_path = Path(arg.split("=", 1)[1])
        elif arg.startswith("num_rays="):
            num_rays = int(arg.split("=", 1)[1])
        else:
            overrides.append(arg)

    cfg = load_config(experiment, overrides)
    view_sampler = get_view_sampler(
        cfg.dataset.view_sampler, "test", False,
        cfg.dataset.cameras_are_circular, StepTracker(),
    )
    dataset = get_dataset(cfg.dataset, "test", view_sampler)

    rng = np.random.default_rng(0)
    for i, example in enumerate(dataset):
        if i >= 4:
            break
        ctx = example["context"]
        image_a = np.asarray(ctx["image"][0])
        image_b = np.asarray(ctx["image"][1])

        xy = rng.uniform(0.2, 0.8, size=(num_rays, 2)).astype(np.float32)
        origins, directions = get_world_rays(
            jnp.asarray(xy),
            jnp.asarray(ctx["extrinsics"][0]),
            jnp.asarray(ctx["intrinsics"][0]),
        )
        projection = project_rays(
            origins, directions,
            jnp.asarray(ctx["extrinsics"][1]),
            jnp.asarray(ctx["intrinsics"][1]),
        )
        colors = turbo(np.linspace(0.2, 0.9, num_rays))

        left = draw_points(image_a, xy, colors, radius=3.0)
        valid = np.asarray(projection["overlaps_image"])
        start = np.asarray(projection["xy_min"])[valid]
        end = np.asarray(projection["xy_max"])[valid]
        right = draw_lines(image_b, start, end, colors[valid], radius=1.5)

        save_image(hcat(left, right), output_path / f"{example['scene']}.png")
        print(example["scene"])


if __name__ == "__main__":
    main()
