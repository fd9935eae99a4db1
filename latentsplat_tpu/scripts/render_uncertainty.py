"""Render feature-PCA and uncertainty (std) visualizations from variational
Gaussians.

Parity with reference src/scripts/render_uncertainty.py:120-298: encode the
context views, splat the variational Gaussians, then visualize (a) a PCA
projection of the rendered latent-feature means to RGB and (b) the per-pixel
posterior standard deviation as an uncertainty heat map.

    python -m latentsplat_tpu.scripts.render_uncertainty +experiment=re10k \\
        checkpointing.load=outputs/checkpoints/step_00200000 \\
        output_path=outputs/uncertainty
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import numpy as np

from ..config import load_config
from ..misc.image_io import save_image
from ..visualization.color_map import apply_color_map
from ..visualization.layout import hcat


def pca_rgb(features: np.ndarray) -> np.ndarray:
    """(h, w, c) -> (h, w, 3) via PCA to 3 components, normalized to [0,1]."""
    h, w, c = features.shape
    flat = features.reshape(-1, c)
    flat = flat - flat.mean(axis=0)
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T
    lo, hi = np.quantile(proj, 0.01, axis=0), np.quantile(proj, 0.99, axis=0)
    proj = (proj - lo) / np.maximum(hi - lo, 1e-9)
    return np.clip(proj.reshape(h, w, 3), 0.0, 1.0)


def uncertainty_map(std: np.ndarray) -> np.ndarray:
    """(h, w, c) posterior std -> turbo heat map of the mean channel std."""
    mag = std.mean(axis=-1)
    lo, hi = mag.min(), mag.max()
    return apply_color_map((mag - lo) / max(hi - lo, 1e-9))


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    experiment = None
    overrides = []
    output_path = Path("outputs/uncertainty")
    for arg in argv:
        if arg.startswith("+experiment="):
            experiment = arg.split("=", 1)[1]
        elif arg.startswith("output_path="):
            output_path = Path(arg.split("=", 1)[1])
        else:
            overrides.append(arg)

    cfg = load_config(experiment, overrides)
    assert cfg.model.variational != "none", "uncertainty needs a variational model"

    from ..training.checkpointing import load_checkpoint
    from ..training.trainer import Trainer, strip_batch

    trainer = Trainer(cfg, output_path)
    assert cfg.checkpointing.load is not None, "pass checkpointing.load=..."
    restored = load_checkpoint(Path(cfg.checkpointing.load))
    params_gen = restored["params_gen"]
    model = trainer.model

    loader = trainer._loader("test", 1, repeat=False)
    rng = jax.random.PRNGKey(cfg.seed)
    for batch in loader:
        scene = batch["scene"][0] if isinstance(batch["scene"], list) else batch["scene"]
        arrays = jax.tree_util.tree_map(
            lambda x: jax.numpy.asarray(x), strip_batch(batch)
        )
        shimmed = trainer.data_shim(arrays)
        gaussians = model.apply_encoder(
            params_gen, shimmed["context"], 0, None, deterministic=True
        )
        target = shimmed["target"]
        size = model.scaled_size(
            model.scale_factor, target["image"].shape[-3:-1]
        )
        rendered = model.decoder(
            gaussians.mode(),
            target["extrinsics"], target["intrinsics"],
            target["near"], target["far"], size,
            return_colors=True, return_features=True,
        )
        posterior = rendered.feature_posterior
        mean = np.asarray(posterior.mean[0])
        std = np.asarray(posterior.std[0]) if posterior.logvar is not None else np.zeros_like(mean)
        for v in range(mean.shape[0]):
            row = hcat(
                np.asarray(rendered.color[0, v]) if rendered.color is not None else pca_rgb(mean[v]),
                pca_rgb(mean[v]),
                uncertainty_map(std[v]),
            )
            save_image(row, output_path / scene / f"{v:0>3}.png")
        print(scene)


if __name__ == "__main__":
    main()
