"""Run loggers: local-file logger + optional wandb.

Parity with the reference's LocalLogger (src/misc/LocalLogger.py:150-186 —
PNG dumps under outputs/local) and its rank-0 wandb logger (src/main.py:56-75),
without Lightning. Scalars additionally go to a metrics.jsonl for offline
plotting.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..misc.image_io import save_image, save_video

LOG_PATH = Path("outputs/local")


class LocalLogger:
    def __init__(self, output_dir: Path = LOG_PATH, clear: bool = True):
        self.output_dir = Path(output_dir)
        if clear and self.output_dir.exists():
            shutil.rmtree(self.output_dir, ignore_errors=True)
        self.output_dir.mkdir(exist_ok=True, parents=True)
        self._scalars = (self.output_dir / "metrics.jsonl").open("a")

    def log_scalars(self, scalars: Dict[str, float], step: int) -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        self._scalars.write(json.dumps(record) + "\n")
        self._scalars.flush()

    def log_image(self, key: str, image: np.ndarray, step: int) -> None:
        # Mirror LocalLogger.log_image's {key}/{step:0>6}.png layout.
        path = self.output_dir / key / f"{step:0>6}.png"
        save_image(image, path)

    def log_video(self, key: str, frames, step: int, fps: int = 30) -> None:
        path = self.output_dir / key / f"{step:0>6}.mp4"
        save_video(frames, path, fps=fps)

    def close(self) -> None:
        self._scalars.close()


class WandbLogger:
    """Thin wandb wrapper; silently degrades to LocalLogger when wandb is
    unavailable or disabled."""

    def __init__(self, cfg, output_dir: Path):
        try:
            import wandb  # noqa: F401

            self._wandb = wandb
            self.run = wandb.init(
                project=cfg.project,
                entity=cfg.entity or None,
                name=cfg.name,
                mode=cfg.mode,
                tags=list(cfg.tags) or None,
            )
        except Exception:
            self._wandb = None
        self.local = LocalLogger(output_dir, clear=False)

    def log_scalars(self, scalars: Dict[str, float], step: int) -> None:
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in scalars.items()}, step=step)
        self.local.log_scalars(scalars, step)

    def log_image(self, key: str, image: np.ndarray, step: int) -> None:
        if self._wandb is not None:
            self._wandb.log(
                {key: self._wandb.Image(np.asarray(image))}, step=step
            )
        self.local.log_image(key, image, step)

    def log_video(self, key: str, frames, step: int, fps: int = 30) -> None:
        self.local.log_video(key, frames, step, fps)

    def close(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        self.local.close()


def get_logger(wandb_cfg, output_dir: Path):
    if wandb_cfg is not None and wandb_cfg.activated and wandb_cfg.mode != "disabled":
        return WandbLogger(wandb_cfg, output_dir)
    return LocalLogger(output_dir)
