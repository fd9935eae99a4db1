"""Image and video IO (host-side, numpy/PIL).

Parity with reference src/misc/image_io.py:207-262 (save_image/load_image/
save_video via ffmpeg), NHWC [0,1] float images instead of CHW tensors.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Iterable, Union

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

FloatImage = np.ndarray  # (h, w), (h, w, 1) or (h, w, 3) in [0, 1]


def prep_image(image: np.ndarray) -> np.ndarray:
    """float [0,1] (h, w[, c]) -> uint8 (h, w, 3)."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[..., None]
    if image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    if image.shape[-1] == 4:
        image = image[..., :3]
    return (np.clip(image, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_image(image: np.ndarray, path: Union[Path, str]) -> None:
    assert _HAS_PIL, "Pillow is required for image IO"
    path = Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    Image.fromarray(prep_image(image)).save(path)


def load_image(path: Union[Path, str]) -> np.ndarray:
    """PNG/JPEG -> float32 (h, w, 3) in [0, 1]."""
    assert _HAS_PIL, "Pillow is required for image IO"
    with Image.open(path) as img:
        arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def save_video(frames: Iterable[np.ndarray], path: Union[Path, str], fps: int = 30) -> bool:
    """Write frames (NHWC [0,1]) to mp4 via ffmpeg; returns False if ffmpeg
    is unavailable (frames are then dumped as PNGs next to `path`)."""
    path = Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    frames = list(frames)
    if shutil.which("ffmpeg") is None:
        stem_dir = path.with_suffix("")
        stem_dir.mkdir(exist_ok=True, parents=True)
        for i, f in enumerate(frames):
            save_image(f, stem_dir / f"{i:0>6}.png")
        return False
    with tempfile.TemporaryDirectory() as tmp:
        for i, f in enumerate(frames):
            save_image(f, Path(tmp) / f"{i:0>6}.png")
        cmd = [
            "ffmpeg", "-y", "-framerate", str(fps),
            "-pattern_type", "glob", "-i", os.path.join(tmp, "*.png"),
            "-c:v", "libx264", "-pix_fmt", "yuv420p",
            "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
            str(path),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return True
