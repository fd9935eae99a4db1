"""Text labels on images.

Parity with reference src/visualization/annotation.py:16-58 (draw_label /
add_label), using PIL's bundled DejaVu font instead of the reference's
vendored TTF.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .layout import vcat


def _get_font(font_size: int):
    from PIL import ImageFont

    for name in ("DejaVuSans.ttf", "Arial.ttf"):
        try:
            return ImageFont.truetype(name, font_size)
        except OSError:
            continue
    return ImageFont.load_default()


def draw_label(
    text: str,
    font_size: int = 19,
    color: tuple[float, float, float] = (0.0, 0.0, 0.0),
    background: float = 1.0,
) -> np.ndarray:
    """Render text -> float (h, w, 3) image."""
    from PIL import Image, ImageDraw

    font = _get_font(font_size)
    probe = Image.new("RGB", (1, 1))
    bbox = ImageDraw.Draw(probe).textbbox((0, 0), text, font=font)
    w = max(bbox[2] - bbox[0], 1)
    h = max(bbox[3] - bbox[1], 1)
    bg = int(np.clip(background, 0, 1) * 255)
    img = Image.new("RGB", (w + 2, h + 2), (bg, bg, bg))
    rgb = tuple(int(np.clip(c, 0, 1) * 255) for c in color)
    ImageDraw.Draw(img).text((-bbox[0] + 1, -bbox[1] + 1), text, font=font, fill=rgb)
    return np.asarray(img, dtype=np.float32) / 255.0


def add_label(
    image: np.ndarray,
    label: str,
    font_size: int = 24,
    align: str = "left",
) -> np.ndarray:
    return vcat(draw_label(label, font_size=font_size), image, align=align, gap=4)
