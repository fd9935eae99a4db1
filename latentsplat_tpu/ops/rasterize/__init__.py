from .types import RenderOutput, ScreenGaussians
from .camera import project_gaussians_to_screen
from .dense import composite_dense
from .api import render, render_depth, DepthRenderingMode

__all__ = [
    "RenderOutput",
    "ScreenGaussians",
    "project_gaussians_to_screen",
    "composite_dense",
    "render",
    "render_depth",
    "DepthRenderingMode",
]
