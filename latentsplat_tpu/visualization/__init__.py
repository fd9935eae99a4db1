from .annotation import add_label
from .color_map import apply_color_map_to_image, apply_depth_color_map
from .colors import DISTINCT_COLORS, get_distinct_color
from .layout import add_border, hcat, overlay, resize, vcat

__all__ = [
    "add_label",
    "add_border",
    "hcat",
    "vcat",
    "overlay",
    "resize",
    "apply_color_map_to_image",
    "apply_depth_color_map",
    "DISTINCT_COLORS",
    "get_distinct_color",
]
