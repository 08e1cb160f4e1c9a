"""Pure scalar functions shared by parsers and stages."""

from .coerce import coerce_numeric_preserve_format
from .a1 import (
    alpha_to_col_index,
    col_index_to_alpha,
    parse_range_zero_based,
)
from .geometry import (
    EMU_PER_POINT,
    angle_to_compass,
    column_width_to_points,
    compute_line_angle_deg,
    distance_to_box,
    emu_to_points,
    rects_overlap,
)
from .colors import normalize_color_key, normalize_ignore_colors, normalize_rgb
from .formulas import normalize_formula_value
from .canonical import canonical_json, dict_without_empty_values

__all__ = [
    "EMU_PER_POINT",
    "alpha_to_col_index",
    "angle_to_compass",
    "canonical_json",
    "coerce_numeric_preserve_format",
    "col_index_to_alpha",
    "column_width_to_points",
    "compute_line_angle_deg",
    "dict_without_empty_values",
    "distance_to_box",
    "emu_to_points",
    "normalize_color_key",
    "normalize_formula_value",
    "normalize_ignore_colors",
    "normalize_rgb",
    "parse_range_zero_based",
    "rects_overlap",
]
