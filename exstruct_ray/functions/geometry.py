"""Geometry scalar functions (EMU/points, compass, rectangles).

Semantics parity: /root/reference/src/exstruct/core/ooxml_drawing.py:24,
855-860, 933-944 (EMU and column-width conversions) and core/shapes.py:16-46
(line angle and 8-point compass bucketing).
"""

from __future__ import annotations

import math

EMU_PER_POINT = 12700.0


def emu_to_points(raw: str | int | None) -> int | None:
    """Convert an EMU value to rounded points; None on missing/invalid."""
    if raw is None:
        return None
    try:
        return int(round(int(raw) / EMU_PER_POINT))
    except (ValueError, TypeError):
        return None


def column_width_to_points(width: float) -> float:
    """Approximate an OOXML column ``width`` attribute in points."""
    if width <= 0:
        return 0.0
    return (width * 7.0 + 5.0) * 72.0 / 96.0


def compute_line_angle_deg(w: float, h: float) -> float:
    """Clockwise angle in Excel coordinates; 0 = East, 90 = South."""
    return math.degrees(math.atan2(h, w)) % 360.0


_COMPASS = ["E", "NE", "N", "NW", "W", "SW", "S", "SE"]


def angle_to_compass(angle: float) -> str:
    """Bucket an angle into one of 8 compass directions."""
    return _COMPASS[int(((angle + 22.5) % 360) // 45)]


def distance_to_box(
    x: float, y: float, left: float, top: float, right: float, bottom: float
) -> float:
    """Euclidean distance from a point to an axis-aligned box (0 inside)."""
    dx = max(left - x, 0.0, x - right)
    dy = max(top - y, 0.0, y - bottom)
    return math.hypot(dx, dy)


def rects_overlap(
    a: tuple[float, float, float, float], b: tuple[float, float, float, float]
) -> bool:
    """Non-zero-area intersection of (l, t, r, b) rectangles."""
    return not (a[2] <= b[0] or a[0] >= b[2] or a[3] <= b[1] or a[1] >= b[3])
