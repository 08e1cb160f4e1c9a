"""Shape/connector model building with endpoint and direction resolution.

Semantics parity:
/root/reference/src/exstruct/core/backends/libreoffice_backend.py:261-343
(`_build_shapes_from_ooxml` light path: sequential per-sheet shape ids,
drawing_id→shape_id map, bounding boxes), :526-705 (`_resolve_connector`,
`_resolve_direction`, nearest-box heuristic, delta rotation), :859-877
(resolution classification: direct 1.0 / heuristic 0.6).
"""

from __future__ import annotations

import math

from ..functions.geometry import (
    angle_to_compass,
    compute_line_angle_deg,
    distance_to_box,
)
from ..models import Arrow, Shape, SmartArt
from ..ooxml.drawing import ConnectorInfo, ShapeInfo, SmartArtInfo

_Box = tuple[float, float, float, float]  # left, top, right, bottom


def build_shapes_from_drawing(
    shapes: list[ShapeInfo],
    connectors: list[ConnectorInfo],
    provenance: str = "python_ooxml",
    smartarts: list[SmartArtInfo] | None = None,
) -> list[Shape | Arrow | SmartArt]:
    emitted: list[Shape | Arrow | SmartArt] = []
    drawing_to_shape_id: dict[int, int] = {}
    shape_boxes: dict[int, _Box] = {}
    next_shape_id = 0
    for info in shapes:
        next_shape_id += 1
        shape_id = next_shape_id
        drawing_to_shape_id[info.drawing_id] = shape_id
        if (
            info.left is not None
            and info.top is not None
            and info.width is not None
            and info.height is not None
        ):
            shape_boxes[shape_id] = (
                float(info.left),
                float(info.top),
                float(info.left + info.width),
                float(info.top + info.height),
            )
        emitted.append(
            Shape(
                id=shape_id,
                text=info.text,
                l=info.left or 0,
                t=info.top or 0,
                w=info.width,
                h=info.height,
                rotation=info.rotation,
                type=info.shape_type,
                provenance=provenance,
                approximation_level="partial",
                confidence=0.75,
            )
        )
    for conn in connectors:
        begin_id, end_id, approximation_level, confidence = _resolve_connector(
            conn, drawing_to_shape_id, shape_boxes
        )
        emitted.append(
            Arrow(
                id=None,
                text=conn.text,
                l=conn.left or 0,
                t=conn.top or 0,
                w=conn.width,
                h=conn.height,
                rotation=conn.rotation,
                begin_arrow_style=conn.begin_arrow_style,
                end_arrow_style=conn.end_arrow_style,
                begin_id=begin_id,
                end_id=end_id,
                direction=_resolve_direction(conn, begin_id, end_id, shape_boxes),
                provenance=provenance,
                approximation_level=approximation_level,
                confidence=confidence,
            )
        )
    # SmartArt continues the per-sheet shape id sequence (the reference's
    # COM walker numbers every shape-like object in one sequence; light
    # emits shapes, then connectors, then SmartArt — same convention as
    # the shapes-then-connectors ordering above).
    for sa in smartarts or []:
        next_shape_id += 1
        emitted.append(
            SmartArt(
                id=next_shape_id,
                text="",
                l=sa.anchor_left or 0,
                t=sa.anchor_top or 0,
                w=sa.anchor_width,
                h=sa.anchor_height,
                layout=sa.layout,
                nodes=sa.nodes,
                provenance=provenance,
                approximation_level="partial",
                confidence=0.75,
            )
        )
    return emitted


def _resolve_connector(
    conn: ConnectorInfo,
    drawing_to_shape_id: dict[int, int],
    shape_boxes: dict[int, _Box],
) -> tuple[int | None, int | None, str, float]:
    begin_id = (
        drawing_to_shape_id.get(conn.start_drawing_id)
        if conn.start_drawing_id is not None
        else None
    )
    end_id = (
        drawing_to_shape_id.get(conn.end_drawing_id)
        if conn.end_drawing_id is not None
        else None
    )
    used_direct = begin_id is not None or end_id is not None
    if begin_id is not None and end_id is not None:
        return begin_id, end_id, "direct", 1.0

    start_point, end_point = _connector_endpoints(conn)
    if begin_id is None:
        begin_id = _nearest_shape_id(start_point, shape_boxes)
    if end_id is None:
        end_id = _nearest_shape_id(end_point, shape_boxes)
    # Heuristic resolution always classifies heuristic/0.6 in the light path,
    # even when one endpoint came from a direct ref (reference
    # `_classify_connector_resolution` with used_heuristic=True).
    del used_direct
    return begin_id, end_id, "heuristic", 0.6


def _connector_endpoints(
    conn: ConnectorInfo,
) -> tuple[tuple[float, float] | None, tuple[float, float] | None]:
    left, top, dx, dy = conn.left, conn.top, conn.direction_dx, conn.direction_dy
    if (
        left is not None
        and top is not None
        and dx is not None
        and dy is not None
        and (dx != 0 or dy != 0)
    ):
        rdx, rdy = _rotate_connector_delta(float(dx), float(dy), conn.rotation)
        return (float(left), float(top)), (float(left) + rdx, float(top) + rdy)
    return (None, None)


def _nearest_shape_id(
    point: tuple[float, float] | None, shape_boxes: dict[int, _Box]
) -> int | None:
    if point is None or not shape_boxes:
        return None
    x, y = point
    best_id: int | None = None
    best_dist: float | None = None
    for shape_id, box in shape_boxes.items():
        dist = distance_to_box(x, y, *box)
        if best_dist is None or dist < best_dist:
            best_dist = dist
            best_id = shape_id
    return best_id


def _rotate_connector_delta(
    dx: float, dy: float, rotation_deg: float | None
) -> tuple[float, float]:
    if rotation_deg is None:
        return (dx, dy)
    if math.isclose(rotation_deg % 360.0, 0.0, abs_tol=1e-9):
        return (dx, dy)
    length = math.hypot(dx, dy)
    if length == 0.0:
        return (dx, dy)
    angle_rad = math.radians(compute_line_angle_deg(dx, dy) + rotation_deg)
    return (length * math.cos(angle_rad), length * math.sin(angle_rad))


def _resolve_direction(
    conn: ConnectorInfo,
    begin_id: int | None,
    end_id: int | None,
    shape_boxes: dict[int, _Box],
) -> str | None:
    dx, dy = conn.direction_dx, conn.direction_dy
    if dx is None or dy is None or (dx == 0 and dy == 0):
        return _direction_from_shape_boxes(begin_id, end_id, shape_boxes)
    rdx, rdy = _rotate_connector_delta(float(dx), float(dy), conn.rotation)
    return angle_to_compass(compute_line_angle_deg(rdx, rdy))


def _direction_from_shape_boxes(
    begin_id: int | None, end_id: int | None, shape_boxes: dict[int, _Box]
) -> str | None:
    if begin_id is None or end_id is None:
        return None
    begin_box = shape_boxes.get(begin_id)
    end_box = shape_boxes.get(end_id)
    if begin_box is None or end_box is None:
        return None
    bx = (begin_box[0] + begin_box[2]) / 2.0
    by = (begin_box[1] + begin_box[3]) / 2.0
    ex = (end_box[0] + end_box[2]) / 2.0
    ey = (end_box[1] + end_box[3]) / 2.0
    dx, dy = ex - bx, ey - by
    if dx == 0 and dy == 0:
        return None
    return angle_to_compass(compute_line_angle_deg(dx, dy))
