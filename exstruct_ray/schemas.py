"""Draft 2020-12 JSON Schemas for the serialized payload models.

Parity artifact with the reference's ``schemas/`` directory
(/root/reference/schemas/*.json, one file per public model, regenerated
by a scripts/gen_json_schema.py). The reference publishes pydantic
``model_json_schema()`` output for its models; this engine has no
pydantic in the hot path (plain dataclasses, models.py), so these
schemas describe the CANONICAL PAYLOADS it emits — ``to_payload()``
then ``dict_without_empty_values``: ``None``/empty values are dropped
(hence optional fields are simply non-required, never nullable) and
backend metadata (provenance / approximation_level / confidence) is
stripped by default per ADR-0003 but allowed when
``include_backend_metadata=True``.

``model_schemas()`` returns every schema keyed by its file stem; each
schema is fully self-contained (the only ``$ref`` is the recursive
SmartArt node, resolved against the containing file's ``$defs``).
"""

from __future__ import annotations

DRAFT = "https://json-schema.org/draft/2020-12/schema"

_CELL_VALUE = {
    "anyOf": [
        {"type": "integer"},
        {"type": "number"},
        {"type": "string"},
    ]
}

_NODE_REF = "#/$defs/smartart_node"


def _backend_props() -> dict:
    return {
        "provenance": {
            "type": "string",
            "description": "Producing backend id (present only when "
            "serialized with include_backend_metadata=True).",
        },
        "approximation_level": {
            "enum": ["direct", "heuristic", "partial"],
            "description": "How directly the backend determined this "
            "item (backend metadata, stripped by default).",
        },
        "confidence": {
            "type": "number",
            "description": "Backend confidence in [0, 1] (backend "
            "metadata, stripped by default).",
        },
    }


def _cell_row() -> dict:
    return {
        "type": "object",
        "description": "One sparse cell row: 1-based row index, 0-based "
        "string column keys.",
        "properties": {
            "r": {"type": "integer", "description": "1-based row index."},
            "c": {
                "type": "object",
                "additionalProperties": _CELL_VALUE,
                "description": "Column index (string) to cell value.",
            },
            "links": {
                "type": "object",
                "additionalProperties": {"type": "string"},
                "description": "Column index (string) to hyperlink "
                "target (dropped when the row has none).",
            },
        },
        "required": ["r"],  # "c" strips when empty (dict_without_empty_values)
        "additionalProperties": False,
    }


def _geometry_props() -> dict:
    return {
        "id": {"type": "integer", "description": "Sheet-scoped shape id."},
        "text": {"type": "string"},
        "l": {"type": "integer", "description": "Left EMU/px offset."},
        "t": {"type": "integer", "description": "Top EMU/px offset."},
        "w": {"type": "integer", "description": "Width (dropped in "
              "size-free serializations)."},
        "h": {"type": "integer", "description": "Height (dropped in "
              "size-free serializations)."},
        "rotation": {"type": "number", "description": "Degrees."},
        **_backend_props(),
    }


def _shape() -> dict:
    return {
        "type": "object",
        "description": "A drawing shape with text and geometry.",
        "properties": {
            **_geometry_props(),
            "kind": {"const": "shape"},
            "type": {
                "type": "string",
                "description": "Preset geometry name (e.g. rect).",
            },
        },
        "required": ["l", "t", "kind"],  # text strips when empty
        "additionalProperties": False,
    }


def _arrow() -> dict:
    return {
        "type": "object",
        "description": "Connector shape metadata.",
        "properties": {
            **_geometry_props(),
            "kind": {"const": "arrow"},
            "begin_arrow_style": {
                "type": "integer",
                "description": "Arrow style enum at the connector start.",
            },
            "end_arrow_style": {
                "type": "integer",
                "description": "Arrow style enum at the connector end.",
            },
            "begin_id": {
                "type": "integer",
                "description": "Shape id the connector starts at.",
            },
            "end_id": {
                "type": "integer",
                "description": "Shape id the connector ends at.",
            },
            "direction": {
                "type": "string",
                "description": "Resolved begin→end direction label.",
            },
        },
        "required": ["l", "t", "kind"],  # text strips when empty
        "additionalProperties": False,
    }


def _smartart_node(ref: str) -> dict:
    return {
        "type": "object",
        "description": "One SmartArt tree node; leaves drop the empty "
        "kids list.",
        "properties": {
            "text": {"type": "string"},
            "kids": {"type": "array", "items": {"$ref": ref}},
        },
        "required": ["text"],
        "additionalProperties": False,
    }


def _smartart() -> dict:
    return {
        "type": "object",
        "description": "SmartArt diagram: geometry + layout id + node "
        "tree (empty container text drops).",
        "properties": {
            **_geometry_props(),
            "kind": {"const": "smartart"},
            "layout": {
                "type": "string",
                "description": "Diagram layout id (lo attribute).",
            },
            "nodes": {"type": "array", "items": {"$ref": _NODE_REF}},
        },
        "required": ["l", "t", "kind"],  # layout strips when empty
        "additionalProperties": False,
    }


def _chart_series() -> dict:
    return {
        "type": "object",
        "description": "One chart series parsed from a SERIES formula "
        "or c:ser element.",
        "properties": {
            "name": {"type": "string"},
            "name_range": {"type": "string"},
            "x_range": {"type": "string"},
            "y_range": {"type": "string"},
        },
        "required": [],  # name strips when empty
        "additionalProperties": False,
    }


def _chart() -> dict:
    return {
        "type": "object",
        "description": "An embedded chart: type, axes, series, anchor "
        "geometry.",
        "properties": {
            "name": {"type": "string"},
            "chart_type": {"type": "string"},
            "title": {"type": "string"},
            "y_axis_title": {"type": "string"},
            "y_axis_range": {
                "type": "array",
                "items": {"type": "number"},
                "description": "[min, max] when explicit axis bounds "
                "exist (empty list drops).",
            },
            "w": {"type": "integer"},
            "h": {"type": "integer"},
            "series": {"type": "array", "items": _chart_series()},
            "l": {"type": "integer"},
            "t": {"type": "integer"},
            "error": {
                "type": "string",
                "description": "Degrade-in-place parse error note.",
            },
            **_backend_props(),
        },
        "required": ["l", "t"],  # string fields strip when empty
        "additionalProperties": False,
    }


def _print_area() -> dict:
    return {
        "type": "object",
        "description": "Inclusive print-area bounds: rows 1-based, "
        "columns 0-based.",
        "properties": {
            "r1": {"type": "integer"},
            "c1": {"type": "integer"},
            "r2": {"type": "integer"},
            "c2": {"type": "integer"},
        },
        "required": ["r1", "c1", "r2", "c2"],
        "additionalProperties": False,
    }


def _merged_cells() -> dict:
    return {
        "type": "object",
        "description": "Compressed merged-cell payload: fixed column "
        "schema + one [r1, c1, r2, c2, v] tuple per range.",
        "properties": {
            "schema": {"const": ["r1", "c1", "r2", "c2", "v"]},
            "items": {
                "type": "array",
                "items": {
                    "type": "array",
                    "prefixItems": [
                        {"type": "integer"},
                        {"type": "integer"},
                        {"type": "integer"},
                        {"type": "integer"},
                        {"type": "string"},
                    ],
                    "minItems": 5,
                    "maxItems": 5,
                },
            },
        },
        "required": ["schema"],  # "items" strips when no ranges exist
        "additionalProperties": False,
    }


def _coord_pair_map(desc: str) -> dict:
    return {
        "type": "object",
        "description": desc,
        "additionalProperties": {
            "type": "array",
            "items": {
                "type": "array",
                "prefixItems": [{"type": "integer"}, {"type": "integer"}],
                "minItems": 2,
                "maxItems": 2,
            },
        },
    }


def _shapes_array() -> dict:
    return {
        "type": "array",
        "items": {"anyOf": [_shape(), _arrow(), _smartart()]},
    }


def _sheet() -> dict:
    return {
        "type": "object",
        "description": "Per-sheet extraction payload; empty collections "
        "are dropped, so every key is optional.",
        "properties": {
            "rows": {"type": "array", "items": _cell_row()},
            "shapes": _shapes_array(),
            "charts": {"type": "array", "items": _chart()},
            "table_candidates": {
                "type": "array",
                "items": {"type": "string"},
                "description": "Detected table regions as A1 ranges.",
            },
            "print_areas": {"type": "array", "items": _print_area()},
            "auto_print_areas": {"type": "array", "items": _print_area()},
            "formulas_map": _coord_pair_map(
                "Formula string to [row, col] cell coordinates."
            ),
            "colors_map": _coord_pair_map(
                "Fill color (RGB hex) to [row, col] cell coordinates."
            ),
            "merged_cells": _merged_cells(),
            "merged_ranges": {
                "type": "array",
                "items": {"type": "string"},
                "description": "Merged ranges as A1 strings.",
            },
        },
        "additionalProperties": False,
    }


def _workbook() -> dict:
    return {
        "type": "object",
        "description": "Whole-workbook extraction payload: sheet name "
        "to sheet payload.",
        "properties": {
            "book_name": {"type": "string"},
            "sheets": {
                "type": "object",
                "additionalProperties": _sheet(),
            },
        },
        "required": ["book_name"],  # "sheets" strips when every sheet is empty
        "additionalProperties": False,
    }


def _print_area_view() -> dict:
    return {
        "type": "object",
        "description": "A workbook slice restricted to one print area.",
        "properties": {
            "book_name": {"type": "string"},
            "sheet_name": {"type": "string"},
            "area": _print_area(),
            "shapes": _shapes_array(),
            "charts": {"type": "array", "items": _chart()},
            "rows": {"type": "array", "items": _cell_row()},
            "table_candidates": {
                "type": "array",
                "items": {"type": "string"},
            },
        },
        "required": ["book_name", "sheet_name", "area"],
        "additionalProperties": False,
    }


def model_schemas() -> dict[str, dict]:
    """All published schemas keyed by file stem (12 files, mirroring the
    reference's schemas/ inventory)."""
    titles = {
        "cell_row": "CellRow",
        "shape": "Shape",
        "arrow": "Arrow",
        "smartart_node": "SmartArtNode",
        "smartart": "SmartArt",
        "chart_series": "ChartSeries",
        "chart": "Chart",
        "print_area": "PrintArea",
        "merged_cells": "MergedCells",
        "sheet": "SheetData",
        "workbook": "WorkbookData",
        "print_area_view": "PrintAreaView",
    }
    bodies = {
        "cell_row": _cell_row(),
        "shape": _shape(),
        # standalone node file recurses on its own root
        "smartart_node": _smartart_node("#"),
        "arrow": _arrow(),
        "smartart": _smartart(),
        "chart_series": _chart_series(),
        "chart": _chart(),
        "print_area": _print_area(),
        "merged_cells": _merged_cells(),
        "sheet": _sheet(),
        "workbook": _workbook(),
        "print_area_view": _print_area_view(),
    }
    # files embedding SmartArt need the recursive node under their $defs
    needs_node_defs = {"smartart", "sheet", "workbook", "print_area_view"}
    out: dict[str, dict] = {}
    for name, body in bodies.items():
        schema = {"$schema": DRAFT, "title": titles[name], **body}
        if name in needs_node_defs:
            schema["$defs"] = {"smartart_node": _smartart_node(_NODE_REF)}
        out[name] = schema
    return out
