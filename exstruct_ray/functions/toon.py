"""TOON (Token-Oriented Object Notation) encoder.

Reimplements the serialization format the reference exposes through the
public ``python-toon`` package (/root/reference/src/exstruct/io/serialize.py:84-86
``toon.encode``), following the public TOON v1 spec
(github.com/toon-format/spec): indentation-based structure, inline
primitive arrays with explicit lengths (``key[N]: a,b,c``), tabular arrays
of uniform objects (``key[N]{f1,f2}:`` + CSV-style rows), and hyphen list
items for mixed arrays. Encode-only — the engine never parses TOON.
"""

from __future__ import annotations

import json
import re

# Keys that can appear bare (no quotes): identifier-like token.
_SAFE_KEY_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*$")

# A bare string must not be confusable with other scalar tokens.
_NUMERIC_LIKE_RE = re.compile(r"^-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?$")


def encode(value: object, *, indent: int = 2) -> str:
    """Encode a JSON-compatible value as a TOON document string.

    The indent string threads through the helpers as a parameter — no
    module-level state, so concurrent or re-entrant encodes with different
    indents (threaded actors, nested calls) cannot interleave."""
    ind = " " * indent
    lines: list[str] = []
    if isinstance(value, dict):
        if not value:
            return ""
        _encode_object(value, 0, lines, ind)
    elif isinstance(value, (list, tuple)):
        _encode_array_value(None, list(value), 0, lines, ind)
    else:
        return _scalar(value)
    return "\n".join(lines)


def _key_token(key: object) -> str:
    key_str = str(key)
    if _SAFE_KEY_RE.match(key_str):
        return key_str
    return json.dumps(key_str, ensure_ascii=False)


def _scalar(value: object, *, delimiter: str = ",") -> str:
    """Render a primitive. Strings stay bare only when unambiguous."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, (int, float)):
        return json.dumps(value)
    text = str(value)
    if (
        text == ""
        or text != text.strip()
        or delimiter in text
        or ":" in text
        or '"' in text
        or "\\" in text
        or "\n" in text
        or "\r" in text
        or "\t" in text
        or text.startswith(("-", "[", "{", "#"))
        or text in ("true", "false", "null")
        or _NUMERIC_LIKE_RE.match(text)
    ):
        return json.dumps(text, ensure_ascii=False)
    return text


def _is_primitive(value: object) -> bool:
    return value is None or isinstance(value, (str, int, float, bool))


def _tabular_fields(items: list) -> list | None:
    """Field list when every item is an object with the same primitive-only
    fields (the tabular-array condition); None otherwise."""
    if not items:
        return None
    first = items[0]
    if not isinstance(first, dict) or not first:
        return None
    fields = list(first.keys())
    for item in items:
        if not isinstance(item, dict) or list(item.keys()) != fields:
            return None
        if not all(_is_primitive(v) for v in item.values()):
            return None
    return fields


def _encode_object(obj: dict, depth: int, lines: list[str], ind: str) -> None:
    pad = ind * depth
    for key, value in obj.items():
        token = _key_token(key)
        if isinstance(value, dict):
            lines.append(f"{pad}{token}:")
            _encode_object(value, depth + 1, lines, ind)
        elif isinstance(value, (list, tuple)):
            _encode_array_value(token, list(value), depth, lines, ind)
        else:
            lines.append(f"{pad}{token}: {_scalar(value)}")


def _encode_array_value(
    key_token: str | None, items: list, depth: int, lines: list[str], ind: str
) -> None:
    pad = ind * depth
    prefix = f"{key_token}" if key_token is not None else ""
    n = len(items)
    if n == 0:
        lines.append(f"{pad}{prefix}[0]:")
        return
    if all(_is_primitive(v) for v in items):
        joined = ",".join(_scalar(v) for v in items)
        lines.append(f"{pad}{prefix}[{n}]: {joined}")
        return
    fields = _tabular_fields(items)
    if fields is not None:
        header = ",".join(_key_token(f) for f in fields)
        lines.append(f"{pad}{prefix}[{n}]{{{header}}}:")
        row_pad = ind * (depth + 1)
        for item in items:
            lines.append(
                row_pad + ",".join(_scalar(item[f]) for f in fields)
            )
        return
    lines.append(f"{pad}{prefix}[{n}]:")
    _encode_list_items(items, depth + 1, lines, ind)


def _encode_list_items(items: list, depth: int, lines: list[str], ind: str) -> None:
    pad = ind * depth
    for item in items:
        if _is_primitive(item):
            lines.append(f"{pad}- {_scalar(item)}")
        elif isinstance(item, dict):
            if not item:
                lines.append(f"{pad}-")
                continue
            # First field rides the hyphen line; the rest align under it.
            first_key, *rest_keys = item.keys()
            sub: list[str] = []
            _encode_object({first_key: item[first_key]}, 0, sub, ind)
            lines.append(f"{pad}- {sub[0]}")
            for extra in sub[1:]:
                lines.append(f"{pad}  {extra}")
            if rest_keys:
                _encode_object(
                    {k: item[k] for k in rest_keys}, depth + 1, lines, ind
                )
        elif isinstance(item, (list, tuple)):
            sub = []
            _encode_array_value(None, list(item), 0, sub, ind)
            lines.append(f"{pad}- {sub[0]}")
            for extra in sub[1:]:
                lines.append(f"{pad}  {extra}")
        else:
            lines.append(f"{pad}- {_scalar(item)}")
