"""Formula string normalization.

Semantics parity: /root/reference/src/exstruct/core/cells.py:341-361
(`_normalize_formula_value`): inject leading "=", empty -> None.
"""

from __future__ import annotations


def normalize_formula_value(value: object) -> str | None:
    if value is None:
        return None
    array_text = getattr(value, "text", None)
    text = str(array_text) if array_text is not None else str(value)
    if text == "":
        return None
    if not text.startswith("="):
        return f"={text}"
    return text
