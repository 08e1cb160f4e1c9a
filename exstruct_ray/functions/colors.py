"""Color key normalization.

Semantics parity: /root/reference/src/exstruct/core/cells.py:593-687
(`_normalize_color_key`, `_normalize_rgb`, ignore-set normalization).
"""

from __future__ import annotations

DEFAULT_BACKGROUND_HEX = "FFFFFF"


def normalize_rgb(rgb: str) -> str:
    """Normalize an RGB/ARGB string into uppercase 6-hex when possible."""
    cleaned = rgb.strip().upper()
    if cleaned.startswith("0X"):
        cleaned = cleaned[2:]
    if len(cleaned) == 8:
        cleaned = cleaned[2:]
    return cleaned


def normalize_color_key(color_key: str) -> str:
    """Canonicalize hex / theme:n[:tint] / indexed:n / auto color keys."""
    trimmed = color_key.strip()
    if not trimmed:
        return ""
    lowered = trimmed.lower()
    if lowered.startswith(("theme:", "indexed:", "auto:")) or lowered == "auto":
        return lowered
    hex_key = trimmed.lstrip("#").upper()
    if len(hex_key) == 8:
        hex_key = hex_key[2:]
    return hex_key


def normalize_ignore_colors(ignore_colors: set[str] | frozenset[str] | None) -> set[str]:
    if not ignore_colors:
        return set()
    normalized = {normalize_color_key(c) for c in ignore_colors}
    return {c for c in normalized if c}
