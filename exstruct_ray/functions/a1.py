"""A1 / range address conversions (no openpyxl dependency).

Semantics parity: /root/reference/src/exstruct/core/ranges.py:25-48 and
models/__init__.py:569-600. Rows are 1-based, columns 0-based in the public
coordinate convention; A1 strings use 1-based letters.
"""

from __future__ import annotations

from dataclasses import dataclass
import re

_CELL_RE = re.compile(r"^\$?([A-Za-z]{1,3})\$?(\d+)$")


def col_index_to_alpha(index: int) -> str:
    """0 -> A, 25 -> Z, 26 -> AA."""
    if index < 0:
        raise ValueError(f"Column index must be non-negative, got {index}")
    out: list[str] = []
    num = index
    while True:
        num, rem = divmod(num, 26)
        out.append(chr(65 + rem))
        if num == 0:
            break
        num -= 1
    out.reverse()
    return "".join(out)


def alpha_to_col_index(alpha: str) -> int:
    """A -> 0, Z -> 25, AA -> 26."""
    n = 0
    for ch in alpha.upper():
        if not "A" <= ch <= "Z":
            raise ValueError(f"Invalid column letters: {alpha!r}")
        n = n * 26 + (ord(ch) - 64)
    return n - 1


@dataclass(frozen=True)
class RangeBounds:
    """Zero-based inclusive bounds (r1, c1, r2, c2)."""

    r1: int
    c1: int
    r2: int
    c2: int


def _parse_cell(cell: str) -> tuple[int, int] | None:
    m = _CELL_RE.match(cell)
    if not m:
        return None
    col = alpha_to_col_index(m.group(1))
    row = int(m.group(2)) - 1
    return row, col


def parse_range_zero_based(range_str: str) -> RangeBounds | None:
    """Parse "Sheet1!A1:B2" / "A1:B2" / "A1" into zero-based bounds."""
    cleaned = range_str.strip()
    if not cleaned:
        return None
    if "!" in cleaned:
        cleaned = cleaned.split("!", 1)[1]
    cleaned = cleaned.replace("'", "")
    parts = cleaned.split(":")
    if len(parts) == 1:
        start = _parse_cell(parts[0])
        if start is None:
            return None
        return RangeBounds(r1=start[0], c1=start[1], r2=start[0], c2=start[1])
    if len(parts) != 2:
        return None
    start = _parse_cell(parts[0])
    end = _parse_cell(parts[1])
    if start is None or end is None:
        return None
    r1, c1 = start
    r2, c2 = end
    return RangeBounds(r1=min(r1, r2), c1=min(c1, c2), r2=max(r1, r2), c2=max(c1, c2))
