"""Formula string normalization and shared-formula translation.

Semantics parity: /root/reference/src/exstruct/core/cells.py:341-361
(`_normalize_formula_value`): inject leading "=", empty -> None. Shared
formula followers are translated by the (row, col) delta from the master
cell, matching openpyxl's formula Translator (which the reference relies on
for its formulas_map).
"""

from __future__ import annotations

import re

_CELL_TOKEN_RE = re.compile(r"(\$?)([A-Za-z]{1,3})(\$?)([0-9]+)")
_MAX_COL = 16384
_MAX_ROW = 1048576


def _col_to_index(letters: str) -> int:
    n = 0
    for ch in letters.upper():
        n = n * 26 + (ord(ch) - 64)
    return n


def _index_to_col(n: int) -> str:
    out = []
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out.append(chr(65 + rem))
    return "".join(reversed(out))


def translate_formula(text: str, delta_rows: int, delta_cols: int) -> str:
    """Shift relative A1 references by (delta_rows, delta_cols).

    Conservative tokenizer: quoted strings are skipped, tokens directly
    followed by "(" are function names (e.g. LOG10(), not a cell), `$`
    pins the row/col as absolute.
    """
    if delta_rows == 0 and delta_cols == 0:
        return text
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == '"' or ch == "'":
            # Skip string literals ("...", "" escape) and quoted sheet
            # names ('A1 Data'!, '' escape) — cell-like tokens inside
            # either must not be shifted (openpyxl Translator parity).
            j = i + 1
            while j < n:
                if text[j] == ch:
                    if j + 1 < n and text[j + 1] == ch:
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            out.append(text[i:j])
            i = j
            continue
        m = _CELL_TOKEN_RE.match(text, i)
        if m:
            end = m.end()
            prev = text[i - 1] if i > 0 else ""
            next_ch = text[end] if end < n else ""
            is_function = next_ch == "("
            # A token is part of a larger identifier (defined name like
            # tbl1Col, or B2x) when flanked by identifier characters on
            # EITHER side; position 0 has no preceding character.
            is_identifier_part = bool(prev) and (prev.isalnum() or prev in "_.")
            if next_ch and (next_ch.isalnum() or next_ch in "_."):
                is_identifier_part = True
            col_idx = _col_to_index(m.group(2))
            row_idx = int(m.group(4))
            plausible = 1 <= col_idx <= _MAX_COL and 1 <= row_idx <= _MAX_ROW
            if not is_function and not is_identifier_part and plausible:
                col_abs = m.group(1) == "$"
                row_abs = m.group(3) == "$"
                new_col = col_idx if col_abs else col_idx + delta_cols
                new_row = row_idx if row_abs else row_idx + delta_rows
                if 1 <= new_col <= _MAX_COL and 1 <= new_row <= _MAX_ROW:
                    out.append(
                        f"{m.group(1)}{_index_to_col(new_col)}{m.group(3)}{new_row}"
                    )
                    i = end
                    continue
            out.append(text[i:end])
            i = end
            continue
        out.append(ch)
        i += 1
    return "".join(out)


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
