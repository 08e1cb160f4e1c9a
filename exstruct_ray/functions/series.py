"""=SERIES(...) chart formula tokenizer.

Semantics parity: /root/reference/src/exstruct/core/charts.py:16-170
(`parse_series_formula`): quote/paren/brace-aware splitting, `,` vs `;`
argument separators (locale), Excel `""` escape, quoted first argument is a
literal name, otherwise a name range. Pure function — usable inside any
map_batches stage for workbooks whose charts carry SERIES formulas.
"""

from __future__ import annotations


def _scan_args(text: str, seps: tuple[str, ...]) -> list[str]:
    """Split at top-level separators, respecting strings, parens, braces."""
    args: list[str] = []
    buf: list[str] = []
    paren = brace = 0
    in_str = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if in_str:
            if ch == '"':
                if i + 1 < n and text[i + 1] == '"':
                    buf.append('""')
                    i += 2
                    continue
                in_str = False
            buf.append(ch)
            i += 1
            continue
        if ch == '"':
            in_str = True
            buf.append(ch)
        elif ch == "(":
            paren += 1
            buf.append(ch)
        elif ch == ")":
            paren = max(0, paren - 1)
            buf.append(ch)
        elif ch == "{":
            brace += 1
            buf.append(ch)
        elif ch == "}":
            brace = max(0, brace - 1)
            buf.append(ch)
        elif ch in seps and paren == 0 and brace == 0:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    if buf or (args and text.endswith(seps)):
        args.append("".join(buf).strip())
    return args


def _outer_args_text(formula: str) -> str | None:
    """Text between SERIES( and its matching close paren; None if unmatched."""
    if not formula:
        return None
    s = formula.strip()
    upper = s.upper()
    if not upper.startswith("=SERIES"):
        return None
    open_idx = s.find("(", upper.index("=SERIES"))
    if open_idx < 0:
        return None
    depth = 0
    in_str = False
    i = open_idx + 1
    n = len(s)
    while i < n:
        ch = s[i]
        if in_str:
            if ch == '"':
                if i + 1 < n and s[i + 1] == '"':
                    i += 2
                    continue
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                return s[open_idx + 1 : i].strip()
            depth -= 1
        i += 1
    return None


def unquote_excel_string(s: str | None) -> str | None:
    """Decode an Excel-quoted string literal; None when not quoted."""
    if s is None:
        return None
    st = s.strip()
    if len(st) >= 2 and st[0] == '"' and st[-1] == '"':
        return st[1:-1].replace('""', '"')
    return None


def parse_series_formula(formula: str) -> dict[str, str | None] | None:
    """Parse =SERIES(name, x, y, order, bubble) into reference fields."""
    args_text = _outer_args_text(formula)
    if args_text is None:
        return None
    # Semicolon locale: only when ';' appears and no ',' occurs before the
    # first string literal (reference charts.py:70).
    use_semicolon = ";" in args_text and "," not in args_text.split('"')[0]
    parts = _scan_args(args_text, (";",) if use_semicolon else (",",))

    def arg(idx: int) -> str | None:
        if idx < len(parts) and parts[idx].strip() != "":
            return parts[idx].strip()
        return None

    name_part = arg(0)
    name_literal = unquote_excel_string(name_part)
    return {
        "name_range": None if name_literal is not None else name_part,
        "x_range": arg(1),
        "y_range": arg(2),
        "plot_order": arg(3),
        "bubble_size_range": arg(4),
        "name_literal": name_literal,
    }
