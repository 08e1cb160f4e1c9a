"""Formula health-check (preflight lint) over an EditWorkbook.

Reference parity: /root/reference/src/exstruct/edit/internal.py:3558-3603
(_collect_formula_issues_openpyxl) — scan every formula cell for error
tokens (#REF! → ref_error, #NAME? → name_error, #DIV/0! → div0_error,
#VALUE! → value_error, #N/A → na_error) and the duplicated-'=' token
(invalid_token); issue levels match the reference's token map, and the
issue-code vocabulary is the reference's FormulaIssueCode literal
(/root/reference/src/exstruct/edit/types.py:37-45). This repo additionally
emits circular_ref_suspected (a code the reference declares but its
openpyxl path never raises) when a formula's A1 references include the
formula's own cell — a cheap static check, warning level.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .model import EditWorkbook, col_index_to_label, parse_a1, parse_range

# token → (code, level); scanned on the uppercased formula text, matching
# the reference's normalized containment checks.
_TOKEN_MAP: list[tuple[str, str, str]] = [
    ("#REF!", "ref_error", "error"),
    ("#NAME?", "name_error", "error"),
    ("#DIV/0!", "div0_error", "error"),
    ("#VALUE!", "value_error", "error"),
    ("#N/A", "na_error", "warning"),
]

# Bare A1 cell references (not ranges' interior; both endpoints of a range
# still match individually, which is what the self-reference check wants).
_A1_REF_RE = re.compile(r"\$?([A-Z]{1,3})\$?([0-9]{1,7})")
_QUOTED_OR_STRING_RE = re.compile(r"'[^']*'|\"[^\"]*\"")


@dataclass
class FormulaIssue:
    """Formula health-check finding (reference internal.py:1557-1564)."""

    sheet: str
    cell: str
    level: str  # warning | error
    code: str  # FormulaIssueCode vocabulary
    message: str


def lint_formula_text(
    formula: str, own_ref: str | None = None
) -> list[tuple[str, str, str]]:
    """Lint one formula string → [(level, code, message)].

    The cell-free core of the health check, reused by validate_input (op
    payload lint, no workbook yet) and collect_formula_issues (post-apply
    scan with self-reference detection when own_ref is given).
    """
    findings: list[tuple[str, str, str]] = []
    normalized = formula.upper()
    if "==" in normalized:
        findings.append(
            ("warning", "invalid_token", "Formula contains duplicated '=' token.")
        )
    for token, code, level in _TOKEN_MAP:
        if token in normalized:
            findings.append(
                (level, code, f"Formula contains error token {token}.")
            )
    if own_ref is not None and _references_self(normalized, own_ref):
        findings.append(
            (
                "warning",
                "circular_ref_suspected",
                f"Formula references its own cell {own_ref}.",
            )
        )
    return findings


def collect_formula_issues(workbook: EditWorkbook) -> list[FormulaIssue]:
    """Scan every formula cell in the workbook for health issues.

    Cells are visited per sheet in (row, col) order so the issue list is
    deterministic; a cell can contribute several issues (one per matched
    token), matching the reference's scan.
    """
    issues: list[FormulaIssue] = []
    for sheet_name, sheet in workbook.sheets.items():
        for (r, c), cell in sorted(sheet.cells.items()):
            raw = cell.formula
            if raw is None or not raw.startswith("="):
                continue
            ref = f"{col_index_to_label(c)}{r}"
            issues.extend(
                FormulaIssue(
                    sheet=sheet_name, cell=ref, level=level, code=code,
                    message=message,
                )
                for level, code, message in lint_formula_text(raw, own_ref=ref)
            )
    return issues


def _references_self(normalized_formula: str, own_ref: str) -> bool:
    """True when the formula's bare A1 references include its own cell.

    Quoted sheet names and string literals are stripped first so 'Jan1'!A2
    or ="A1" cannot false-positive; references qualified to OTHER sheets
    (Name!A1) are excluded by dropping the token right after '!' only when
    it is preceded by an unquoted sheet name — handled conservatively by
    removing SheetName!Ref tokens wholesale.
    """
    stripped = _QUOTED_OR_STRING_RE.sub("", normalized_formula)
    # drop cross-sheet qualified refs: WORD!A1 (the quoted form is gone)
    stripped = re.sub(r"[A-Z_][A-Z0-9_.]*!\$?[A-Z]{1,3}\$?[0-9]{1,7}", "", stripped)
    for m in _A1_REF_RE.finditer(stripped):
        if f"{m.group(1)}{m.group(2)}" == own_ref:
            return True
    return False


def find_issue_origin(issue: FormulaIssue, ops) -> tuple[int, str]:
    """Most likely (op_index, op_name) for a preflight issue.

    Reference parity: internal.py:1805-1826 (_find_preflight_issue_origin /
    _op_targets_issue_cell) — first op on the issue's sheet whose cell or
    range covers the issue cell; (-1, "set_value") when none matches.
    """
    for index, op in enumerate(ops):
        if getattr(op, "sheet", None) != issue.sheet:
            continue
        if getattr(op, "cell", None) is not None:
            if op.cell == issue.cell:
                return index, op.op
            continue
        rng = getattr(op, "range", None)
        if rng is None:
            continue
        try:
            r1, c1, r2, c2 = parse_range(rng)
            r, c = parse_a1(issue.cell)
        except Exception:
            continue
        if r1 <= r <= r2 and c1 <= c <= c2:
            return index, op.op
    return -1, "set_value"
