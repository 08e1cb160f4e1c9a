"""Workbook patch/edit subsystem (reference edit/ re-derived, no COM).

Public surface: PatchOp, apply_patch, make_workbook, patch_corpus — the
reference's 21-op editing contract applied to the engine's own span-based
workbook model, plus the corpus-scale Ray stage the reference lacks.
"""

from .api import apply_patch, make_workbook, patch_corpus
from .apply import apply_ops
from .emit import emit_parts, emit_spans, emit_xlsx_bytes, parts_to_spans
from .lint import FormulaIssue, collect_formula_issues, lint_formula_text
from .load import load_workbook
from .model import (
    EditCell,
    EditSheet,
    EditStyle,
    EditWorkbook,
    PatchDiffItem,
    PatchOp,
    PatchResult,
    PatchValue,
)

__all__ = [
    "EditCell",
    "EditSheet",
    "EditStyle",
    "EditWorkbook",
    "FormulaIssue",
    "PatchDiffItem",
    "PatchOp",
    "PatchResult",
    "PatchValue",
    "apply_ops",
    "apply_patch",
    "collect_formula_issues",
    "lint_formula_text",
    "emit_parts",
    "emit_spans",
    "emit_xlsx_bytes",
    "load_workbook",
    "make_workbook",
    "parts_to_spans",
    "patch_corpus",
]
