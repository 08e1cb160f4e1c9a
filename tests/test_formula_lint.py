"""Formula health-check (preflight lint) tests.

Mirrors the reference's validation cases
(/root/reference/src/exstruct/edit/internal.py:3558-3603 token map,
:1759-1783 preflight gate semantics) over this repo's EditWorkbook model.
"""

from exstruct_ray.edit import (
    apply_patch,
    collect_formula_issues,
    lint_formula_text,
    make_workbook,
)


def _codes(findings):
    return [c for _, c, _ in findings]


class TestLintFormulaText:
    def test_error_tokens(self):
        assert _codes(lint_formula_text("=A1+#REF!")) == ["ref_error"]
        assert _codes(lint_formula_text("=BOGUS()+#NAME?")) == ["name_error"]
        assert _codes(lint_formula_text("=1/#DIV/0!")) == ["div0_error"]
        assert _codes(lint_formula_text('=#VALUE!&"x"')) == ["value_error"]
        levels = {c: lvl for lvl, c, _ in lint_formula_text("=#REF!+#N/A")}
        assert levels == {"ref_error": "error", "na_error": "warning"}

    def test_duplicated_equals_is_invalid_token_warning(self):
        findings = lint_formula_text("==SUM(A1:A3)")
        assert findings[0][:2] == ("warning", "invalid_token")

    def test_case_insensitive_and_clean_formula(self):
        assert lint_formula_text("=SUM(A1:B2)") == []
        assert _codes(lint_formula_text("=a1+#ref!")) == ["ref_error"]

    def test_self_reference_suspected(self):
        findings = lint_formula_text("=B2*2", own_ref="B2")
        assert _codes(findings) == ["circular_ref_suspected"]
        assert lint_formula_text("=B2*2", own_ref="B3") == []
        # range endpoint covering own cell counts
        assert _codes(lint_formula_text("=SUM(A1:C3)", own_ref="C3")) == [
            "circular_ref_suspected"
        ]
        # quoted sheet names / string literals / other-sheet refs don't
        assert lint_formula_text("='B2 Notes'!A1", own_ref="B2") == []
        assert lint_formula_text('="B2"&A1', own_ref="B2") == []
        assert lint_formula_text("=Other!B2", own_ref="B2") == []


class TestPreflightGate:
    def test_make_with_error_issue_aborts_without_output(self, tmp_path):
        out = str(tmp_path / "bad.xlsx")
        result = make_workbook(
            [
                {"op": "set_formula", "sheet": "Sheet1", "cell": "A1",
                 "formula": "=#REF!+1"},
            ],
            out_path=out,
            preflight_formula_check=True,
        )
        assert result.error is not None
        assert "Formula health check failed" in result.error.message
        assert result.error.cell == "A1"
        assert result.error.op_index == 0
        assert result.parts is None and result.out_path is None
        assert [i.code for i in result.formula_issues] == ["ref_error"]

    def test_warning_issues_do_not_gate(self):
        result = make_workbook(
            [
                {"op": "set_formula", "sheet": "Sheet1", "cell": "A1",
                 "formula": "=IFERROR(B1,#N/A)"},
            ],
            preflight_formula_check=True,
        )
        assert result.error is None
        assert result.parts is not None
        assert [i.code for i in result.formula_issues] == ["na_error"]
        assert result.formula_issues[0].level == "warning"

    def test_dry_run_reports_issues_without_gating(self):
        result = make_workbook(
            [
                {"op": "set_formula", "sheet": "Sheet1", "cell": "A1",
                 "formula": "=#NAME?"},
            ],
            dry_run=True,
            preflight_formula_check=True,
        )
        assert result.error is None  # dry_run: report, don't gate
        assert [i.code for i in result.formula_issues] == ["name_error"]
        assert len(result.patch_diff) == 1

    def test_patch_preflight_scans_preexisting_formulas(self):
        base = make_workbook(
            [{"op": "set_formula", "sheet": "Sheet1", "cell": "C1",
              "formula": "=#REF!"}]
        )
        assert base.error is None
        result = apply_patch(
            base.parts and _parts_spans(base.parts),
            [{"op": "set_value", "sheet": "Sheet1", "cell": "A1", "value": 1}],
            preflight_formula_check=True,
        )
        # the issue cell is not targeted by any op -> origin falls back
        assert result.error is not None
        assert result.error.op_index == -1
        assert result.error.cell == "C1"

    def test_preflight_off_is_untouched(self):
        result = make_workbook(
            [{"op": "set_formula", "sheet": "Sheet1", "cell": "A1",
              "formula": "=#REF!"}],
        )
        assert result.error is None
        assert result.formula_issues == []
        assert result.parts is not None


class TestWorkbookScan:
    def test_collect_orders_issues_deterministically(self):
        from exstruct_ray.edit import EditWorkbook

        wb = EditWorkbook()
        s = wb.add_sheet("S")
        s.cell(2, 1).formula = "=#NAME?"
        s.cell(1, 2).formula = "=#REF!"
        issues = collect_formula_issues(wb)
        assert [(i.cell, i.code) for i in issues] == [
            ("B1", "ref_error"),
            ("A2", "name_error"),
        ]
        assert all(i.sheet == "S" for i in issues)


def _parts_spans(parts: dict) -> list[dict]:
    from exstruct_ray.edit import parts_to_spans

    return parts_to_spans(parts)
