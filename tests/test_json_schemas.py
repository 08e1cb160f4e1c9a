"""Published JSON Schemas (schemas/*.json) validate real payloads.

Parity artifact with the reference's schemas/ directory (VERDICT r4
item 7): 12 draft-2020-12 files, deterministic generator output, and
every golden extraction payload validates against the workbook schema.
"""

import json
from pathlib import Path

import pytest

jsonschema = pytest.importorskip("jsonschema")

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")

EXPECTED_FILES = {
    "arrow", "cell_row", "chart", "chart_series", "merged_cells",
    "print_area", "print_area_view", "shape", "sheet", "smartart",
    "smartart_node", "workbook",
}


def _validator(name: str):
    schema = json.loads((REPO / "schemas" / f"{name}.json").read_text())
    jsonschema.Draft202012Validator.check_schema(schema)
    return jsonschema.Draft202012Validator(schema)


class TestSchemaFiles:
    def test_inventory_matches_reference(self):
        ours = {p.stem for p in (REPO / "schemas").glob("*.json")}
        assert ours == EXPECTED_FILES
        ref = {p.stem for p in (REF / "schemas").glob("*.json")}
        assert ours == ref  # same public-model inventory

    def test_generator_is_deterministic(self, tmp_path):
        from exstruct_ray.schemas import model_schemas

        for name, schema in model_schemas().items():
            on_disk = json.loads(
                (REPO / "schemas" / f"{name}.json").read_text()
            )
            assert on_disk == schema, f"{name}.json stale — rerun generator"

    def test_all_schemas_are_valid_draft2020(self):
        for name in EXPECTED_FILES:
            _validator(name)


class TestPayloadValidation:
    @pytest.mark.parametrize(
        "xlsx,opts",
        [
            ("sample/basic/sample.xlsx", {}),
            ("sample/flowchart/sample-shape-connector.xlsx", {}),
            ("sample/smartart/sample_smartart.xlsx", {}),
            ("sample/gantt_chart/en/sample.xlsx", {}),
            ("sample/formula/formula.xlsx", {"include_formulas_map": True}),
        ],
    )
    def test_workbook_payloads_validate(self, xlsx, opts):
        from exstruct_ray.api import extract
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.serialize import workbook_payload

        payload = workbook_payload(
            extract(str(REF / xlsx), ExtractOptions(mode="light", **opts))
        )
        _validator("workbook").validate(payload)
        for sheet in payload["sheets"].values():
            _validator("sheet").validate(sheet)

    def test_verbose_mode_validates(self):
        from exstruct_ray.api import extract
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.serialize import workbook_payload

        payload = workbook_payload(
            extract(
                str(REF / "sample/basic/sample.xlsx"),
                ExtractOptions(mode="verbose"),
            )
        )
        _validator("workbook").validate(payload)

    def test_backend_metadata_mode_validates(self):
        from exstruct_ray.api import extract
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.serialize import workbook_payload

        payload = workbook_payload(
            extract(
                str(REF / "sample/flowchart/sample-shape-connector.xlsx"),
                ExtractOptions(mode="light"),
            ),
            include_backend_metadata=True,
        )
        _validator("workbook").validate(payload)

    def test_print_area_view_validates(self):
        from exstruct_ray.api import extract
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.views import build_print_area_views
        from exstruct_ray.models import PrintArea

        workbook = extract(
            str(REF / "sample/basic/sample.xlsx"),
            ExtractOptions(mode="light"),
        )
        v = _validator("print_area_view")
        n_views = 0
        for sheet_name, sheet in workbook.sheets.items():
            # the samples declare no print areas; slice a synthetic one
            # so the view payload exercises rows/shapes/charts clipping
            sheet.print_areas = [PrintArea(r1=1, c1=0, r2=20, c2=10)]
            for view in build_print_area_views(
                workbook.book_name, sheet_name, sheet
            ):
                v.validate(view.to_payload())
                n_views += 1
        assert n_views > 0

    def test_schema_rejects_malformed_payload(self):
        v = _validator("workbook")
        with pytest.raises(jsonschema.ValidationError):
            v.validate({"sheets": {}})  # book_name missing
        with pytest.raises(jsonschema.ValidationError):
            v.validate(
                {
                    "book_name": "b",
                    "sheets": {"s": {"rows": [{"c": {}}]}},  # r missing
                }
            )
