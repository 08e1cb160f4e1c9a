"""TOON encoder tests: spec-shape examples + workbook serialization."""

from exstruct_ray.functions.toon import encode


class TestToonSpecShapes:
    def test_scalars_and_keys(self):
        assert encode({"a": 1, "b": "hi", "c": True, "d": None}) == (
            "a: 1\nb: hi\nc: true\nd: null"
        )

    def test_string_quoting_rules(self):
        out = encode(
            {
                "empty": "",
                "comma": "a,b",
                "colon": "a: b",
                "padded": " x ",
                "boolish": "true",
                "numish": "42",
                "dash": "-x",
                "plain": "hello world",
            }
        )
        assert out.splitlines() == [
            'empty: ""',
            'comma: "a,b"',
            'colon: "a: b"',
            'padded: " x "',
            'boolish: "true"',
            'numish: "42"',
            'dash: "-x"',
            "plain: hello world",
        ]

    def test_quoted_key(self):
        assert encode({"a b": 1}) == '"a b": 1'
        assert encode({"0col": 1}) == '"0col": 1'

    def test_nested_object(self):
        assert encode({"a": {"b": {"c": 1}}}) == "a:\n  b:\n    c: 1"

    def test_primitive_array_inline(self):
        assert encode({"tags": ["x", "y", "z"]}) == "tags[3]: x,y,z"
        assert encode({"nums": [1, 2.5, -3]}) == "nums[3]: 1,2.5,-3"
        assert encode({"none": []}) == "none[0]:"

    def test_tabular_array_of_uniform_objects(self):
        data = {
            "users": [
                {"id": 1, "name": "ada"},
                {"id": 2, "name": "bob"},
            ]
        }
        assert encode(data) == "users[2]{id,name}:\n  1,ada\n  2,bob"

    def test_mixed_array_list_items(self):
        data = {"items": [1, {"a": 1, "b": 2}, [7, 8]]}
        assert encode(data) == (
            "items[3]:\n  - 1\n  - a: 1\n    b: 2\n  - [2]: 7,8"
        )

    def test_non_uniform_objects_fall_back_to_list(self):
        data = {"rows": [{"a": 1}, {"b": 2}]}
        assert encode(data) == "rows[2]:\n  - a: 1\n  - b: 2"

    def test_root_array(self):
        assert encode([1, 2, 3]) == "[3]: 1,2,3"
        assert encode([{"a": 1}, {"a": 2}]) == "[2]{a}:\n  1\n  2"

    def test_unicode_preserved(self):
        assert encode({"名前": "シート1"}) == '"名前": シート1'


class TestWorkbookToon:
    def test_serialize_workbook_toon(self):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.datagen.builder import WorkbookBuilder
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.extract.serialize import serialize_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        builder = WorkbookBuilder()
        builder.sheet("S").set(1, 0, "name").set(1, 1, 42)
        parts = builder.build_parts()
        wb = extract_workbook(
            VirtualPackage.from_spans(
                [p["kind"] for p in parts],
                [p["text"] for p in parts],
                [p["media_ref"] for p in parts],
            ),
            ExtractOptions().resolved(),
            book_name="toon.xlsx",
        )
        out = serialize_workbook(wb, fmt="toon")
        assert "book_name: toon.xlsx" in out
        assert "sheets:" in out
        # round-trip sanity: JSON payload and TOON carry the same row
        assert "name" in out and "42" in out

    def test_save_workbook_toon_suffix(self, tmp_path):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.datagen.builder import WorkbookBuilder
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.extract.serialize import save_sheets, save_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        builder = WorkbookBuilder()
        builder.sheet("S").set(1, 0, "v")
        parts = builder.build_parts()
        wb = extract_workbook(
            VirtualPackage.from_spans(
                [p["kind"] for p in parts],
                [p["text"] for p in parts],
                [p["media_ref"] for p in parts],
            ),
            ExtractOptions().resolved(),
            book_name="t.xlsx",
        )
        dest = save_workbook(wb, tmp_path / "out.toon")
        assert dest.read_text(encoding="utf-8").startswith("book_name:")
        files = save_sheets(wb, tmp_path / "sheets", fmt="toon")
        assert files and files[0].suffix == ".toon"
