"""Scalar-function conformance vectors (FIXTURES.md §3)."""

import math

import pytest

from exstruct_ray.functions import (
    alpha_to_col_index,
    angle_to_compass,
    canonical_json,
    coerce_numeric_preserve_format,
    col_index_to_alpha,
    column_width_to_points,
    compute_line_angle_deg,
    dict_without_empty_values,
    emu_to_points,
    normalize_color_key,
    normalize_formula_value,
    parse_range_zero_based,
)


class TestCoercion:
    """Parity: /root/reference/src/exstruct/core/cells.py:1946-1969."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("123", 123),
            ("+7", 7),
            ("-12", -12),
            ("007", 7),
            ("1.50", 1.5),
            ("-0.25", -0.25),
            (".5", 0.5),
            ("1e5", "1e5"),  # scientific notation stays a string
            ("text", "text"),
            ("1.2.3", "1.2.3"),
            ("12.0", 12.0),
            ("", ""),
        ],
    )
    def test_values(self, raw, expected):
        got = coerce_numeric_preserve_format(raw)
        assert got == expected
        assert type(got) is type(expected)


class TestA1:
    def test_col_alpha_roundtrip(self):
        for idx, alpha in [(0, "A"), (25, "Z"), (26, "AA"), (27, "AB"), (701, "ZZ"), (702, "AAA")]:
            assert col_index_to_alpha(idx) == alpha
            assert alpha_to_col_index(alpha) == idx

    def test_negative_raises(self):
        with pytest.raises(ValueError):
            col_index_to_alpha(-1)

    def test_parse_range(self):
        b = parse_range_zero_based("Sheet1!A1:B2")
        assert (b.r1, b.c1, b.r2, b.c2) == (0, 0, 1, 1)
        b = parse_range_zero_based("$C$3:$D$10")
        assert (b.r1, b.c1, b.r2, b.c2) == (2, 2, 9, 3)
        b = parse_range_zero_based("B5")
        assert (b.r1, b.c1, b.r2, b.c2) == (4, 1, 4, 1)
        assert parse_range_zero_based("") is None
        assert parse_range_zero_based("nope!") is None


class TestGeometry:
    def test_emu_to_points(self):
        assert emu_to_points("12700") == 1
        assert emu_to_points(25400) == 2
        assert emu_to_points("6350") == 0  # round-half-even at .5
        assert emu_to_points(None) is None
        assert emu_to_points("x") is None

    def test_column_width(self):
        # (w*7+5)*72/96 — reference ooxml_drawing.py:855-860
        assert column_width_to_points(8.43) == pytest.approx((8.43 * 7 + 5) * 0.75)
        assert column_width_to_points(0) == 0.0

    def test_compass_buckets(self):
        # DIR-01..09 conformance: 0=E, 45=SE-ish bucketing per reference map
        cases = {
            0.0: "E",
            22.4: "E",
            22.6: "NE",
            45.0: "NE",
            90.0: "N",
            135.0: "NW",
            180.0: "W",
            225.0: "SW",
            270.0: "S",
            315.0: "SE",
            337.4: "SE",
            337.6: "E",
        }
        for angle, expected in cases.items():
            assert angle_to_compass(angle) == expected, angle

    def test_line_angle(self):
        assert compute_line_angle_deg(1, 0) == 0.0
        assert compute_line_angle_deg(0, 1) == 90.0
        assert compute_line_angle_deg(-1, 0) == 180.0
        assert compute_line_angle_deg(0, -1) == 270.0
        assert math.isclose(compute_line_angle_deg(1, 1), 45.0)


class TestColors:
    """Parity: cells.py:593-687."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("#ffffff", "FFFFFF"),
            ("FFFFFFFF", "FFFFFF"),
            ("FF0000", "FF0000"),
            ("theme:1:0.2", "theme:1:0.2"),
            ("THEME:1", "theme:1"),
            ("indexed:64", "indexed:64"),
            ("auto", "auto"),
            ("  ", ""),
        ],
    )
    def test_normalize(self, raw, expected):
        assert normalize_color_key(raw) == expected


class TestFormulas:
    def test_normalize(self):
        assert normalize_formula_value("SUM(A1)") == "=SUM(A1)"
        assert normalize_formula_value("=A1") == "=A1"
        assert normalize_formula_value("") is None
        assert normalize_formula_value(None) is None

        class ArrayFormula:
            text = "A1:B2"

        assert normalize_formula_value(ArrayFormula()) == "=A1:B2"


class TestCanonical:
    def test_strip_empties(self):
        assert dict_without_empty_values(
            {"a": None, "b": "", "c": [], "d": {}, "e": 0, "f": False, "g": [1, None]}
        ) == {"e": 0, "f": False, "g": [1]}

    def test_canonical_json_unicode(self):
        assert canonical_json({"k": "月"}) == '{"k":"月"}'
