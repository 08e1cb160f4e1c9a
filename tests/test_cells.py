"""Cell grid, merged cells, links, formulas, colors extraction tests."""

import datetime as dt

from exstruct_ray.config import ExtractOptions
from exstruct_ray.datagen.builder import StyleSpec, WorkbookBuilder
from exstruct_ray.extract.document import extract_workbook
from exstruct_ray.ooxml.package import VirtualPackage


def make_package(wb: WorkbookBuilder) -> VirtualPackage:
    spans = wb.build_parts()
    return VirtualPackage.from_spans(
        [s["kind"] for s in spans],
        [s["text"] for s in spans],
        [s["media_ref"] for s in spans],
    )


def extract(wb: WorkbookBuilder, **opts):
    return extract_workbook(make_package(wb), ExtractOptions(**opts).resolved())


class TestCells:
    def test_blank_skipping_and_coercion(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "123").set(1, 1, "1.50").set(1, 2, "  ").set(1, 3, "")
        sh.set(3, 2, "x")
        out = extract(wb)
        rows = out.sheets["S"].rows
        assert len(rows) == 2
        assert rows[0].r == 1 and rows[0].c == {"0": 123, "1": 1.5}
        assert rows[1].r == 3 and rows[1].c == {"2": "x"}

    def test_numbers_bools_dates(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, 120)
        sh.set(1, 1, 1.5)
        sh.set(1, 2, True)
        sh.set(1, 3, dt.datetime(2025, 1, 1))
        sh.set(1, 4, dt.datetime(2025, 3, 15, 12, 30, 45))
        out = extract(wb)
        row = out.sheets["S"].rows[0]
        assert row.c == {
            "0": 120,
            "1": 1.5,
            "2": "True",
            "3": "2025-01-01 00:00:00",
            "4": "2025-03-15 12:30:45",
        }

    def test_shared_strings(self):
        wb = WorkbookBuilder()
        wb.use_shared_strings = True
        sh = wb.sheet("S")
        sh.set(1, 0, "hello")
        sh.set(2, 0, "hello")
        sh.set(3, 0, "世界")
        out = extract(wb)
        rows = out.sheets["S"].rows
        assert [r.c["0"] for r in rows] == ["hello", "hello", "世界"]

    def test_sheet_order_is_workbook_order(self):
        wb = WorkbookBuilder()
        wb.sheet("Zed").set(1, 0, 1)
        wb.sheet("Alpha").set(1, 0, 2)
        out = extract(wb)
        assert list(out.sheets) == ["Zed", "Alpha"]

    def test_hyperlinks_only_in_verbose(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "x").link(1, 0, "https://example.com")
        light = extract(wb)
        assert light.sheets["S"].rows[0].links is None
        verbose = extract(wb, mode="verbose")
        assert verbose.sheets["S"].rows[0].links == {"0": "https://example.com"}


class TestMerged:
    def _form(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "title")
        sh.merge("A1:C1")
        sh.set(2, 0, "a").set(2, 1, "b")
        sh.merge("D2:E3")  # empty-valued merge
        return wb

    def test_merged_items_and_empty_value(self):
        out = extract(self._form(), include_merged_cells=True)
        merged = out.sheets["S"].merged_cells
        assert [(m.r1, m.c1, m.r2, m.c2, m.v) for m in merged] == [
            (1, 0, 1, 2, "title"),
            (2, 3, 3, 4, " "),
        ]

    def test_light_mode_excludes_merged(self):
        out = extract(self._form())
        assert out.sheets["S"].merged_cells is None

    def test_merged_value_filter(self):
        # include_merged_values_in_rows=False removes cells under merges
        out = extract(self._form(), include_merged_values_in_rows=False)
        rows = out.sheets["S"].rows
        # row 1: "title" at col 0 is inside merge A1:C1 -> dropped entirely
        # row 2: "a","b" at cols 0,1 not inside D2:E3 -> kept
        assert len(rows) == 1
        assert rows[0].r == 2 and rows[0].c == {"0": "a", "1": "b"}


class TestFormulasColors:
    def test_formulas_map(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, 2, formula="A9*2")
        sh.set(2, 0, 4, formula="A9*2")
        sh.set(3, 0, 6, formula="=SUM(A1:A2)")
        out = extract(wb, include_formulas_map=True)
        fm = out.sheets["S"].formulas_map
        assert fm == {"=A9*2": [(1, 0), (2, 0)], "=SUM(A1:A2)": [(3, 0)]}
        # formula cells still render their cached values as row data
        assert [r.c["0"] for r in out.sheets["S"].rows] == [2, 4, 6]

    def test_colors_map_keys(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "r", style=StyleSpec(fill_rgb="FFFF0000"))
        sh.set(1, 1, "t", style=StyleSpec(fill_theme=2))
        sh.set(1, 2, "tt", style=StyleSpec(fill_theme=2, fill_tint=-0.25))
        sh.set(1, 3, "plain")
        out = extract(wb, include_colors_map=True)
        cm = out.sheets["S"].colors_map
        assert cm == {
            "FF0000": [(1, 0)],
            "theme:2": [(1, 1)],
            "theme:2:-0.25": [(1, 2)],
        }

    def test_white_fill_needs_default_flag(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "w", style=StyleSpec(fill_rgb="FFFFFFFF"))
        sh.set(1, 1, "x")
        out = extract(wb, include_colors_map=True)
        assert out.sheets["S"].colors_map == {}
        out2 = extract(wb, include_colors_map=True, include_default_background=True)
        # both the explicit white fill and the unstyled cell report white
        assert out2.sheets["S"].colors_map == {"FFFFFF": [(1, 0), (1, 1)]}

    def test_ignore_colors(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "r", style=StyleSpec(fill_rgb="FFFF0000"))
        sh.set(1, 1, "g", style=StyleSpec(fill_rgb="FF00FF00"))
        out = extract(
            wb, include_colors_map=True, ignore_colors=frozenset({"#ff0000"})
        )
        assert out.sheets["S"].colors_map == {"00FF00": [(1, 1)]}


class TestPrintAreas:
    def test_multi_range_print_areas(self):
        wb = WorkbookBuilder()
        wb.sheet("A").set(1, 0, 1)
        wb.sheet("B").set(1, 0, 1)
        wb.print_area("A", "$A$1:$D$10")
        wb.print_area("B", "$A$1:$B$2,$E$5:$F$9")
        out = extract(wb)
        pa_a = out.sheets["A"].print_areas
        assert [(p.r1, p.c1, p.r2, p.c2) for p in pa_a] == [(1, 0, 10, 3)]
        pa_b = out.sheets["B"].print_areas
        assert [(p.r1, p.c1, p.r2, p.c2) for p in pa_b] == [
            (1, 0, 2, 1),
            (5, 4, 9, 5),
        ]


class TestAlphaProjection:
    def test_alpha_keys_and_merged_ranges(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "a").set(1, 26, "z")
        sh.merge("A3:B4")
        sh.set(3, 0, "m")
        out = extract(wb, alpha_col=True, include_merged_cells=True)
        sheet = out.sheets["S"]
        assert sheet.rows[0].c == {"A": "a", "AA": "z"}
        assert sheet.merged_cells is None
        assert sheet.merged_ranges == ["A3:B4"]


class TestStylesEdgeCases:
    """Hand-crafted styles.xml parts probing paths the builder doesn't emit."""

    @staticmethod
    def _package(styles_xml: str, sheet_xml: str):
        from exstruct_ray.ooxml.package import VirtualPackage

        main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
        rel = "http://schemas.openxmlformats.org/package/2006/relationships"
        parts = {
            "xl/workbook.xml": (
                f'<workbook xmlns="{main}" xmlns:r="{r}"><sheets>'
                f'<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
            ),
            "xl/_rels/workbook.xml.rels": (
                f'<Relationships xmlns="{rel}"><Relationship Id="rId1" '
                f'Type="{r}/worksheet" Target="worksheets/sheet1.xml"/></Relationships>'
            ),
            "xl/styles.xml": styles_xml,
            "xl/worksheets/sheet1.xml": sheet_xml,
        }
        return VirtualPackage(parts)

    def test_custom_date_numfmt_and_indexed_fill(self):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook

        main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        styles = (
            f'<styleSheet xmlns="{main}">'
            '<numFmts count="2">'
            '<numFmt numFmtId="164" formatCode="yyyy/mm/dd"/>'
            '<numFmt numFmtId="165" formatCode="0.00&quot;y&quot;"/>'  # not a date
            "</numFmts>"
            '<fills count="3">'
            '<fill><patternFill patternType="none"/></fill>'
            '<fill><patternFill patternType="solid">'
            '<fgColor indexed="64"/></patternFill></fill>'
            '<fill><patternFill patternType="solid">'
            '<bgColor rgb="FF123456"/></patternFill></fill>'
            "</fills>"
            "<cellXfs count=\"4\">"
            '<xf numFmtId="0" fillId="0" borderId="0"/>'
            '<xf numFmtId="164" fillId="0" borderId="0"/>'   # custom date
            '<xf numFmtId="165" fillId="1" borderId="0"/>'   # indexed fill
            '<xf numFmtId="0" fillId="2" borderId="0"/>'     # bgColor fallback
            "</cellXfs></styleSheet>"
        )
        sheet = (
            f'<worksheet xmlns="{main}"><sheetData>'
            '<row r="1">'
            '<c r="A1" s="1"><v>45658</v></c>'      # 2025-01-01 via custom fmt
            '<c r="B1" s="2"><v>42.5</v></c>'       # NOT a date (quoted y)
            '<c r="C1" s="2" t="inlineStr"><is><t>idx</t></is></c>'
            '<c r="D1" s="3" t="inlineStr"><is><t>bg</t></is></c>'
            "</row></sheetData></worksheet>"
        )
        wb = extract_workbook(
            self._package(styles, sheet),
            ExtractOptions(mode="verbose").resolved(),
        )
        sheet_data = wb.sheets["S"]
        row = sheet_data.rows[0]
        assert row.c["0"] == "2025-01-01 00:00:00"
        assert row.c["1"] == 42.5  # quoted 'y' must not trigger date detection
        assert sheet_data.colors_map == {
            "indexed:64": [(1, 1), (1, 2)],
            "123456": [(1, 3)],
        }

    def test_missing_styles_part_is_fine(self):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook

        main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        sheet = (
            f'<worksheet xmlns="{main}"><sheetData>'
            '<row r="1"><c r="A1"><v>7</v></c></row></sheetData></worksheet>'
        )
        pkg = self._package("<broken", sheet)  # malformed styles degrade
        wb = extract_workbook(pkg, ExtractOptions().resolved())
        assert wb.sheets["S"].rows[0].c == {"0": 7}


class TestDate1904:
    def test_mac_1904_date_system(self):
        """workbookPr date1904 shifts the serial epoch by 1462 days."""
        from exstruct_ray.ooxml.package import VirtualPackage
        from exstruct_ray.extract.document import extract_workbook

        main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
        rel = "http://schemas.openxmlformats.org/package/2006/relationships"
        sheet = (
            f'<worksheet xmlns="{main}"><sheetData>'
            '<row r="1"><c r="A1" s="1"><v>100</v></c></row>'
            "</sheetData></worksheet>"
        )
        styles = (
            f'<styleSheet xmlns="{main}"><cellXfs count="2">'
            '<xf numFmtId="0" fillId="0" borderId="0"/>'
            '<xf numFmtId="14" fillId="0" borderId="0"/>'
            "</cellXfs></styleSheet>"
        )

        def wb_xml(date1904: str) -> str:
            return (
                f'<workbook xmlns="{main}" xmlns:r="{r}">'
                f'<workbookPr date1904="{date1904}"/>'
                f'<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
                f"</workbook>"
            )

        rels = (
            f'<Relationships xmlns="{rel}"><Relationship Id="rId1" '
            f'Type="{r}/worksheet" Target="worksheets/sheet1.xml"/></Relationships>'
        )
        for flag, expected in [("1", "1904-04-10 00:00:00"), ("0", "1900-04-09 00:00:00")]:
            pkg = VirtualPackage(
                {
                    "xl/workbook.xml": wb_xml(flag),
                    "xl/_rels/workbook.xml.rels": rels,
                    "xl/styles.xml": styles,
                    "xl/worksheets/sheet1.xml": sheet,
                }
            )
            from exstruct_ray.config import ExtractOptions

            out = extract_workbook(pkg, ExtractOptions().resolved())
            assert out.sheets["S"].rows[0].c["0"] == expected, flag


class TestThirdReviewFixes:
    MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    REL = "http://schemas.openxmlformats.org/package/2006/relationships"

    def _pkg(self, sheet_xml, wb_extra=""):
        from exstruct_ray.ooxml.package import VirtualPackage

        return VirtualPackage(
            {
                "xl/workbook.xml": (
                    f'<workbook xmlns="{self.MAIN}" xmlns:r="{self.R}">{wb_extra}'
                    f'<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
                    f"</workbook>"
                ),
                "xl/_rels/workbook.xml.rels": (
                    f'<Relationships xmlns="{self.REL}"><Relationship Id="rId1" '
                    f'Type="{self.R}/worksheet" Target="worksheets/sheet1.xml"/>'
                    f"</Relationships>"
                ),
                "xl/worksheets/sheet1.xml": sheet_xml,
            }
        )

    def _rows(self, sheet_xml):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook

        wb = extract_workbook(self._pkg(sheet_xml), ExtractOptions().resolved())
        return wb.sheets["S"].rows

    def test_translate_formula_first_token_and_suffix(self):
        from exstruct_ray.functions.formulas import translate_formula

        assert translate_formula("B2*C2", 1, 0) == "B3*C3"       # first token
        assert translate_formula("A1+x", 2, 2) == "C3+x"
        assert translate_formula("SUM(tbl1Col)", 1, 1) == "SUM(tbl1Col)"  # name
        assert translate_formula("B2x+B2", 1, 0) == "B2x+B3"     # suffix guard
        # Quoted sheet names must not be shifted (openpyxl Translator parity).
        assert (
            translate_formula("SUM('A1 Data'!B2:B9)", 1, 0)
            == "SUM('A1 Data'!B3:B10)"
        )
        assert (
            translate_formula("'It''s A1'!A1+\"A1\"", 1, 1)
            == "'It''s A1'!B2+\"A1\""
        )

    def test_fast_path_newline_attr_cells_fall_back(self):
        # <c with a newline before attributes: legal XML the fast regex
        # cannot see — must fall back to ET, never silently drop cells.
        rows = "".join(
            f'<row r="{r}"><c\n r="A{r}"><v>{r}</v></c></row>' for r in range(1, 300)
        )
        sheet = f'<worksheet xmlns="{self.MAIN}"><sheetData>{rows}</sheetData></worksheet>'
        assert len(sheet) >= 8192
        rows_out = self._rows(sheet)
        assert len(rows_out) == 299
        assert rows_out[0].c == {"0": 1}

    def test_fast_path_commented_cell_not_phantom(self):
        filler = "".join(
            f'<row r="{r}"><c r="A{r}"><v>{r}</v></c></row>' for r in range(1, 300)
        )
        sheet = (
            f'<worksheet xmlns="{self.MAIN}"><sheetData>{filler}'
            '<!-- <c r="Z9"><v>999</v></c> -->'
            "</sheetData></worksheet>"
        )
        rows_out = self._rows(sheet)
        assert all("25" not in row.c for row in rows_out)  # col Z absent
        assert len(rows_out) == 299

    def test_implicit_cell_and_row_positions(self):
        sheet = (
            f'<worksheet xmlns="{self.MAIN}"><sheetData>'
            '<row><c t="inlineStr"><is><t>a</t></is></c>'
            '<c t="inlineStr"><is><t>b</t></is></c></row>'
            '<row><c t="inlineStr"><is><t>c</t></is></c></row>'
            '<row r="7"><c r="C7"><v>9</v></c>'
            '<c t="inlineStr"><is><t>after</t></is></c></row>'
            "</sheetData></worksheet>"
        )
        rows = self._rows(sheet)
        assert [(r.r, r.c) for r in rows] == [
            (1, {"0": "a", "1": "b"}),
            (2, {"0": "c"}),
            (7, {"2": 9, "3": "after"}),
        ]

    def test_leap_bug_serials(self):
        sheet = (
            f'<worksheet xmlns="{self.MAIN}"><sheetData>'
            '<row r="1"><c r="A1" s="1"><v>1</v></c>'
            '<c r="B1" s="1"><v>59</v></c>'
            '<c r="C1" s="1"><v>61</v></c></row>'
            "</sheetData></worksheet>"
        )
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        pkg = self._pkg(sheet)
        pkg._parts["xl/styles.xml"] = (
            f'<styleSheet xmlns="{self.MAIN}"><cellXfs count="2">'
            '<xf numFmtId="0" fillId="0" borderId="0"/>'
            '<xf numFmtId="14" fillId="0" borderId="0"/></cellXfs></styleSheet>'
        )
        wb = extract_workbook(pkg, ExtractOptions().resolved())
        row = wb.sheets["S"].rows[0]
        assert row.c["0"] == "1900-01-01 00:00:00"  # serial 1 (+1 leap comp)
        assert row.c["1"] == "1900-02-28 00:00:00"  # serial 59
        assert row.c["2"] == "1900-03-01 00:00:00"  # serial 61 (no comp)

    def test_fast_path_row_ht_attr_order_independent(self):
        # <row spans="1:2" r="3" ht="45.5"> — ht must be captured on the fast
        # path regardless of attribute order (differential vs ET path).
        from exstruct_ray.ooxml.sheet_parser import parse_sheet
        from exstruct_ray.ooxml.styles import Stylesheet

        filler = "".join(
            f'<row r="{r}"><c r="A{r}"><v>{r}</v></c></row>' for r in range(4, 300)
        )
        sheet = (
            f'<worksheet xmlns="{self.MAIN}"><sheetData>'
            '<row r="1" ht="20.5" customHeight="1"><c r="A1"><v>1</v></c></row>'
            '<row spans="1:2" r="3" ht="45.5"><c r="A3"><v>3</v></c></row>'
            f"{filler}</sheetData></worksheet>"
        )
        assert len(sheet) >= 8192  # fast path eligible
        pkg = self._pkg(sheet)
        styles = Stylesheet()
        grids = {}
        for fast in (True, False):
            grids[fast] = parse_sheet(
                pkg, "xl/worksheets/sheet1.xml", "S", [], styles,
                allow_fast_path=fast,
            )
        assert grids[True].metrics.row_height_points == {0: 20.5, 2: 45.5}
        assert (
            grids[True].metrics.row_height_points
            == grids[False].metrics.row_height_points
        )
        assert grids[True].cells.keys() == grids[False].cells.keys()

    def test_print_area_local_sheet_id_counts_chartsheets(self):
        # localSheetId indexes the full <sheets> order; with a chartsheet at
        # index 0, localSheetId=1 must resolve to the worksheet "W".
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        main, r, rel = self.MAIN, self.R, self.REL
        pkg = VirtualPackage(
            {
                "xl/workbook.xml": (
                    f'<workbook xmlns="{main}" xmlns:r="{r}"><sheets>'
                    f'<sheet name="Chart1" sheetId="1" r:id="rId1"/>'
                    f'<sheet name="W" sheetId="2" r:id="rId2"/></sheets>'
                    f'<definedNames><definedName name="_xlnm.Print_Area" '
                    f'localSheetId="1">$A$1:$B$2</definedName>'
                    f"</definedNames></workbook>"
                ),
                "xl/_rels/workbook.xml.rels": (
                    f'<Relationships xmlns="{rel}">'
                    f'<Relationship Id="rId1" Type="{r}/chartsheet" '
                    f'Target="chartsheets/sheet1.xml"/>'
                    f'<Relationship Id="rId2" Type="{r}/worksheet" '
                    f'Target="worksheets/sheet1.xml"/></Relationships>'
                ),
                "xl/worksheets/sheet1.xml": (
                    f'<worksheet xmlns="{main}"><sheetData>'
                    '<row r="1"><c r="A1"><v>1</v></c></row></sheetData></worksheet>'
                ),
            }
        )
        wb = extract_workbook(pkg, ExtractOptions().resolved())
        areas = wb.sheets["W"].print_areas
        assert [(a.r1, a.c1, a.r2, a.c2) for a in areas] == [(1, 0, 2, 1)]

    def test_print_area_quoted_sheet_name_with_comma(self):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        main, r, rel = self.MAIN, self.R, self.REL
        pkg = VirtualPackage(
            {
                "xl/workbook.xml": (
                    f'<workbook xmlns="{main}" xmlns:r="{r}">'
                    f'<sheets><sheet name="A,B" sheetId="1" r:id="rId1"/></sheets>'
                    f'<definedNames><definedName name="_xlnm.Print_Area" '
                    f"localSheetId=\"0\">'A,B'!$A$1:$B$2,'A,B'!$D$4:$E$5"
                    f"</definedName></definedNames></workbook>"
                ),
                "xl/_rels/workbook.xml.rels": (
                    f'<Relationships xmlns="{rel}"><Relationship Id="rId1" '
                    f'Type="{r}/worksheet" Target="worksheets/sheet1.xml"/>'
                    f"</Relationships>"
                ),
                "xl/worksheets/sheet1.xml": (
                    f'<worksheet xmlns="{main}"><sheetData>'
                    '<row r="1"><c r="A1"><v>1</v></c></row></sheetData></worksheet>'
                ),
            }
        )
        wb = extract_workbook(pkg, ExtractOptions().resolved())
        areas = wb.sheets["A,B"].print_areas
        assert [(a.r1, a.c1, a.r2, a.c2) for a in areas] == [
            (1, 0, 2, 1),
            (4, 3, 5, 4),
        ]
