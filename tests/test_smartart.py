"""Light-mode SmartArt from xl/diagrams data parts.

The reference reads SmartArt only through COM
(/root/reference/src/exstruct/core/shapes.py:185-305); this path parses
the OOXML dgm:dataModel directly — exceeding the reference's pure-Python
coverage. Parity target: the reference's own COM golden
(sample/smartart/sample_smartart.json). Documented deltas:
  - layout: COM reports Excel's LOCALIZED layout name ("基本の循環");
    OOXML carries only the layout URN, light emits its tail ("cycle2").
  - geometry: this workbook sets no explicit column widths, so COM uses
    the Japanese theme font's default column (70 px) while light assumes
    the standard default (64 px) — anchors in column 0 match exactly,
    anchors N columns in drift ~4.7 pt/column.
"""

import json
import xml.etree.ElementTree as ET
from pathlib import Path

import pytest

REF = Path("/root/reference")

_DGM_NS = "http://schemas.openxmlformats.org/drawingml/2006/diagram"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _data_model(points: str, cxns: str) -> ET.Element:
    return ET.fromstring(
        f'<dgm:dataModel xmlns:dgm="{_DGM_NS}" xmlns:a="{_A_NS}">'
        f"<dgm:ptLst>{points}</dgm:ptLst>"
        f"<dgm:cxnLst>{cxns}</dgm:cxnLst>"
        "</dgm:dataModel>"
    )


def _pt(model_id: str, text: str = "", ptype: str | None = None, lo: str = "") -> str:
    attrs = f' type="{ptype}"' if ptype else ""
    pr = f'<dgm:prSet loTypeId="{lo}"/>' if lo else ""
    body = (
        f"<dgm:t><a:p><a:r><a:t>{text}</a:t></a:r></a:p></dgm:t>" if text else ""
    )
    return f'<dgm:pt modelId="{model_id}"{attrs}>{pr}{body}</dgm:pt>'


class TestDiagramDataParser:
    def test_tree_order_and_layout(self):
        from exstruct_ray.ooxml.drawing import _parse_diagram_data

        root = _data_model(
            _pt("doc", ptype="doc", lo="urn:x/layout/cycle2")
            + _pt("a", "Alpha")
            + _pt("b", "Beta")
            + _pt("a1", "Kid"),
            '<dgm:cxn srcId="doc" destId="b" srcOrd="1"/>'
            '<dgm:cxn srcId="doc" destId="a" srcOrd="0"/>'
            '<dgm:cxn srcId="a" destId="a1" srcOrd="0"/>',
        )
        layout, nodes = _parse_diagram_data(root)
        assert layout == "cycle2"
        assert [n.text for n in nodes] == ["Alpha", "Beta"]  # srcOrd order
        assert [k.text for k in nodes[0].kids] == ["Kid"]
        assert nodes[1].kids == []

    def test_non_parof_connections_ignored(self):
        from exstruct_ray.ooxml.drawing import _parse_diagram_data

        root = _data_model(
            _pt("doc", ptype="doc") + _pt("a", "A") + _pt("p1", ptype="parTrans"),
            '<dgm:cxn srcId="doc" destId="a"/>'
            '<dgm:cxn type="parTransOf" srcId="a" destId="p1"/>',
        )
        _, nodes = _parse_diagram_data(root)
        assert [n.text for n in nodes] == ["A"]
        assert nodes[0].kids == []

    def test_cycle_guard(self):
        from exstruct_ray.ooxml.drawing import _parse_diagram_data

        root = _data_model(
            _pt("doc", ptype="doc") + _pt("a", "A") + _pt("b", "B"),
            '<dgm:cxn srcId="doc" destId="a"/>'
            '<dgm:cxn srcId="a" destId="b"/>'
            '<dgm:cxn srcId="b" destId="a"/>',  # malformed back-edge
        )
        _, nodes = _parse_diagram_data(root)
        assert nodes[0].text == "A"
        assert nodes[0].kids[0].text == "B"
        assert nodes[0].kids[0].kids == []  # back-edge not followed

    def test_multi_paragraph_text_joined(self):
        from exstruct_ray.ooxml.drawing import _parse_diagram_data

        root = _data_model(
            _pt("doc", ptype="doc")
            + '<dgm:pt modelId="a"><dgm:t>'
            "<a:p><a:r><a:t>line1</a:t></a:r></a:p>"
            "<a:p><a:r><a:t>line</a:t></a:r><a:r><a:t>2</a:t></a:r></a:p>"
            "</dgm:t></dgm:pt>",
            '<dgm:cxn srcId="doc" destId="a"/>',
        )
        _, nodes = _parse_diagram_data(root)
        assert nodes[0].text == "line1\nline2"

    def test_node_payload_drops_empty_kids(self):
        from exstruct_ray.models import SmartArtNode

        leaf = SmartArtNode(text="x")
        parent = SmartArtNode(text="p", kids=[leaf])
        assert leaf.to_payload() == {"text": "x"}
        assert parent.to_payload() == {"text": "p", "kids": [{"text": "x"}]}


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not available")
class TestSmartArtReferenceSample:
    @pytest.fixture(scope="class")
    def pair(self):
        from exstruct_ray.api import extract
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.serialize import workbook_payload

        mine = workbook_payload(
            extract(
                REF / "sample/smartart/sample_smartart.xlsx",
                ExtractOptions(mode="light"),
            )
        )
        golden = json.loads(
            (REF / "sample/smartart/sample_smartart.json").read_text()
        )
        return (
            mine["sheets"]["Sheet1"]["shapes"],
            golden["sheets"]["Sheet1"]["shapes"],
        )

    def test_node_trees_exact(self, pair):
        mine, golden = pair
        assert len(mine) == len(golden) == 3
        for m, g in zip(mine, golden):
            assert m["kind"] == g["kind"] == "smartart"
            assert m["id"] == g["id"]
            assert m["nodes"] == g["nodes"]
            assert sorted(m.keys()) == sorted(g.keys())

    def test_layout_is_urn_tail(self, pair):
        """COM golden carries localized names; light emits the layout URN
        tail — the documented delta."""
        mine, _ = pair
        assert [m["layout"] for m in mine] == ["cycle2", "hChevron3", "orgChart1"]

    def test_geometry(self, pair):
        mine, golden = pair
        for m, g in zip(mine, golden):
            # rows use the explicit default height -> tops match
            assert abs(m["t"] - g["t"]) <= 2
        # column-0 anchors are width-independent -> exact lefts
        assert mine[0]["l"] == golden[0]["l"]
        assert abs(mine[2]["l"] - golden[2]["l"]) <= 2
        # col-7 anchor drifts by the theme-font default-width delta only
        assert abs(mine[1]["l"] - golden[1]["l"]) <= 7 * 5
