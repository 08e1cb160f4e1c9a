"""MCP stdio server tests: real subprocess pipes + in-process handlers."""

import json
import subprocess
import sys


def _make_fixture_xlsx(tmp_path):
    from exstruct_ray.edit import make_workbook

    result = make_workbook(
        [
            {"op": "set_range_values", "sheet": "Data", "range": "A1:B3",
             "values": [["name", "qty"], ["ant", 3], ["bee", 5]]},
            {"op": "set_formula", "sheet": "Data", "cell": "C2",
             "formula": "=B2*2"},
        ],
        sheet="Data",
        out_path=str(tmp_path / "book.xlsx"),
    )
    assert result.error is None
    return str(tmp_path / "book.xlsx")


class TestStdioSubprocess:
    def test_full_session_over_pipes(self, tmp_path):
        xlsx = _make_fixture_xlsx(tmp_path)
        requests = [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize",
             "params": {"protocolVersion": "2024-11-05", "capabilities": {}}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
             "params": {"name": "exstruct_extract",
                        "arguments": {"input_path": xlsx, "mode": "verbose",
                                      "out_path": str(tmp_path / "out.json")}}},
            {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
             "params": {"name": "exstruct_read_range",
                        "arguments": {"out_path": str(tmp_path / "out.json"),
                                      "range": "A1:B2"}}},
            {"jsonrpc": "2.0", "id": 5, "method": "tools/call",
             "params": {"name": "exstruct_read_cells",
                        "arguments": {"out_path": str(tmp_path / "out.json"),
                                      "addresses": ["B2", "C2"]}}},
            {"jsonrpc": "2.0", "id": 6, "method": "ping"},
        ]
        proc = subprocess.run(
            [sys.executable, "-m", "exstruct_ray.mcp_server",
             "--root", str(tmp_path)],
            input="\n".join(json.dumps(r) for r in requests) + "\n",
            capture_output=True,
            text=True,
            timeout=120,
            cwd="/root/repo",
        )
        responses = {
            msg["id"]: msg
            for msg in (json.loads(line) for line in proc.stdout.splitlines())
        }
        assert responses[1]["result"]["protocolVersion"] == "2024-11-05"
        tool_names = {t["name"] for t in responses[2]["result"]["tools"]}
        assert {
            "exstruct_extract", "exstruct_read_range", "exstruct_read_cells",
            "exstruct_read_formulas", "exstruct_read_json_chunk",
            "exstruct_validate_input", "exstruct_patch", "exstruct_make",
            "exstruct_list_ops", "exstruct_describe_op",
            "exstruct_get_runtime_info", "exstruct_capture_sheet_images",
        } <= tool_names
        assert responses[3]["result"]["isError"] is False
        rng = json.loads(responses[4]["result"]["content"][0]["text"])
        assert rng["rows"] == [
            {"r": 1, "c": {"0": "name", "1": "qty"}},
            {"r": 2, "c": {"0": "ant", "1": 3}},
        ]
        cells = json.loads(responses[5]["result"]["content"][0]["text"])
        assert cells["cells"][0] == {"address": "B2", "value": 3, "formula": None}
        assert cells["cells"][1]["formula"] == "=B2*2"
        assert responses[6]["result"] == {}


class TestHandlersInProcess:
    def _tools(self, tmp_path):
        from exstruct_ray.mcp_server import PathPolicy, build_tools

        return build_tools(PathPolicy([str(tmp_path)]))

    def test_path_policy_blocks_escape(self, tmp_path):
        from exstruct_ray.mcp_server import handle_message

        tools = self._tools(tmp_path)
        resp = handle_message(
            {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
             "params": {"name": "exstruct_extract",
                        "arguments": {"input_path": "/etc/passwd"}}},
            tools,
        )
        assert resp["result"]["isError"] is True
        assert "outside allowed roots" in resp["result"]["content"][0]["text"]

    def test_chunk_pagination(self, tmp_path):
        import exstruct_ray.mcp_server as m

        payload = {
            "sheets": {
                "S": {
                    "rows": [
                        {"r": i, "c": {"0": "x" * 40}} for i in range(1, 21)
                    ]
                }
            }
        }
        first = m._read_json_chunk(payload, None, 200, None, None)
        assert not first["eof"] and len(first["rows"]) >= 1
        seen = list(first["rows"])
        cursor = first["cursor"]
        while cursor is not None:
            chunk = m._read_json_chunk(payload, None, 200, None, cursor)
            seen.extend(chunk["rows"])
            cursor = chunk["cursor"]
        assert [r["r"] for r in seen] == list(range(1, 21))

    def test_chunk_row_col_filter(self, tmp_path):
        import exstruct_ray.mcp_server as m

        payload = {
            "sheets": {
                "S": {
                    "rows": [
                        {"r": 1, "c": {"0": "a", "1": "b", "2": "c"}},
                        {"r": 2, "c": {"0": "d"}},
                        {"r": 9, "c": {"0": "z"}},
                    ]
                }
            }
        }
        out = m._read_json_chunk(
            payload, None, 10_000, {"rows": [1, 2], "cols": [2, 3]}, None
        )
        assert out["rows"] == [{"r": 1, "c": {"1": "b", "2": "c"}}]

    def test_patch_and_make_tools(self, tmp_path):
        tools = self._tools(tmp_path)
        _, make = tools["exstruct_make"]
        out = make(
            out_path=str(tmp_path / "m.xlsx"),
            ops=[{"op": "set_value", "sheet": "Sheet1", "cell": "A1",
                  "value": "v"}],
        )
        assert out["error"] is None
        _, patch = tools["exstruct_patch"]
        out2 = patch(
            xlsx_path=str(tmp_path / "m.xlsx"),
            ops=[{"op": "set_value_if", "sheet": "Sheet1", "cell": "A1",
                  "expected": "v", "value": "w"}],
            out_path=str(tmp_path / "m2.xlsx"),
        )
        assert out2["error"] is None
        assert out2["patch_diff"][0]["status"] == "applied"

    def test_capture_images_light_renderer(self, tmp_path):
        """Round 3: capture_sheet_images serves the light PNG renderer
        (grid + text sketch) instead of reporting COM-only."""
        from exstruct_ray.edit import make_workbook

        book = str(tmp_path / "cap.xlsx")
        assert (
            make_workbook(
                [{"op": "set_value", "sheet": "Sheet1", "cell": "A1",
                  "value": "pic"}],
                out_path=book,
            ).error
            is None
        )
        tools = self._tools(tmp_path)
        _, capture = tools["exstruct_capture_sheet_images"]
        out = capture(xlsx_path=book, output_dir=str(tmp_path / "imgs"))
        assert out["renderer"] == "light"
        assert len(out["paths"]) == 1 and out["paths"][0].endswith("Sheet1.png")
        from exstruct_ray.ops.media import decode_png

        px = decode_png(open(out["paths"][0], "rb").read())
        assert px.shape[2] == 3
