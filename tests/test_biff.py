"""Legacy .xls (BIFF8) reader tests — hand-built CFB + BIFF fixtures,
mirroring the reference's hand-crafted-zip test strategy."""

import struct

import pytest

from exstruct_ray.api import extract
from exstruct_ray.ooxml.biff import (
    _decode_rk,
    is_cfb,
    parse_xls,
    read_xls_to_parts,
)

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF


def _record(opcode: int, data: bytes) -> bytes:
    return struct.pack("<HH", opcode, len(data)) + data


def _sst(strings: list[str]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for text in strings:
        encoded = text.encode("latin-1", "replace")
        body += struct.pack("<HB", len(text), 0) + encoded
    return _record(0x00FC, body)


def _unicode_name(name: str) -> bytes:
    return struct.pack("<BB", len(name), 0) + name.encode("latin-1")


def build_workbook_stream(
    sheet_cells: list[tuple[int, int, object]],
    strings: list[str],
    merged: list[tuple[int, int, int, int]] = (),
    date_cells: list[tuple[int, int, float]] = (),
) -> bytes:
    """Minimal BIFF8 Workbook stream: globals substream + one sheet."""
    string_index = {s: i for i, s in enumerate(strings)}

    sheet_records = [_record(0x0809, struct.pack("<HHHH", 0x0600, 0x0010, 0, 0))]
    for r, c, value in sheet_cells:
        if isinstance(value, str):
            sheet_records.append(
                _record(
                    0x00FD,
                    struct.pack("<HHHI", r, c, 0, string_index[value]),
                )
            )
        elif isinstance(value, bool):
            sheet_records.append(
                _record(0x0205, struct.pack("<HHHBB", r, c, 0, int(value), 0))
            )
        elif isinstance(value, int) and abs(value) < (1 << 29):
            sheet_records.append(
                _record(0x027E, struct.pack("<HHHI", r, c, 0, (value << 2) | 2))
            )
        else:
            sheet_records.append(
                _record(0x0203, struct.pack("<HHHd", r, c, 0, float(value)))
            )
    for r, c, serial in date_cells:
        sheet_records.append(
            _record(0x0203, struct.pack("<HHHd", r, c, 1, float(serial)))
        )
    if merged:
        body = struct.pack("<H", len(merged))
        for r1, r2, c1, c2 in merged:
            body += struct.pack("<HHHH", r1, r2, c1, c2)
        sheet_records.append(_record(0x00E5, body))
    sheet_records.append(_record(0x000A, b""))
    sheet_stream = b"".join(sheet_records)

    # globals: BOF, DATEMODE, FORMAT/XFs, SST, BOUNDSHEET(offset), EOF
    xf_general = _record(0x00E0, struct.pack("<HHHH", 0, 0, 0, 0) + b"\x00" * 12)
    xf_date = _record(0x00E0, struct.pack("<HHHH", 0, 14, 0, 0) + b"\x00" * 12)
    prefix = [
        _record(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0)),
        _record(0x0022, struct.pack("<H", 0)),
        xf_general,
        xf_date,
        _sst(strings),
    ]
    # BOUNDSHEET offset is absolute within the stream; compute with a
    # placeholder first.
    placeholder = _record(
        0x0085, struct.pack("<IH", 0, 0) + _unicode_name("Sheet1")
    )
    globals_size = sum(len(r) for r in prefix) + len(placeholder) + 4
    boundsheet = _record(
        0x0085, struct.pack("<IH", globals_size, 0) + _unicode_name("Sheet1")
    )
    stream = b"".join(prefix) + boundsheet + _record(0x000A, b"") + sheet_stream
    return stream


def build_cfb(stream: bytes, stream_name: str = "Workbook") -> bytes:
    """Single-stream compound file with the stream in the REGULAR FAT.

    Header sets mini_cutoff=0 so the regular-FAT location is conforming
    even for small streams; build_cfb_ministream covers the mini path."""
    sector = 512
    n_stream_sectors = (len(stream) + sector - 1) // sector
    # layout: sector 0 = FAT, 1 = directory, 2.. = stream
    fat = [0xFFFFFFFD, ENDOFCHAIN]  # FAT sector marker, directory chain end
    for i in range(n_stream_sectors):
        fat.append(2 + i + 1 if i + 1 < n_stream_sectors else ENDOFCHAIN)
    fat += [FREESECT] * (sector // 4 - len(fat))

    def dir_entry(name, obj_type, start, size, child=FREESECT):
        encoded = name.encode("utf-16-le") + b"\x00\x00"
        block = encoded + b"\x00" * (64 - len(encoded))
        block += struct.pack("<H", len(encoded))
        block += struct.pack("<BB", obj_type, 1)
        block += struct.pack("<III", FREESECT, FREESECT, child)
        block += b"\x00" * 36  # clsid + state + times
        block += struct.pack("<IQ", start, size)
        assert len(block) == 128
        return block

    directory = (
        dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1)
        + dir_entry(stream_name, 2, 2, len(stream))
        + dir_entry("", 0, FREESECT, 0)
        + dir_entry("", 0, FREESECT, 0)
    )

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 26, 0x003E)  # minor version
    struct.pack_into("<H", header, 28, 0x0003)  # major version 3
    struct.pack_into("<H", header, 24, 0xFFFE)  # byte order... offset 28?
    struct.pack_into("<H", header, 30, 9)  # sector shift 512
    struct.pack_into("<H", header, 32, 6)  # mini shift 64
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # directory start sector
    struct.pack_into("<I", header, 56, 0)  # mini cutoff: regular FAT
    struct.pack_into("<i", header, 60, -2)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<i", header, 68, -2)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<i", header, 76 + i * 4, -1)
    struct.pack_into("<I", header, 76, 0)  # first FAT sector = 0

    def pad(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % sector)

    fat_bytes = struct.pack(f"<{sector // 4}I", *fat)
    return bytes(header) + fat_bytes + pad(directory) + pad(stream)


def build_cfb_ministream(stream: bytes, stream_name: str = "Workbook") -> bytes:
    """Conforming small-stream layout: stream lives in the MINI stream
    (64-byte minisectors chained through the miniFAT), the real-world
    shape of small .xls files."""
    sector = 512
    mini = 64
    n_mini = (len(stream) + mini - 1) // mini
    mini_stream = stream + b"\x00" * (-len(stream) % mini)
    n_root_sectors = (len(mini_stream) + sector - 1) // sector

    # sectors: 0=FAT, 1=directory, 2=miniFAT, 3..=root (mini stream data)
    fat = [0xFFFFFFFD, ENDOFCHAIN, ENDOFCHAIN]
    for i in range(n_root_sectors):
        fat.append(3 + i + 1 if i + 1 < n_root_sectors else ENDOFCHAIN)
    fat += [FREESECT] * (sector // 4 - len(fat))

    minifat = []
    for i in range(n_mini):
        minifat.append(i + 1 if i + 1 < n_mini else ENDOFCHAIN)
    minifat += [FREESECT] * (sector // 4 - len(minifat))

    def dir_entry(name, obj_type, start, size, child=FREESECT):
        encoded = name.encode("utf-16-le") + b"\x00\x00"
        block = encoded + b"\x00" * (64 - len(encoded))
        block += struct.pack("<H", len(encoded))
        block += struct.pack("<BB", obj_type, 1)
        block += struct.pack("<III", FREESECT, FREESECT, child)
        block += b"\x00" * 36
        block += struct.pack("<IQ", start, size)
        return block

    directory = (
        dir_entry("Root Entry", 5, 3, len(mini_stream), child=1)
        + dir_entry(stream_name, 2, 0, len(stream))
        + dir_entry("", 0, FREESECT, 0)
        + dir_entry("", 0, FREESECT, 0)
    )

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 28, 0x0003)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)
    struct.pack_into("<I", header, 48, 1)  # directory start
    struct.pack_into("<I", header, 56, 4096)  # standard cutoff
    struct.pack_into("<I", header, 60, 2)  # miniFAT start sector
    struct.pack_into("<I", header, 64, 1)  # one miniFAT sector
    struct.pack_into("<i", header, 68, -2)
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<i", header, 76 + i * 4, -1)
    struct.pack_into("<I", header, 76, 0)

    def pad(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % sector)

    return (
        bytes(header)
        + struct.pack(f"<{sector // 4}I", *fat)
        + pad(directory)
        + struct.pack(f"<{sector // 4}I", *minifat)
        + pad(mini_stream)
    )


class TestRkDecode:
    def test_variants(self):
        assert _decode_rk((7 << 2) | 2) == 7
        assert _decode_rk(((-3 & 0x3FFFFFFF) << 2) | 2) == -3
        # 100 * mul100 int
        assert _decode_rk((700 << 2) | 3) == 7
        # float: 2.5 → IEEE top 30 bits
        bits = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
        assert _decode_rk((bits >> 32) & ~0x3) == 2.5


class TestXlsRoundtrip:
    def _xls(self, **kwargs) -> bytes:
        return build_cfb(build_workbook_stream(**kwargs))

    def test_cells_merges_dates_through_extractor(self, tmp_path):
        data = self._xls(
            sheet_cells=[
                (0, 0, "name"), (0, 1, "qty"),
                (1, 0, "ant"), (1, 1, 3),
                (2, 0, "bee"), (2, 1, 2.5),
                (3, 0, True),
            ],
            strings=["name", "qty", "ant", "bee"],
            merged=[(5, 6, 0, 1)],
            date_cells=[(7, 0, 45000.0)],
        )
        assert is_cfb(data)
        path = tmp_path / "legacy.xls"
        path.write_bytes(data)
        from exstruct_ray.config import ExtractOptions

        wb = extract(str(path), ExtractOptions(mode="verbose"))
        sheet = wb.sheets["Sheet1"]
        rows = {r.r: r.c for r in sheet.rows}
        assert rows[1] == {"0": "name", "1": "qty"}
        assert rows[2] == {"0": "ant", "1": 3}
        assert rows[3] == {"0": "bee", "1": 2.5}
        assert rows[4] == {"0": "True"}
        # date serial 45000 (1900 system) renders like an xlsx date cell
        assert rows[8] == {"0": "2023-03-15 00:00:00"}
        merged = sheet.merged_cells
        assert merged is not None
        assert [(m.r1, m.c1, m.r2, m.c2) for m in merged] == [(6, 0, 7, 1)]

    def test_parse_xls_model(self):
        data = self._xls(
            sheet_cells=[(0, 0, "hello"), (0, 1, 42)],
            strings=["hello"],
        )
        wb = parse_xls(data)
        assert wb.sheets["Sheet1"].cells[(1, 1)].value == "hello"
        assert wb.sheets["Sheet1"].cells[(1, 2)].value == 42

    def test_parts_feed_standard_pipeline(self):
        data = self._xls(sheet_cells=[(0, 0, "x")], strings=["x"])
        parts = read_xls_to_parts(data)
        assert "xl/workbook.xml" in parts
        assert "Sheet1" in parts["xl/workbook.xml"]

    def test_ministream_layout(self):
        data = build_cfb_ministream(
            build_workbook_stream(
                sheet_cells=[(0, 0, "mini"), (1, 0, 9)], strings=["mini"]
            )
        )
        wb = parse_xls(data)
        assert wb.sheets["Sheet1"].cells[(1, 1)].value == "mini"
        assert wb.sheets["Sheet1"].cells[(2, 1)].value == 9

    def test_non_cfb_rejected(self):
        with pytest.raises(ValueError):
            parse_xls(b"PK\x03\x04 not a compound file")
