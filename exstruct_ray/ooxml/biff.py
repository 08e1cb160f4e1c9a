"""Legacy .xls (BIFF8) reader — pure Python, no COM, no xlrd.

The reference cannot read .xls without Windows COM (core/cells.py:1913-1916
falls back to xlwings with a convert-to-xlsx warning); this module goes
beyond its pure-Python light path by parsing the format directly from the
public specifications: MS-CFB (compound file binary: FAT/miniFAT sector
chains, directory entries) and MS-XLS (BIFF8 record stream: SST with
CONTINUE re-flagging, RK/MULRK number packing, LABELSST, FORMULA cached
values, MERGEDCELLS, BOUNDSHEET offsets, DATEMODE, XF/FORMAT date
detection).

Strategy: decode the BIFF cell grid into the edit model and re-emit OOXML
parts (edit/emit.py), so .xls documents flow through the exact same
extraction pipeline as .xlsx — one code path, one span contract.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE

# BIFF record opcodes
_BOF = 0x0809
_EOF_R = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_DATEMODE = 0x0022
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING_R = 0x0207
_MERGEDCELLS = 0x00E5
_XF = 0x00E0
_FORMAT_R = 0x041E

_BUILTIN_DATE_FMT_IDS = frozenset(
    list(range(14, 23)) + list(range(27, 37)) + [45, 46, 47] + list(range(50, 59))
)


def is_cfb(data: bytes) -> bool:
    return data[:8] == _CFB_MAGIC


# ---------------------------------------------------------------------------
# MS-CFB container
# ---------------------------------------------------------------------------


class _Cfb:
    def __init__(self, data: bytes):
        if not is_cfb(data):
            raise ValueError("not a compound file")
        self._data = data
        (
            self._sector_shift,
            self._mini_shift,
        ) = struct.unpack_from("<HH", data, 30)
        self._sector_size = 1 << self._sector_shift
        self._mini_size = 1 << self._mini_shift
        (self._n_fat,) = struct.unpack_from("<I", data, 44)
        (self._dir_start,) = struct.unpack_from("<I", data, 48)
        (self._mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self._minifat_start,) = struct.unpack_from("<I", data, 60)
        (self._n_minifat,) = struct.unpack_from("<I", data, 64)
        (self._difat_start,) = struct.unpack_from("<I", data, 68)
        (self._n_difat,) = struct.unpack_from("<I", data, 72)

        difat = list(struct.unpack_from("<109I", data, 76))
        sector = self._difat_start
        for _ in range(self._n_difat):
            if sector in (_FREESECT, _ENDOFCHAIN):
                break
            raw = self._sector(sector)
            entries = struct.unpack(f"<{self._sector_size // 4}I", raw)
            difat.extend(entries[:-1])
            sector = entries[-1]
        self._fat: list[int] = []
        for fat_sector in difat:
            if fat_sector in (_FREESECT, _ENDOFCHAIN):
                continue
            self._fat.extend(
                struct.unpack(
                    f"<{self._sector_size // 4}I", self._sector(fat_sector)
                )
            )

        self._minifat: list[int] = []
        for raw in self._chain_sectors(self._minifat_start):
            self._minifat.extend(
                struct.unpack(f"<{self._sector_size // 4}I", raw)
            )

        self._dir_entries = self._read_directory()
        root = self._dir_entries[0]
        self._mini_stream = self._read_chain(root["start"], root["size"])

    def _sector(self, index: int) -> bytes:
        # The header occupies one full sector: 512 bytes in v3, 4096 in v4
        # — (index + 1) * sector_size addresses both correctly.
        off = (index + 1) * self._sector_size
        return self._data[off : off + self._sector_size]

    def _chain_sectors(self, start: int):
        sector = start
        seen = 0
        while sector not in (_FREESECT, _ENDOFCHAIN) and seen <= len(self._fat) + 2:
            yield self._sector(sector)
            sector = self._fat[sector] if sector < len(self._fat) else _ENDOFCHAIN
            seen += 1

    def _read_chain(self, start: int, size: int) -> bytes:
        out = b"".join(self._chain_sectors(start))
        return out[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        parts = []
        sector = start
        seen = 0
        while sector not in (_FREESECT, _ENDOFCHAIN) and seen <= len(self._minifat) + 2:
            off = sector * self._mini_size
            parts.append(self._mini_stream[off : off + self._mini_size])
            sector = (
                self._minifat[sector] if sector < len(self._minifat) else _ENDOFCHAIN
            )
            seen += 1
        return b"".join(parts)[:size]

    def _read_directory(self) -> list[dict]:
        raw = b"".join(self._chain_sectors(self._dir_start))
        entries = []
        for off in range(0, len(raw), 128):
            block = raw[off : off + 128]
            if len(block) < 128:
                break
            (name_len,) = struct.unpack_from("<H", block, 64)
            name = block[: max(0, name_len - 2)].decode("utf-16-le", "ignore")
            obj_type = block[66]
            (start,) = struct.unpack_from("<I", block, 116)
            (size,) = struct.unpack_from("<Q", block, 120)
            entries.append(
                {"name": name, "type": obj_type, "start": start, "size": size}
            )
        return entries

    def stream(self, name: str) -> bytes:
        for entry in self._dir_entries:
            if entry["type"] == 2 and entry["name"] == name:
                if entry["size"] < self._mini_cutoff:
                    return self._read_mini_chain(entry["start"], entry["size"])
                return self._read_chain(entry["start"], entry["size"])
        raise KeyError(f"stream not found: {name}")


# ---------------------------------------------------------------------------
# BIFF8 record stream
# ---------------------------------------------------------------------------


def _iter_records(stream: bytes, start: int = 0):
    pos = start
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack_from("<HH", stream, pos)
        data = stream[pos + 4 : pos + 4 + length]
        yield pos, opcode, data
        pos += 4 + length
        if opcode == _EOF_R and start > 0:
            return


def _decode_rk(rk: int) -> int | float:
    mul100 = rk & 0x01
    as_int = rk & 0x02
    if as_int:
        value: int | float = rk >> 2
        if value & 0x20000000:  # sign-extend 30-bit
            value -= 0x40000000
    else:
        (value,) = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))
    if mul100:
        scaled = value / 100
        if isinstance(value, int) and value % 100 == 0:
            return value // 100
        return scaled
    return value


def _parse_shared_strings(records: list[tuple[int, int, bytes]]) -> list[str]:
    """SST + CONTINUE: each continuation re-declares the encoding flag byte
    for the string fragment it carries."""
    blobs: list[bytes] = []
    for _, opcode, data in records:
        if opcode == _SST:
            blobs = [data]
        elif opcode == _CONTINUE and blobs:
            blobs.append(data)
        elif blobs and opcode not in (_SST, _CONTINUE):
            break
    if not blobs:
        return []

    strings: list[str] = []
    blob_idx = 0
    pos = 8  # skip cstTotal / cstUnique of the SST record
    (_, cst_unique) = struct.unpack_from("<II", blobs[0], 0)

    def remaining() -> int:
        return len(blobs[blob_idx]) - pos

    def advance_blob() -> None:
        nonlocal blob_idx, pos
        blob_idx += 1
        pos = 0

    def read(n: int) -> bytes:
        nonlocal pos
        out = b""
        want = n
        while want:
            if remaining() == 0:
                advance_blob()
            take = min(want, remaining())
            out += blobs[blob_idx][pos : pos + take]
            pos += take
            want -= take
        return out

    for _ in range(cst_unique):
        if remaining() < 3 and remaining() == 0:
            advance_blob()
        cch, flags = struct.unpack("<HB", read(3))
        rich_runs = 0
        ext_size = 0
        if flags & 0x08:
            (rich_runs,) = struct.unpack("<H", read(2))
        if flags & 0x04:
            (ext_size,) = struct.unpack("<I", read(4))
        high = flags & 0x01
        chars: list[str] = []
        need = cch
        while need:
            if remaining() == 0:
                advance_blob()
                # continuation fragment re-declares the encoding byte
                (high,) = struct.unpack("<B", read(1))
                high &= 0x01
            if high:
                take = min(need, remaining() // 2)
                if take == 0:
                    # odd split: byte pair straddles blobs
                    chars.append(read(2).decode("utf-16-le", "replace"))
                    need -= 1
                    continue
                chars.append(read(take * 2).decode("utf-16-le", "replace"))
            else:
                take = min(need, remaining())
                chars.append(read(take).decode("latin-1"))
            need -= take
        read(rich_runs * 4 + ext_size)
        strings.append("".join(chars))
    return strings


def parse_xls(data: bytes) -> "EditWorkbookLike":
    """Parse .xls bytes into an EditWorkbook (cells, merges, date styles)."""
    from ..edit.model import EditCell, EditStyle, EditWorkbook

    workbook_stream = None
    cfb = _Cfb(data)
    for name in ("Workbook", "Book"):
        try:
            workbook_stream = cfb.stream(name)
            break
        except KeyError:
            continue
    if workbook_stream is None:
        raise ValueError("no Workbook stream in compound file")

    globals_records = list(_iter_records(workbook_stream))
    sheets: list[tuple[str, int]] = []
    date1904 = False
    shared = _parse_shared_strings(globals_records)
    custom_date_fmts: set[int] = set()
    xf_is_date: list[bool] = []
    for _, opcode, rec in globals_records:
        if opcode == _BOUNDSHEET:
            (offset,) = struct.unpack_from("<I", rec, 0)
            name_len = rec[6]
            flags = rec[7]
            if flags & 0x01:
                name = rec[8 : 8 + name_len * 2].decode("utf-16-le", "replace")
            else:
                name = rec[8 : 8 + name_len].decode("latin-1")
            sheets.append((name, offset))
        elif opcode == _DATEMODE:
            date1904 = struct.unpack_from("<H", rec, 0)[0] == 1
        elif opcode == _FORMAT_R:
            (fmt_id,) = struct.unpack_from("<H", rec, 0)
            (cch,) = struct.unpack_from("<H", rec, 2)
            flags = rec[4]
            if flags & 0x01:
                code = rec[5 : 5 + cch * 2].decode("utf-16-le", "replace")
            else:
                code = rec[5 : 5 + cch].decode("latin-1")
            from .styles import _format_code_is_date

            if _format_code_is_date(code):
                custom_date_fmts.add(fmt_id)
        elif opcode == _XF:
            (fmt_id,) = struct.unpack_from("<H", rec, 2)
            xf_is_date.append(
                fmt_id in _BUILTIN_DATE_FMT_IDS or fmt_id in custom_date_fmts
            )
        elif opcode == _EOF_R:
            break

    workbook = EditWorkbook()
    date_style = EditStyle(date_fmt=True)

    def cell_style(xf: int) -> EditStyle:
        if 0 <= xf < len(xf_is_date) and xf_is_date[xf]:
            return date_style
        return EditStyle()

    for sheet_name, offset in sheets:
        sheet = workbook.add_sheet(sheet_name)
        pending_formula_cell: tuple[int, int] | None = None
        for _, opcode, rec in _iter_records(workbook_stream, offset):
            if opcode == _NUMBER:
                r, c, xf = struct.unpack_from("<HHH", rec, 0)
                (value,) = struct.unpack_from("<d", rec, 6)
                sheet.cells[(r + 1, c + 1)] = EditCell(
                    value=_int_if_whole(value), style=cell_style(xf)
                )
            elif opcode == _RK:
                r, c, xf = struct.unpack_from("<HHH", rec, 0)
                (rk,) = struct.unpack_from("<I", rec, 6)
                sheet.cells[(r + 1, c + 1)] = EditCell(
                    value=_decode_rk(rk), style=cell_style(xf)
                )
            elif opcode == _MULRK:
                r, c_first = struct.unpack_from("<HH", rec, 0)
                (c_last,) = struct.unpack_from("<H", rec, len(rec) - 2)
                for i in range(c_last - c_first + 1):
                    xf, rk = struct.unpack_from("<HI", rec, 4 + i * 6)
                    sheet.cells[(r + 1, c_first + i + 1)] = EditCell(
                        value=_decode_rk(rk), style=cell_style(xf)
                    )
            elif opcode == _LABELSST:
                r, c, xf = struct.unpack_from("<HHH", rec, 0)
                (idx,) = struct.unpack_from("<I", rec, 6)
                if 0 <= idx < len(shared):
                    sheet.cells[(r + 1, c + 1)] = EditCell(
                        value=shared[idx], style=cell_style(xf)
                    )
            elif opcode == _LABEL:
                r, c, xf = struct.unpack_from("<HHH", rec, 0)
                (cch,) = struct.unpack_from("<H", rec, 6)
                flags = rec[8]
                if flags & 0x01:
                    text = rec[9 : 9 + cch * 2].decode("utf-16-le", "replace")
                else:
                    text = rec[9 : 9 + cch].decode("latin-1")
                sheet.cells[(r + 1, c + 1)] = EditCell(
                    value=text, style=cell_style(xf)
                )
            elif opcode == _BOOLERR:
                r, c, xf = struct.unpack_from("<HHH", rec, 0)
                value, is_err = rec[6], rec[7]
                if not is_err:
                    sheet.cells[(r + 1, c + 1)] = EditCell(
                        value=bool(value), style=cell_style(xf)
                    )
            elif opcode == _FORMULA:
                r, c, xf = struct.unpack_from("<HHH", rec, 0)
                result = rec[6:14]
                if result[6:8] == b"\xff\xff":
                    kind = result[0]
                    if kind == 0:  # string result follows in STRING record
                        pending_formula_cell = (r + 1, c + 1)
                        sheet.cells[(r + 1, c + 1)] = EditCell(
                            value="", style=cell_style(xf)
                        )
                    elif kind == 1:  # boolean
                        sheet.cells[(r + 1, c + 1)] = EditCell(
                            value=bool(result[2]), style=cell_style(xf)
                        )
                    # kind 2 = error: skip (empty)
                else:
                    (value,) = struct.unpack("<d", result)
                    sheet.cells[(r + 1, c + 1)] = EditCell(
                        value=_int_if_whole(value), style=cell_style(xf)
                    )
            elif opcode == _STRING_R and pending_formula_cell is not None:
                (cch,) = struct.unpack_from("<H", rec, 0)
                flags = rec[2]
                if flags & 0x01:
                    text = rec[3 : 3 + cch * 2].decode("utf-16-le", "replace")
                else:
                    text = rec[3 : 3 + cch].decode("latin-1")
                cell = sheet.cells.get(pending_formula_cell)
                if cell is not None:
                    cell.value = text
                pending_formula_cell = None
            elif opcode == _MERGEDCELLS:
                (count,) = struct.unpack_from("<H", rec, 0)
                from ..edit.model import range_ref

                for i in range(count):
                    r1, r2, c1, c2 = struct.unpack_from("<HHHH", rec, 2 + i * 8)
                    sheet.merged.append(
                        range_ref(r1 + 1, c1 + 1, r2 + 1, c2 + 1)
                    )
            elif opcode == _EOF_R:
                break

    workbook._date1904 = date1904  # carried for date rendering downstream
    return workbook


def _int_if_whole(value: float) -> int | float:
    return int(value) if float(value).is_integer() else value


def read_xls_to_parts(data: bytes) -> dict[str, str]:
    """BIFF8 bytes → OOXML part dict (the edit emitter), ready for the
    standard extraction pipeline. Date cells re-render through the same
    numFmt path as .xlsx (serials stay numeric with a date format id;
    the sheet parser renders them to datetime strings)."""
    from ..edit.emit import emit_parts

    workbook = parse_xls(data)
    parts = emit_parts(workbook)
    if getattr(workbook, "_date1904", False):
        parts["xl/workbook.xml"] = parts["xl/workbook.xml"].replace(
            "<sheets>", '<workbookPr date1904="1"/><sheets>', 1
        )
    return parts


EditWorkbookLike = object
