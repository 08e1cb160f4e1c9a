"""PDF layout parse: text placement → reading-order recovery.

North-rule component ("PDF/layout parse"): the reference renders Excel to
PDF via COM + pypdfium2 (reference render/__init__.py) but never *parses*
PDF; this module is the from-scratch parse side, oracle-checkable end to
end because the writer half is deterministic.

- ``text_to_pdf_bytes(doc_id, text)`` — a minimal but real PDF 1.4 writer
  (objects, xref, page tree, per-page content streams). The document text
  is laid out as LINE_WORDS-word lines, PAGE_LINES lines per page, each
  line its own BT..ET with an explicit text matrix. To force the reader to
  do *layout* work rather than stream-order concatenation, lines within a
  page are EMITTED in a doc_id-rotated order; every third line uses a hex
  string ``<...>`` and a TJ array with kerning numbers instead of a plain
  literal Tj.
- ``pdf_extract_text(pdf)`` — a from-scratch parser: object table scan,
  page-tree walk (/Pages /Kids order), content-stream tokenizer (Tm/Td/TD
  positioning; Tj/TJ/' show ops; literal-string escapes ``\\( \\) \\\\``
  plus octal; hex strings), then reading-order reconstruction by
  (page, y descending, x ascending) — the layout step the shuffled writer
  makes mandatory.

Both halves speak a deliberately small PDF subset (no compression, no
encryption, WinAnsi text) — enough to round-trip the corpus exactly, which
is what the oracle checks: extracted text == normalized source text.
"""

from __future__ import annotations

import re

from .textdoc import normalize_text

LINE_WORDS = 8
PAGE_LINES = 36
PAGE_W, PAGE_H = 612, 792
MARGIN = 72.0
LEADING = 18.0


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def layout_lines(text: str) -> list[str]:
    words = (text or "").split()
    return [
        " ".join(words[i : i + LINE_WORDS])
        for i in range(0, len(words), LINE_WORDS)
    ]


def text_to_pdf_bytes(doc_id: int, text: str) -> bytes:
    """Deterministic single-column PDF of a document's text."""
    lines = layout_lines(text)
    pages = [lines[i : i + PAGE_LINES] for i in range(0, len(lines), PAGE_LINES)]
    if not pages:
        pages = [[]]  # an empty document still gets one blank page

    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_id = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    content_ids = []
    for page_lines in pages:
        ops = ["BT /F1 11 Tf"]
        # Rotate emission order by doc_id so stream order != reading order;
        # the parser must sort by geometry to win.
        n = len(page_lines)
        rot = doc_id % n if n else 0
        order = list(range(rot, n)) + list(range(0, rot))
        for idx in order:
            line = page_lines[idx]
            y = PAGE_H - MARGIN - idx * LEADING
            ops.append(f"1 0 0 1 {MARGIN:.1f} {y:.1f} Tm")
            if idx % 3 == 2:
                # hex string inside a TJ array with kerning adjustments
                hexstr = line.encode("latin-1", "replace").hex()
                ops.append(f"[<{hexstr}> -120 () 40] TJ")
            else:
                ops.append(f"({_escape_literal(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        content_ids.append(
            add(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream))
        )
    pages_id_placeholder = len(objects) + len(pages) + 1
    page_ids = [
        add(
            (
                f"<< /Type /Page /Parent {pages_id_placeholder} 0 R "
                f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Resources << /Font << /F1 {font_id} 0 R >> >> "
                f"/Contents {cid} 0 R >>"
            ).encode()
        )
        for cid in content_ids
    ]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    pages_id = add(f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode())
    assert pages_id == pages_id_placeholder
    catalog_id = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objects) + 1)
    for i, body in enumerate(objects, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objects) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_id} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _object_bodies(pdf: bytes) -> dict[int, bytes]:
    bodies: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(pdf):
        end = pdf.find(b"endobj", m.end())
        if end != -1:
            bodies[int(m.group(1))] = pdf[m.end() : end]
    return bodies


def _stream_of(body: bytes) -> bytes:
    i = body.find(b"stream")
    if i == -1:
        return b""
    i += len(b"stream")
    if body[i : i + 2] == b"\r\n":
        i += 2
    elif body[i : i + 1] == b"\n":
        i += 1
    j = body.rfind(b"endstream")
    chunk = body[i:j if j != -1 else len(body)]
    return chunk.rstrip(b"\r\n")


def _parse_string_token(data: str, i: int) -> tuple[str, int]:
    """Parse a PDF string starting at data[i] ('(' or '<'); returns
    (decoded text, index past the string)."""
    if data[i] == "<":
        j = data.index(">", i)
        hexdigits = re.sub(r"\s+", "", data[i + 1 : j])
        if len(hexdigits) % 2:
            hexdigits += "0"
        return bytes.fromhex(hexdigits).decode("latin-1"), j + 1
    # literal string with escapes and balanced parens
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == "\\":
            nxt = data[i + 1] if i + 1 < n else ""
            if nxt in "nrtbf":
                out.append({"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}[nxt])
                i += 2
            elif nxt.isdigit():
                k = i + 1
                while k < min(i + 4, n) and data[k].isdigit():
                    k += 1
                out.append(chr(int(data[i + 1 : k], 8) & 0xFF))
                i = k
            else:
                out.append(nxt)
                i += 2
        elif c == "(":
            depth += 1
            out.append(c)
            i += 1
        elif c == ")":
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out), i


_NUM_RE = re.compile(r"[-+]?\d*\.?\d+")


def _content_spans(stream: bytes) -> list[tuple[float, float, str]]:
    """(y, x, text) spans shown by a content stream (Tm/Td/TD/Tj/TJ/')."""
    data = stream.decode("latin-1", "replace")
    spans: list[tuple[float, float, str]] = []
    x = y = 0.0
    leading = 0.0
    stack: list[str] = []  # operand tokens (numbers / names); strings handled inline
    pending: list[str] = []  # strings collected since the last operator
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in "(<":
            if c == "<" and data[i : i + 2] == "<<":
                i += 2  # dict open — not in our text streams, skip
                continue
            s, i = _parse_string_token(data, i)
            pending.append(s)
            continue
        if c.isspace():
            i += 1
            continue
        if c == "[" or c == "]":
            i += 1
            continue
        if c == "/":
            j = i + 1
            while j < n and (data[j].isalnum() or data[j] in "_."):
                j += 1
            stack.append(data[i:j])
            i = j
            continue
        m = _NUM_RE.match(data, i)
        if m and (c.isdigit() or c in "+-."):
            stack.append(m.group(0))
            i = m.end()
            continue
        # operator token
        j = i
        while j < n and not data[j].isspace() and data[j] not in "([</":
            j += 1
        op = data[i:j]
        i = j
        if op == "Tm" and len(stack) >= 6:
            x, y = float(stack[-2]), float(stack[-1])
        elif op in ("Td", "TD") and len(stack) >= 2:
            x += float(stack[-2])
            y += float(stack[-1])
            if op == "TD":
                leading = -float(stack[-1])
        elif op == "TL" and stack:
            leading = float(stack[-1])
        elif op == "T*":
            y -= leading
        elif op in ("Tj", "TJ", "'", '"'):
            if op in ("'", '"'):
                y -= leading
            text = "".join(pending)
            if text:
                spans.append((y, x, text))
        pending.clear()
        stack.clear()
    return spans


def pdf_extract_text(pdf: bytes) -> dict:
    """Reading-order text of a (subset-)PDF: page order from the page
    tree, in-page order by (y desc, x asc). Returns text + n_pages."""
    bodies = _object_bodies(pdf)
    page_order: list[int] = []
    page_like: dict[int, bytes] = {}
    for oid, body in bodies.items():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            m = _KIDS_RE.search(body)
            if m:
                page_order = [int(g) for g in _REF_RE.findall(m.group(1))]
        elif b"/Type /Page" in body or b"/Type/Page" in body:
            page_like[oid] = body
    if not page_order:
        page_order = sorted(page_like)
    parts: list[str] = []
    for pid in page_order:
        body = page_like.get(pid)
        if body is None:
            continue
        m = _CONTENTS_RE.search(body)
        if not m:
            continue
        stream = _stream_of(bodies.get(int(m.group(1)), b""))
        spans = _content_spans(stream)
        spans.sort(key=lambda s: (-s[0], s[1]))
        parts.extend(s[2] for s in spans)
    return {
        "text": normalize_text(" ".join(parts)),
        "n_pages": len(page_order),
    }
