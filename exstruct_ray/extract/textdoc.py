"""Interleaved text + media document extraction (non-workbook documents).

The corpus row format (doc_id, spans) carries any interleaved document,
not only OOXML part bundles. Documents without a workbook part route here:
text spans pass through under deterministic main-content normalization,
HTML spans get boilerplate stripped to visible text (stdlib html.parser —
script/style/head/nav/template dropped), and media spans keep their
media_ref as opaque references. Ordering follows the input span order;
output offsets are dense.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS_RE = re.compile(r"(?a)\s+")

# Elements whose subtree is never main content.
_SKIP_ELEMENTS = frozenset(
    {"script", "style", "head", "template", "noscript", "nav", "header", "footer"}
)
_HTML_SNIFF_RE = re.compile(r"(?is)^\s*(?:<!doctype\s+html|<html[\s>])")


def normalize_text(text: str) -> str:
    """Canonical main-content text form: whitespace runs collapse to one
    space, leading/trailing stripped — exactly
    ``trim(regexp_replace(text, '\\s+', ' ', 'g'))`` in the SQL oracle."""
    return _WS_RE.sub(" ", text or "").strip()


class _MainTextParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_ELEMENTS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_ELEMENTS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.parts.append(data)


def html_main_text(html: str) -> str:
    """Visible main text of an HTML document (boilerplate stripped)."""
    parser = _MainTextParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        # Malformed markup degrades to whatever was collected — never a
        # task failure (the poison-document policy).
        pass
    return normalize_text(" ".join(parser.parts))


def looks_like_html(kind: str, text: str) -> bool:
    return kind == "html" or bool(_HTML_SNIFF_RE.match(text or ""))


def extract_interleaved_spans(
    kinds: list[str],
    texts: list[str],
    media_refs: list[str],
    html_strategy: str = "visible",
) -> list[tuple[str, str, str, int]]:
    """(kind, text, media_ref, offset) output spans for a text+media doc.

    ``html_strategy="density"`` routes HTML spans through the link-density
    block classifier (html_content.py) instead of the visible-text strip —
    the boilerplate-dropping main-content mode.
    """
    if html_strategy == "density":
        from .html_content import extract_main_content

        def strip(html: str) -> str:
            return extract_main_content(html)["main_text"]

    else:
        strip = html_main_text
    out: list[tuple[str, str, str, int]] = []
    for kind, text, ref in zip(kinds, texts, media_refs):
        kind = kind or ""
        text = text or ""
        ref = ref or ""
        if kind == "media" or (ref and not text):
            out.append(("media", "", ref, len(out)))
        elif looks_like_html(kind, text):
            out.append(("text", strip(text), ref, len(out)))
        else:
            out.append(("text", normalize_text(text), ref, len(out)))
    return out
