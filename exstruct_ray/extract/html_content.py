"""DOM-heuristic main-content extraction (HTML boilerplate strip).

North-rule component ("HTML boilerplate strip, DOM heuristics"): the
reference engine has no HTML path (it is Excel/COM-only), so this module is
the from-scratch web-extraction analogue demanded by BASELINE.json's
north_rule, built on the published Boilerpipe/JusText *link-density* block
feature rather than tag-name knowledge.

Two halves, oracle-checkable end to end:

- ``synth_page(doc_id, text)`` — deterministic page synthesis wrapping a
  document's text in realistic link-dense boilerplate (nav bar, linked
  title, sidebar, inline ad, related links, footer). Same (doc_id, text)
  → same bytes; the main article is the text chunked into fixed-width
  paragraphs, so every expected output column is SQL-computable from the
  raw ``documents`` table.
- ``extract_main_content(html)`` — a block-segmenting HTML parser
  (stdlib ``html.parser``, from scratch) that classifies each rendered
  text block purely by link density (anchor chars / total chars, the
  Boilerpipe ``LinkDensity`` feature; Kohlschütter et al., WSDM 2010).
  It has NO knowledge of the generator's markup: nav/sidebar/footer/ad
  blocks are dropped because they are link-dense, not because of their
  tag names. Only *invisible* subtrees (script/style/head/template) are
  structurally skipped — that is visibility, not a content heuristic.

The classifier threshold is 0.33: a block survives iff less than a third
of its visible characters sit inside anchors. Real article paragraphs are
link-free (density 0); synthesized boilerplate is majority-anchor by
construction, mirroring the shape of real chrome (menus, tag clouds,
footers) that link-density classifiers were designed for.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .textdoc import normalize_text

# Words per synthesized article paragraph (drives the n_content_blocks
# oracle formula: ceil(word_count / PARA_WORDS)).
PARA_WORDS = 40

# Subtrees that never produce *visible* text. Deliberately excludes
# nav/header/footer/aside — those must fall to the density classifier.
_INVISIBLE = frozenset({"script", "style", "head", "template", "noscript"})

# Tags that terminate the current text block (HTML block-level elements).
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "nav", "header", "footer",
        "aside", "ul", "ol", "li", "table", "tr", "td", "th", "blockquote",
        "pre", "form", "h1", "h2", "h3", "h4", "h5", "h6", "br", "hr",
        "body", "html", "title",
    }
)

LINK_DENSITY_MAX = 1.0 / 3.0


# ---------------------------------------------------------------------------
# Page synthesis (deterministic; every derived quantity SQL-expressible)
# ---------------------------------------------------------------------------


def article_paragraphs(text: str) -> list[str]:
    """The main article body: words chunked into PARA_WORDS-word paragraphs."""
    words = (text or "").split()
    return [
        " ".join(words[i : i + PARA_WORDS])
        for i in range(0, len(words), PARA_WORDS)
    ]


def synth_page(doc_id: int, text: str) -> str:
    """Deterministic boilerplate-heavy page around a document's text."""
    esc = _html.escape
    title = f"Doc {doc_id}"
    n_nav = 4 + doc_id % 4
    nav = " ".join(
        f'<a href="/cat/{k}">Category {k} pages</a>' for k in range(n_nav)
    )
    sidebar = " ".join(
        f'<li><a href="/doc/{doc_id + k + 1}">Related doc {doc_id + k + 1}</a></li>'
        for k in range(3 + doc_id % 3)
    )
    ad = (
        '<div class="ad">Sponsored <a href="/buy">Buy the thing now</a> '
        '<a href="/deal">Deal of the day here</a></div>'
    )
    paras = article_paragraphs(text)
    body_parts: list[str] = []
    for i, p in enumerate(paras):
        body_parts.append(f"<p>{esc(p)}</p>")
        if i == 0 and len(paras) > 1 and doc_id % 2 == 0:
            body_parts.append(ad)  # mid-article ad: boilerplate inside <article>
    footer = (
        "<footer>&copy; 2026 <a href=\"/\">ExampleCorp</a> "
        '<a href="/privacy">Privacy policy</a> <a href="/terms">Terms of use</a>'
        "</footer>"
    )
    return (
        "<!DOCTYPE html>\n<html><head>"
        f"<title>{esc(title)}</title>"
        "<style>body{margin:0}</style>"
        "<script>var t=1;</script>"
        "</head><body>"
        f"<nav>{nav}</nav>"
        f'<header><h1><a href="/doc/{doc_id}">{esc(title)}</a></h1></header>'
        f'<aside><ul>{sidebar}</ul></aside>'
        f"<article>{''.join(body_parts)}</article>"
        f"{ad if doc_id % 5 == 0 else ''}"
        f"{footer}"
        "</body></html>"
    )


# ---------------------------------------------------------------------------
# DOM-heuristic extraction
# ---------------------------------------------------------------------------


@dataclass
class Block:
    """One rendered text block with its link-density accounting."""

    parts: list[str] = field(default_factory=list)
    total_chars: int = 0
    anchor_chars: int = 0

    def text(self) -> str:
        return normalize_text(" ".join(self.parts))

    def link_density(self) -> float:
        return self.anchor_chars / self.total_chars if self.total_chars else 0.0

    def is_content(self) -> bool:
        return bool(self.total_chars) and self.link_density() <= LINK_DENSITY_MAX


class _BlockParser(HTMLParser):
    """Segments the document into text blocks at block-level tag boundaries,
    tracking how many visible characters of each block sit inside <a>."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._invisible_depth = 0
        self._anchor_depth = 0
        self._current = Block()
        self.blocks: list[Block] = []
        self.title_parts: list[str] = []
        self._in_title = False

    def _flush(self) -> None:
        if self._current.parts:
            self.blocks.append(self._current)
        self._current = Block()

    def handle_starttag(self, tag, attrs):
        if tag in _INVISIBLE:
            self._invisible_depth += 1
        elif tag == "a":
            self._anchor_depth += 1
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _INVISIBLE and self._invisible_depth > 0:
            self._invisible_depth -= 1
        elif tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._invisible_depth or not data:
            return
        stripped = normalize_text(data)
        if not stripped:
            return
        self._current.parts.append(stripped)
        self._current.total_chars += len(stripped)
        if self._anchor_depth:
            self._current.anchor_chars += len(stripped)

    def close(self):
        super().close()
        self._flush()


def segment_blocks(html: str) -> tuple[str, list[Block]]:
    """(title, visible text blocks) of an HTML document."""
    parser = _BlockParser()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        # Poison-document policy: malformed markup degrades to whatever
        # was collected, never a task failure.
        parser._flush()
    return normalize_text(" ".join(parser.title_parts)), parser.blocks


def extract_main_content(html: str) -> dict:
    """Main content of a page via the link-density block classifier.

    Returns title, the concatenated main text, and kept/dropped block
    counts — everything the oracle re-derives from the raw documents
    table (paragraph chunking is deterministic).
    """
    title, blocks = segment_blocks(html)
    kept = [b for b in blocks if b.is_content()]
    return {
        "title": title,
        "main_text": normalize_text(" ".join(b.text() for b in kept)),
        "n_content_blocks": len(kept),
        "n_boilerplate_blocks": len(blocks) - len(kept),
    }
