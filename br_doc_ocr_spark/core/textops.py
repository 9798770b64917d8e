"""Main-content extraction over raw turn payloads (HTML / pseudo-PDF / prose).

This is the graft analog of the reference's per-image preprocessing stack
(``/root/reference/src/br_doc_ocr/services/preprocessing.py:25-357`` — load,
normalize, orient, crop): instead of pixels we normalize *text payloads*:

- HTML boilerplate stripping via DOM heuristics (text density, link density,
  tag-path boilerplate classes — the Readability/jusText family of rules,
  public literature: Kohlschütter et al. 2010 "Boilerplate Detection using
  Shallow Text Features").
- pseudo-PDF layout reconstruction: line records ``[x0,y0,x1,y1] text`` are
  clustered into columns by x-gap and re-serialized in reading order
  (column-major, then top-to-bottom) — the analog of
  ``preprocessing.py:204-325`` (detect/crop/reorder regions).
- prose passes through trimmed.

Everything here is deterministic, pure stdlib (html.parser + re), and shared
between the Spark Arrow UDF and the golden oracle.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# ---------------------------------------------------------------------------
# Payload kind detection
# ---------------------------------------------------------------------------

_PDF_LINE = re.compile(
    r"^\[\s*(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)\s*\]\s?(.*)$"
)
_HTML_HINT = re.compile(r"<(?:html|body|div|p|nav|footer|header|span|a|ul|table)\b", re.IGNORECASE)

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_PROSE = "prose"


def detect_payload_kind(text: str) -> str:
    """Classify a payload as html / pdf / prose.

    Graft analog of the reference's document-type classification entry point
    (``services/classification.py:44-120``) with a deterministic rule: a
    payload is ``pdf`` when its first non-empty line is a bbox record, ``html``
    when an HTML tag hint appears, else ``prose``.
    """
    if not text:
        return KIND_PROSE
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        if _PDF_LINE.match(s):
            return KIND_PDF
        break
    if _HTML_HINT.search(text):
        return KIND_HTML
    return KIND_PROSE


# ---------------------------------------------------------------------------
# HTML boilerplate stripping
# ---------------------------------------------------------------------------

# Subtrees that are boilerplate by construction.
_BOILERPLATE_TAGS = frozenset({
    "nav", "header", "footer", "aside", "script", "style", "noscript",
    "form", "button", "iframe", "svg", "template",
})
# id/class tokens that mark boilerplate containers.
_BOILERPLATE_HINTS = frozenset({
    "nav", "navbar", "menu", "sidebar", "footer", "header", "ad", "ads",
    "advert", "banner", "cookie", "popup", "social", "share", "comment",
    "comments", "breadcrumb", "pagination", "related", "promo", "widget",
})
# Elements that delimit text blocks.
_BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "li", "td", "th", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "tr", "ul", "ol", "table",
    "body", "html", "br",
})

_WS = re.compile(r"\s+")
_HINT_SPLIT = re.compile(r"[\s_\-]+")


class _BlockCollector(HTMLParser):
    """Stream HTML into text blocks annotated with boilerplate depth and
    link-text share — the shallow features the scorer consumes."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._stack: list[tuple[str, bool]] = []  # (tag, is_boiler)

    @staticmethod
    def _is_boiler(tag: str, attrs: list[tuple[str, str | None]]) -> bool:
        if tag in _BOILERPLATE_TAGS:
            return True
        for key, value in attrs:
            if key in ("id", "class", "role") and value:
                for token in _HINT_SPLIT.split(value.lower()):
                    if token in _BOILERPLATE_HINTS:
                        return True
        return False

    def _flush(self) -> None:
        raw = "".join(self._buf)
        text = _WS.sub(" ", raw).strip()
        self._buf.clear()
        link_chars = min(self._link_chars, len(raw))
        self._link_chars = 0
        if text:
            self.blocks.append({
                "text": text,
                "boiler": self._boiler_depth > 0,
                "link_share": link_chars / max(len(raw.strip()), 1),
            })

    def handle_starttag(self, tag: str, attrs) -> None:
        boiler = self._is_boiler(tag, attrs)
        # Flush on block boundaries AND on boiler-state changes, so every
        # buffered segment carries a uniform boilerplate attribution.
        if tag in _BLOCK_TAGS or boiler:
            self._flush()
        self._stack.append((tag, boiler))
        if boiler:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, -1, -1):
            t, boiler = self._stack[i]
            if t == tag:
                if tag in _BLOCK_TAGS or boiler:
                    self._flush()
                del self._stack[i]
                if boiler:
                    self._boiler_depth -= 1
                break
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1

    def handle_data(self, data: str) -> None:
        self._buf.append(data)
        if self._link_depth > 0:
            self._link_chars += len(data.strip())

    def close(self) -> None:
        super().close()
        self._flush()


# Scoring thresholds (Kohlschütter-style shallow features, tuned for
# determinism not ML parity): a block is content when it is outside any
# boilerplate subtree, long enough, and not link-dominated.
MIN_BLOCK_CHARS = 12
MAX_LINK_SHARE = 0.5


def strip_html(html: str) -> str:
    """Return the main text content of an HTML payload, boilerplate removed.

    Blocks inside nav/header/footer/aside/script/style/form subtrees (or
    containers whose id/class carries a boilerplate token) are dropped; the
    survivors are kept when ``len >= MIN_BLOCK_CHARS`` and link-text share
    ``< MAX_LINK_SHARE``; short survivors are kept only when adjacent to a
    kept block is NOT attempted — the rule stays local and therefore
    embarrassingly parallel. Blocks join with a single newline.
    """
    parser = _BlockCollector()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Malformed markup: degrade to tag-stripped text (never raise — the
        # batch executor's per-row error channel handles truly broken rows,
        # mirroring cli/batch.py:155-160).
        return _WS.sub(" ", re.sub(r"<[^>]*>", " ", html)).strip()
    kept = [
        b["text"] for b in parser.blocks
        if not b["boiler"]
        and len(b["text"]) >= MIN_BLOCK_CHARS
        and b["link_share"] < MAX_LINK_SHARE
    ]
    return "\n".join(kept)


# ---------------------------------------------------------------------------
# Pseudo-PDF layout reconstruction
# ---------------------------------------------------------------------------

# Minimum horizontal gap (in the synthetic bbox coordinate space) between the
# start-x of two lines for them to belong to different columns.
COLUMN_GAP = 150.0


def parse_pdf_layout(text: str) -> str:
    """Reconstruct reading order from ``[x0,y0,x1,y1] line text`` records.

    Lines are clustered into columns on sorted distinct x0 (new column when
    the gap exceeds ``COLUMN_GAP``), then emitted column-major ordered by
    (y0, x0) — the standard multi-column reading order. Non-bbox lines pass
    through in place (appended after the reconstructed body, preserving their
    relative order), so partially-marked payloads degrade gracefully.
    """
    records: list[tuple[float, float, str]] = []  # (x0, y0, text)
    stray: list[str] = []
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        m = _PDF_LINE.match(s)
        if m:
            records.append((float(m.group(1)), float(m.group(2)), m.group(5)))
        else:
            stray.append(s)
    if not records:
        return "\n".join(stray)

    xs = sorted({x for x, _, _ in records})
    col_start: dict[float, int] = {}
    col = 0
    prev = None
    for x in xs:
        if prev is not None and x - prev > COLUMN_GAP:
            col += 1
        col_start[x] = col
        prev = x

    ordered = sorted(records, key=lambda r: (col_start[r[0]], r[1], r[0]))
    out = [t for _, _, t in ordered]
    out.extend(stray)
    return "\n".join(out)


def extract_main_content(text: str, kind: str | None = None) -> tuple[str, str]:
    """Dispatch a payload to its extractor → (kind, extracted_text).

    The graft's fused preprocess stage (reference analog:
    ``preprocessing.py:328-357`` composing load→normalize→resize→orient into
    one pass) — one function call per payload inside the Arrow batch.
    """
    if text is None:
        return KIND_PROSE, ""
    k = kind or detect_payload_kind(text)
    if k == KIND_HTML:
        return k, strip_html(text)
    if k == KIND_PDF:
        return k, parse_pdf_layout(text)
    return KIND_PROSE, text.strip()
