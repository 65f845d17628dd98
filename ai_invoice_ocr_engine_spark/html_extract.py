"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north rule's front-end names "HTML boilerplate strip, PDF/layout
parse, DOM heuristics" as the main-content extraction surface. pdf.py
covers the PDF half; this module covers HTML: raw page bytes → the
engine's interleaved span model (kept text blocks + embedded images in
document order), with navigation / sidebar / footer / comment / ad
boilerplate stripped.

The classifier is a deterministic hybrid of two published approaches
(public knowledge, no code reused):

* boilerpipe's densitometric features (Kohlschütter, Fankhauser &
  Nejdl, "Boilerplate Detection using Shallow Text Features", WSDM
  2010): per-block word count and link density — blocks whose anchor
  text dominates are navigation, not content.
* Arc90 readability's class/id signals (the widely-republished
  unlikelyCandidates / okMaybeItsACandidate regexes): "sidebar",
  "comment", "banner", ... mark a subtree boilerplate unless a positive
  token ("article", "content", "main", ...) co-occurs.

Every rule is local and order-free — the same block always classifies
the same way, so a 10^12-document run is rerun-stable and the classifier
runs inside one Arrow batch with no cross-document state.

Parsing builds on the stdlib ``html.parser.HTMLParser`` tokenizer
(entity decoding via ``convert_charrefs``, script/style CDATA handling)
with a forgiving tree builder on top: void elements never nest, an
unmatched close tag pops to the nearest open ancestor of that name or
is ignored, EOF closes everything — real-web HTML must never crash the
job. Error contract matches pdf_spans: undecodable/corrupt input raises
ValueError, never a bare structural exception.

Scale posture: pure per-document string work — no shuffle, no state.
``strip_html`` is a single scalar pandas_udf (one Arrow crossing);
``sources.ingest.ingest_html`` reuses the PDF ingest plumbing (one
mapInPandas crossing, content-addressed media dedup). External <img>
URLs are recorded as payload-less media refs (``u-<md5(url)>``): a
fetch stage is out of scope here (no network in the parse job) and
would precede ingest at production scale.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import re
from html.parser import HTMLParser

__all__ = [
    "html_blocks",
    "extract_main_text",
    "html_spans",
    "strip_html",
]

# ---------------------------------------------------------------------------
# tree building

#: HTML void elements — never pushed on the open-element stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

#: elements whose entire subtree is never content (structure, metadata,
#: embedded code, form chrome). <header>/<nav>/<aside>/<footer> are the
#: HTML5 sectioning boilerplate; forms/selects are chrome, not prose.
_DROP_TAGS = frozenset(
    (
        "script style noscript template head title meta link base "
        "nav aside footer header form select option optgroup button "
        "datalist iframe object svg canvas map"
    ).split()
)

#: block-level boundaries — starting one of these flushes the current
#: text block. (Inline elements — a, b, i, span, em, code, ... — flow
#: into the enclosing block.)
_BLOCK_TAGS = frozenset(
    (
        "p div section article main blockquote pre li ul ol dl dt dd "
        "table tr thead tbody tfoot caption figure figcaption "
        "h1 h2 h3 h4 h5 h6 br hr address fieldset legend details summary"
    ).split()
)

#: table cells join into their row's block with this separator instead of
#: flushing — an invoice line ("Widget | 2 | 42.00") is one unit of
#: content, and per-cell blocks would fall to the short-block rule.
_CELL_TAGS = frozenset(("td", "th"))
_CELL_SEP = " | "

_HEADINGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))

#: Arc90-readability-style class/id signals. A negative hit on any
#: ancestor marks the subtree boilerplate UNLESS a positive token
#: co-occurs in the same class/id string (the okMaybeItsACandidate
#: escape hatch).
_NEGATIVE_RE = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|menu|nav|remark|rss|"
    r"shoutbox|sidebar|side-bar|sponsor|ad-break|agegate|pagination|pager|"
    r"popup|cookie|banner|breadcrumb|related|share|social|widget|promo|"
    r"masthead|subscribe|newsletter",
    re.I,
)
_POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|post|text|blog|story",
    re.I,
)

#: boilerpipe's link-density threshold: blocks whose anchor text exceeds
#: this fraction are navigation/link lists.
_LINK_DENSITY_MAX = 0.33

#: minimum words for a body block to be content on its own; shorter
#: blocks survive only as headings or sentence-punctuated fragments.
_MIN_WORDS = 3

_WS_RE = re.compile(r"\s+")
_SENTENCE_END = (".", "!", "?", ":", ";", "。", "！", "？")


class _Node:
    __slots__ = ("tag", "attrs", "children", "boiler", "reason")

    def __init__(self, tag: str, attrs: dict, boiler: bool, reason: str):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str (text)
        self.boiler = boiler  # subtree-level boilerplate verdict
        self.reason = reason


def _class_id_verdict(attrs: dict) -> str:
    """'' (neutral) | 'neg' — negative class/id signal without a
    co-occurring positive escape."""
    blob = " ".join(
        v for k, v in attrs.items() if k in ("class", "id", "role") and v
    )
    if not blob:
        return ""
    if _NEGATIVE_RE.search(blob) and not _POSITIVE_RE.search(blob):
        return "neg"
    return ""


class _TreeBuilder(HTMLParser):
    """Forgiving DOM-lite builder over the stdlib tokenizer."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, False, "")
        self.stack = [self.root]

    # -- element events -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        adict = {k: (v or "") for k, v in attrs}
        parent = self.stack[-1]
        boiler = parent.boiler
        reason = parent.reason
        if not boiler:
            if tag in _DROP_TAGS:
                boiler, reason = True, f"tag:{tag}"
            elif _class_id_verdict(adict) == "neg":
                boiler, reason = True, "class"
        node = _Node(tag, adict, boiler, reason)
        parent.children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        # pop to the nearest open ancestor of this name; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments / doctype / CDATA / PIs: ignored
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def unknown_decl(self, data):
        pass

    def handle_pi(self, data):
        pass


def _parse_tree(text: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# block segmentation + classification


class Block:
    """One segmented unit in document order: a text block or an image."""

    __slots__ = (
        "kind", "text", "src", "alt", "tag", "words",
        "link_density", "cells", "kept", "reason",
    )

    def __init__(self, kind, text="", src="", alt="", tag=""):
        self.kind = kind  # 'text' | 'media'
        self.text = text
        self.src = src
        self.alt = alt
        self.tag = tag  # nearest enclosing block tag at creation
        self.words = 0
        self.link_density = 0.0
        self.cells = 0  # table cells merged into this block (tr rows)
        self.kept = False
        self.reason = ""


def _segment(root: _Node) -> list[Block]:
    blocks: list[Block] = []
    cur_parts: list[str] = []
    cur_link_chars = [0]
    cur_tag = [""]
    cur_boiler = [False]
    cur_reason = [""]
    cur_cells = [0]

    def flush():
        raw = "".join(cur_parts)
        text = _WS_RE.sub(" ", raw).strip()
        if text:
            b = Block("text", text=text, tag=cur_tag[0])
            b.words = len(text.split())
            b.link_density = min(1.0, cur_link_chars[0] / max(len(text), 1))
            b.cells = cur_cells[0]
            if cur_boiler[0]:
                b.kept, b.reason = False, cur_reason[0]
            blocks.append(b)
        cur_parts.clear()
        cur_link_chars[0] = 0
        cur_cells[0] = 0

    def walk(node: _Node, in_link: bool):
        for child in node.children:
            if isinstance(child, str):
                if node.boiler and not cur_boiler[0] and not cur_parts:
                    # text directly inside a dropped subtree opens a
                    # block carrying that verdict
                    cur_boiler[0], cur_reason[0] = True, node.reason
                cur_parts.append(child)
                if in_link:
                    cur_link_chars[0] += len(_WS_RE.sub(" ", child).strip())
                continue
            if child.tag == "img":
                flush()
                b = Block(
                    "media",
                    src=(child.attrs.get("src") or "").strip(),
                    alt=(child.attrs.get("alt") or "").strip(),
                    tag=cur_tag[0],
                )
                if child.boiler:
                    b.reason = child.reason
                else:
                    b.kept = True
                blocks.append(b)
                continue
            if child.tag in _CELL_TAGS:
                # cells join their row's block with a separator — an
                # invoice line is one content unit, not N short blocks.
                # A cell individually condemned (class/id signal) simply
                # contributes nothing to its row.
                if child.boiler and not cur_boiler[0]:
                    continue
                if cur_cells[0] > 0:
                    cur_parts.append(_CELL_SEP)
                cur_cells[0] += 1
                walk(child, in_link)
                continue
            if child.tag in _BLOCK_TAGS:
                flush()
                prev_tag, prev_b, prev_r = cur_tag[0], cur_boiler[0], cur_reason[0]
                cur_tag[0] = child.tag
                cur_boiler[0] = child.boiler
                cur_reason[0] = child.reason
                walk(child, in_link)
                flush()
                cur_tag[0], cur_boiler[0], cur_reason[0] = prev_tag, prev_b, prev_r
            else:
                if child.boiler and not node.boiler:
                    if cur_cells[0] > 0:
                        # inside a table row: contribute nothing rather
                        # than flushing (a flush would split the row)
                        continue
                    # inline boilerplate (e.g. <span class="sponsor">):
                    # flush around it so surrounding prose stays clean
                    flush()
                    prev_b, prev_r = cur_boiler[0], cur_reason[0]
                    cur_boiler[0], cur_reason[0] = True, child.reason
                    walk(child, in_link or child.tag == "a")
                    flush()
                    cur_boiler[0], cur_reason[0] = prev_b, prev_r
                else:
                    walk(child, in_link or child.tag == "a")
    walk(root, False)
    flush()
    return blocks


def _classify(blocks: list[Block]) -> list[Block]:
    for b in blocks:
        if b.kind == "media":
            continue  # verdict set during segmentation (ancestor rules)
        if b.reason:  # already condemned by a subtree rule
            continue
        if b.link_density > _LINK_DENSITY_MAX:
            b.kept, b.reason = False, "link_density"
        elif b.tag in _HEADINGS:
            b.kept = any(c.isalnum() for c in b.text)
            if not b.kept:
                b.reason = "empty_heading"
        elif b.cells >= 2:
            # a multi-cell table row is tabular data (invoice line items)
            # — exempt from the word minimum; link density above still
            # catches link-farm layout tables
            b.kept = any(c.isalnum() for c in b.text)
            if not b.kept:
                b.reason = "empty_row"
        elif b.words >= _MIN_WORDS or b.text.endswith(_SENTENCE_END):
            b.kept = True
        else:
            b.kept, b.reason = False, "short"
    return blocks


# ---------------------------------------------------------------------------
# public API


def _decode_html(data) -> str:
    """bytes|str → str. Charset from BOM or <meta charset>/http-equiv
    sniff over the first 2 KiB; default utf-8. errors='replace' — a bad
    byte must not kill a 10^12-document job."""
    if isinstance(data, str):
        return data
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError(f"html input must be str or bytes, got {type(data).__name__}")
    raw = bytes(data)
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8", "replace")
    if raw.startswith((b"\xff\xfe", b"\xfe\xff")):
        return raw.decode("utf-16", "replace")
    head = raw[:2048].decode("latin-1", "replace")
    m = re.search(r"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""", head, re.I)
    codec = (m.group(1).lower() if m else "utf-8")
    try:
        return raw.decode(codec, "replace")
    except LookupError:
        return raw.decode("utf-8", "replace")


def html_blocks(data) -> list[Block]:
    """Parse + segment + classify. Returns every block in document order
    with its verdict (``kept``) and, for dropped blocks, the rule that
    fired (``reason``: tag:<name> | class | link_density | short |
    empty_heading) — the inspectable form the strip/span APIs consume."""
    try:
        return _classify(_segment(_parse_tree(_decode_html(data))))
    except (ValueError, NotImplementedError):
        raise
    except Exception as e:  # stdlib parser edge: fail loud, typed
        raise ValueError(f"corrupt HTML: {type(e).__name__}: {e}") from e


def extract_main_text(data) -> str:
    """Main content as newline-joined kept text blocks."""
    return "\n".join(b.text for b in html_blocks(data) if b.kept and b.kind == "text")


_DATA_URI_RE = re.compile(r"^data:([!-~]+?)?(;base64)?,", re.I)


def html_spans(data) -> tuple[list[dict], dict[str, bytes]]:
    """Parse an HTML page into the engine's interleaved span model.

    Returns (spans, media): spans is a list of dicts (kind 'text' |
    'image', text, media_ref, offset) — kept text blocks and kept <img>
    elements in document order, dense offsets; media maps media_ref →
    payload bytes for images whose src is a data: URI. External URLs
    (http/https/relative) appear as payload-less spans with media_ref
    ``u-<md5(url) 16 hex>`` — fetching is a prior pipeline stage, not
    the parser's job. A malformed base64 data: URI raises ValueError
    (ingest's on_bad='skip' quarantines the document at scale).

    Mirrors pdf.pdf_spans' contract so sources.ingest can reuse one
    plumbing path for both front-ends."""
    spans: list[dict] = []
    media: dict[str, bytes] = {}
    for b in html_blocks(data):
        if not b.kept:
            continue
        if b.kind == "text":
            spans.append(
                {"kind": "text", "text": b.text, "media_ref": "", "offset": len(spans)}
            )
            continue
        src = b.src
        if not src:
            continue
        m = _DATA_URI_RE.match(src)
        if m:
            payload_part = src[m.end():]
            if m.group(2):  # ;base64
                try:
                    payload = base64.b64decode(
                        re.sub(r"\s+", "", payload_part), validate=True
                    )
                except (binascii.Error, ValueError) as e:
                    raise ValueError(f"malformed data URI in <img>: {e}") from e
            else:
                from urllib.parse import unquote_to_bytes

                payload = unquote_to_bytes(payload_part)
            ref = "d-" + hashlib.md5(payload).hexdigest()[:16]
            media[ref] = payload
        else:
            ref = "u-" + hashlib.md5(src.encode("utf-8")).hexdigest()[:16]
        spans.append(
            {"kind": "image", "text": "", "media_ref": ref, "offset": len(spans)}
        )
    return spans, media


def strip_html(df, col: str = "text", out_col: str = "main_text"):
    """DataFrame form: add ``out_col`` = main content of the HTML in
    ``col``. One scalar pandas_udf (single Arrow crossing, no shuffle,
    whole pipeline stays a narrow map stage)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pyspark's hint resolver can't evaluate here
    _strip = F.pandas_udf(
        lambda s: s.map(lambda v: None if v is None else extract_main_text(v)),
        StringType(),
    )
    assert pd is not None  # imported for the UDF's runtime dependency

    return df.withColumn(out_col, _strip(F.col(col)))
