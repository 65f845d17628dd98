"""Deterministic synthetic corpus generator (FIXTURES.md).

Everything derives from one integer seed — no fonts, no binary assets, no
external data. Produces the two input tables of the engine:

  documents(doc_id string,
            spans array<struct<kind string, text string, media_ref string,
                               offset int>>)       — input_hint schema
  media(media_ref string, width int, height int, image binary, n_lines int)

Media frames are SYNF-encoded numpy renderings: white page, dark horizontal
text-line bands made of per-character glyph boxes (gap 3 px closes under the
detector's morphological close ×2), vertical line gaps > line_th, occasional
paragraph gaps > para_th, and header/footer bands on ~20% of pages to
exercise the boilerplate strip. 5% of documents are media-heavy (>= 12 media
spans) with doc_ids rejection-sampled into bucket partitions {0,1}
(pmod(xxhash64(doc_id), 32)) to construct the skew tier.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import kernels as K
from .xxh import spark_bucket

SKEW_BUCKETS = (0, 1)
DEFAULT_NUM_BUCKETS = 32

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("image", pa.binary()),
        ("n_lines", pa.int32()),
    ]
)

def _stable_seed(*parts) -> int:
    """Process-stable RNG seed (python's hash() is randomized per process)."""
    key = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(key).digest()[:8], "little")


_GLYPH_W = 8
_GLYPH_GAP = 3
_LINE_H = 20
_MARGIN = 20


def _word_list(rng: np.random.Generator, n: int = 220) -> list[str]:
    chars = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(n):
        ln = int(rng.integers(3, 9))
        words.append("".join(chars[rng.integers(0, 26, size=ln)]))
    return words


def render_media(
    rng: np.random.Generator,
    width: int,
    height: int,
    header_footer: bool,
    blank: bool = False,
) -> tuple[np.ndarray, int]:
    """Render one synthetic page. Returns (uint8 (h,w) image, n_body_lines)."""
    img = np.full((height, width), 255, dtype=np.uint8)
    if blank:
        return img, 0
    n_lines = 0
    y = int(rng.integers(30, 50))
    max_chars_fit = max((width - 2 * _MARGIN) // (_GLYPH_W + _GLYPH_GAP), 2)
    while y + _LINE_H < height - 30 and n_lines < 8:
        n_chars = int(min(rng.integers(4, 18), max_chars_fit))
        # left-aligned like a real document (ragged right edge), with an
        # occasional paragraph indent — the layout asymmetry K16's
        # orientation classifier keys on
        indent = 2 * (_GLYPH_W + _GLYPH_GAP) if rng.random() < 0.2 else 0
        x = _MARGIN + indent
        if x + n_chars * (_GLYPH_W + _GLYPH_GAP) > width - _MARGIN:
            x = _MARGIN
            n_chars = min(n_chars, max_chars_fit)
        for _ in range(n_chars):
            shade = int(rng.integers(30, 70))
            img[y + 2 : y + _LINE_H - 2, x : x + _GLYPH_W] = shade
            x += _GLYPH_W + _GLYPH_GAP
        n_lines += 1
        gap = int(rng.integers(34, 52)) if rng.random() < 0.3 else int(rng.integers(14, 26))
        y += _LINE_H + gap
    if header_footer and height >= 120:
        img[6:14, _MARGIN : width - _MARGIN] = 50
        img[height - 14 : height - 6, _MARGIN : width - _MARGIN] = 50
    return img, n_lines


def gen_media(seed: int, n_media: int, max_side: int = 960) -> list[dict]:
    rows = []
    for i in range(n_media):
        ref = "m-" + hashlib.md5(f"synf-{seed}-{i}".encode()).hexdigest()[:16]
        rng = np.random.default_rng(_stable_seed(seed, "media", i))
        w = int(rng.integers(160, min(max_side, 960) + 1))
        h = int(rng.integers(120, min(max_side, 720) + 1))
        blank = i == 4  # fixed edge row: zero detectable lines
        if i == 5:  # fixed edge row: maximum size
            w, h = min(max_side, 960), min(max_side, 720)
        header_footer = rng.random() < 0.2 or i == 6
        img, n_lines = render_media(rng, w, h, header_footer, blank=blank)
        rows.append(
            {
                "media_ref": ref,
                "width": w,
                "height": h,
                "image": K.encode_synf(img),
                "n_lines": n_lines,
            }
        )
    return rows


_COMPANY_NAMES = [
    "Acme Corp", "Globex Gmbh", "Initech Ltd", "Umbrella Inc",
    "Stark Industries", "Wayne Enterprises", "Hooli Works", "Vandelay Trading",
]
_CURRENCIES = ["USD", "EUR", "GBP", "JPY", "CHF", "PLN"]


def _sentence(rng: np.random.Generator, words: list[str]) -> str:
    """Body sentence, occasionally ending in an invoice key-value line —
    one per ER-schema field (kernels.INVOICE_FIELD_RES) so field grouping
    has real positives to find."""
    n = int(rng.integers(3, 11))
    idx = rng.integers(0, len(words), size=n)
    s = " ".join(words[int(i)] for i in idx)
    r = rng.random()
    if r < 0.05:
        s += f" INV-{int(rng.integers(10000, 99999))}"
    elif r < 0.10:
        s += f" {int(rng.integers(2020, 2027))}-{int(rng.integers(1, 13)):02d}-{int(rng.integers(1, 29)):02d}"
    elif r < 0.15:
        s += f" TOTAL {int(rng.integers(1, 9999))}.{int(rng.integers(0, 100)):02d}"
    elif r < 0.18:
        s += f" VENDOR {_COMPANY_NAMES[int(rng.integers(0, len(_COMPANY_NAMES)))]}"
    elif r < 0.21:
        s += f" VENDOR-TAX-ID DE{int(rng.integers(0, 10**9)):09d}"
    elif r < 0.24:
        s += f" BUYER {_COMPANY_NAMES[int(rng.integers(0, len(_COMPANY_NAMES)))]}"
    elif r < 0.27:
        s += f" BUYER-TAX-ID FR{int(rng.integers(0, 10**9)):09d}"
    elif r < 0.30:
        s += f" SUBTOTAL {int(rng.integers(1, 9999))}.{int(rng.integers(0, 100)):02d}"
    elif r < 0.33:
        s += f" TAX {int(rng.integers(1, 999))}.{int(rng.integers(0, 100)):02d}"
    elif r < 0.36:
        s += f" CURRENCY {_CURRENCIES[int(rng.integers(0, len(_CURRENCIES)))]}"
    return s


def _skew_doc_id(seed: int, i: int, num_buckets: int) -> str:
    """Rejection-sample a doc_id landing in SKEW_BUCKETS under Spark's
    pmod(xxhash64(doc_id), num_buckets) — concentrates media-heavy docs into
    few bucket partitions to exercise salting (FIXTURES.md §1)."""
    j = 0
    while True:
        cand = f"doc{seed:04d}-{i:08d}-s{j}"
        if spark_bucket(cand, num_buckets) in SKEW_BUCKETS:
            return cand
        j += 1


def gen_documents(
    seed: int,
    n_docs: int,
    media_refs: list[str],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> list[dict]:
    words = _word_list(np.random.default_rng(seed))
    missing_ref = "m-" + "0" * 16  # referenced but absent from media table
    docs = []
    for i in range(n_docs):
        rng = np.random.default_rng(_stable_seed(seed, "doc", i))
        media_heavy = i % 20 == 7  # 5% skew tier
        doc_id = (
            _skew_doc_id(seed, i, num_buckets)
            if media_heavy
            else f"doc{seed:04d}-{i:08d}"
        )
        if i == 0:  # edge: empty spans
            spans: list[dict] = []
        elif i == 1:  # edge: text-only
            spans = [
                {"kind": "text", "text": _sentence(rng, words), "media_ref": ""}
                for _ in range(int(rng.integers(1, 6)))
            ]
        elif i == 2:  # edge: media-only
            spans = [
                {"kind": "media", "text": "", "media_ref": media_refs[int(rng.integers(0, len(media_refs)))]}
                for _ in range(int(rng.integers(1, 4)))
            ]
        elif i == 3:  # edge: duplicate media_ref within one doc
            ref = media_refs[int(rng.integers(0, len(media_refs)))]
            spans = [
                {"kind": "media", "text": "", "media_ref": ref},
                {"kind": "text", "text": _sentence(rng, words), "media_ref": ""},
                {"kind": "media", "text": "", "media_ref": ref},
            ]
        elif i == 4:  # edge: blank-image media (media row index 4)
            spans = [
                {"kind": "text", "text": _sentence(rng, words), "media_ref": ""},
                {"kind": "media", "text": "", "media_ref": media_refs[4]},
            ]
        elif i == 5:  # edge: max-size media (media row index 5)
            spans = [{"kind": "media", "text": "", "media_ref": media_refs[5]}]
        elif i == 6:  # edge: dangling media_ref (not in media table)
            spans = [
                {"kind": "media", "text": "", "media_ref": missing_ref},
                {"kind": "text", "text": _sentence(rng, words), "media_ref": ""},
            ]
        else:
            n_spans = int(min(rng.zipf(1.6), 24))
            if media_heavy:
                n_spans = max(n_spans, int(rng.integers(14, 22)))
            spans = []
            for _ in range(n_spans):
                want_media = rng.random() < (0.7 if media_heavy else 0.3)
                if want_media:
                    ref = media_refs[int(rng.integers(0, len(media_refs)))]
                    spans.append({"kind": "media", "text": "", "media_ref": ref})
                else:
                    spans.append(
                        {"kind": "text", "text": _sentence(rng, words), "media_ref": ""}
                    )
        for off, s in enumerate(spans):
            s["offset"] = off
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs


def gen_corpus(
    seed: int = 42,
    n_docs: int = 200,
    n_media: int | None = None,
    max_media_side: int = 960,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> tuple[list[dict], list[dict]]:
    if n_media is None:
        n_media = max(n_docs * 6 // 10, 8)
    media = gen_media(seed, n_media, max_side=max_media_side)
    docs = gen_documents(seed, n_docs, [m["media_ref"] for m in media], num_buckets)
    return docs, media


def write_corpus(out_dir: str, docs: list[dict], media: list[dict]) -> tuple[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    docs_path = os.path.join(out_dir, "documents.parquet")
    media_path = os.path.join(out_dir, "media.parquet")
    pq.write_table(
        pa.Table.from_pylist(docs, schema=DOCS_SCHEMA), docs_path, compression="snappy"
    )
    pq.write_table(
        pa.Table.from_pylist(media, schema=MEDIA_SCHEMA), media_path, compression="snappy"
    )
    return docs_path, media_path


def write_pdf_corpus(out_dir: str, docs: list[dict], media: list[dict]) -> str:
    """Render interleaved documents as actual PDF FILES — the raw-file
    form of the same corpus: text spans become native PDF text runs (one
    line per span, descending y so reading order reconstructs the span
    order), media spans embed the frame's full-resolution pixels as
    grayscale image XObjects (display size is immaterial; the payload
    carries the pixels bit-for-bit). Feeding these through
    sources.ingest reconstructs the two-table corpus: span kinds/texts/
    offsets identical, media content-addressed.

    Docs referencing media absent from the media table (the dangling-ref
    edge case) cannot be rendered and raise KeyError — filter them out
    first when building a round-trip fixture."""
    from .pdf import encode_pdf

    lookup = {m["media_ref"]: m["image"] for m in media}
    os.makedirs(out_dir, exist_ok=True)
    for d in docs:
        items = []
        y = 770.0
        for s in d["spans"]:
            if s["kind"] == "text":
                items.append(("text", 72, y, 10, s["text"]))
            else:
                img = K.decode_synf(lookup[s["media_ref"]])
                items.append(("image", 72, y - 10, 12, 10, img, "gray"))
            y -= 14.0
        with open(os.path.join(out_dir, f"{d['doc_id']}.pdf"), "wb") as f:
            f.write(encode_pdf([items]))
    return out_dir


def write_html_corpus(out_dir: str, docs: list[dict], media: list[dict]) -> str:
    """Render interleaved documents as actual HTML FILES — the web form
    of the same corpus: text spans become <p> paragraphs inside
    <main><article>, media spans become <img> data: URIs carrying the
    frame payload bit-for-bit, and every page gets the chrome a real
    site would have (nav/breadcrumb/sidebar/footer) so the round-trip
    also proves the boilerplate strip removes exactly the chrome and
    nothing else. Feeding these through sources.ingest_html
    reconstructs the two-table corpus: span kinds/texts/offsets
    identical, media content-addressed.

    Docs referencing media absent from the media table (the dangling-ref
    edge case) embed nothing and raise KeyError — filter them out first,
    as for write_pdf_corpus."""
    import base64
    from html import escape

    lookup = {m["media_ref"]: m["image"] for m in media}
    os.makedirs(out_dir, exist_ok=True)
    for d in docs:
        body = []
        for s in d["spans"]:
            if s["kind"] == "text":
                body.append(f"<p>{escape(s['text'])}</p>")
            else:
                b64 = base64.b64encode(lookup[s["media_ref"]]).decode()
                body.append(f'<img src="data:application/octet-stream;base64,{b64}">')
        page = (
            "<!doctype html><html><head><title>doc</title>"
            "<style>p{margin:0}</style></head><body>"
            '<header><nav><a href="/">Home</a> <a href="/all">Archive</a></nav>'
            "</header>"
            '<div class="breadcrumb"><a href="/">Home</a> &gt; doc</div>'
            f"<main><article>{''.join(body)}</article></main>"
            '<aside class="sidebar"><a href="/r1">Related</a></aside>'
            "<footer>Copyright Example Corp. All rights reserved.</footer>"
            "</body></html>"
        )
        with open(os.path.join(out_dir, f"{d['doc_id']}.html"), "w") as f:
            f.write(page)
    return out_dir


def ensure_corpus(
    out_dir: str, seed: int = 42, n_docs: int = 200, max_media_side: int = 960
) -> tuple[str, str]:
    """Generate-once helper: reuses an existing corpus directory."""
    docs_path = os.path.join(out_dir, "documents.parquet")
    media_path = os.path.join(out_dir, "media.parquet")
    if os.path.exists(docs_path) and os.path.exists(media_path):
        return docs_path, media_path
    docs, media = gen_corpus(seed=seed, n_docs=n_docs, max_media_side=max_media_side)
    return write_corpus(out_dir, docs, media)
