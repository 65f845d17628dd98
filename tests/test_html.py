"""HTML main-content extraction: boilerplate strip + DOM heuristics.

Covers the north rule's named HTML front-end: block segmentation and
classification (tag / class-id / link-density / length rules), entity
decoding, script/style/comment exclusion, malformed-markup tolerance,
charset sniffing, the interleaved span model with data-URI media
extraction, and the Spark ingest path (one mapInPandas crossing,
content-addressed media dedup, driver-parse parity)."""

import base64

import numpy as np
import pytest

from ai_invoice_ocr_engine_spark.html_extract import (
    extract_main_text,
    html_blocks,
    html_spans,
    strip_html,
)
from ai_invoice_ocr_engine_spark.sources.ingest import (
    ingest_html,
    parse_html_doc,
    split_ingest,
)

PAGE = b"""<!doctype html>
<html><head><title>Site</title><style>p{color:red}</style>
<script>var x = "<p>not content</p>";</script></head>
<body>
<header><h1>Site name</h1><nav><a href=/>Home</a> <a href=/b>Blog</a></nav></header>
<div class="breadcrumb"><a href=/>Home</a> &gt; <a href=/b>Blog</a></div>
<main><article class="post">
<h1>The Actual Headline</h1>
<p>First paragraph of the article body, which is long enough to count. It has a <a href="x">link</a> inline.</p>
<p>Second paragraph &amp; some entities like &#65;BC here.</p>
<p>Third paragraph concluding the piece.</p>
</article></main>
<aside class="sidebar"><ul><li><a href=1>Related one</a></li><li><a href=2>Related two</a></li></ul></aside>
<div id="comments"><p>First comment text that is reasonably long too.</p></div>
<footer>Copyright 2026 Example Corp. All rights reserved.</footer>
</body></html>"""

EXPECTED_MAIN = (
    "The Actual Headline\n"
    "First paragraph of the article body, which is long enough to count. "
    "It has a link inline.\n"
    "Second paragraph & some entities like ABC here.\n"
    "Third paragraph concluding the piece."
)


def test_main_content_realistic_page():
    assert extract_main_text(PAGE) == EXPECTED_MAIN


def test_boilerplate_reasons():
    reasons = {b.text[:12]: b.reason for b in html_blocks(PAGE) if not b.kept}
    assert reasons["Site name"] == "tag:header"
    assert reasons["Home > Blog"] == "class"  # breadcrumb class/id signal
    assert reasons["Related one"] == "tag:aside"
    assert reasons["First commen"] == "class"  # id="comments"
    assert reasons["Copyright 20"] == "tag:footer"


def test_positive_class_escapes_negative():
    # Arc90's okMaybeItsACandidate: "article" co-occurring rescues "comment"
    page = '<div class="comment-article"><p>Long enough paragraph body here.</p></div>'
    assert extract_main_text(page) == "Long enough paragraph body here."


def test_link_density_drops_link_farm():
    page = (
        "<p>Real sentence with enough words to be kept as content here.</p>"
        '<p><a href=1>one</a> <a href=2>two</a> <a href=3>three</a></p>'
    )
    blocks = [b for b in html_blocks(page) if b.kind == "text"]
    assert blocks[0].kept
    assert not blocks[1].kept and blocks[1].reason == "link_density"


def test_short_block_rules():
    blocks = {
        b.text: b for b in html_blocks(
            "<p>tiny</p><p>Ends with punctuation.</p><h2>Heading</h2><p>x y z</p>"
        )
    }
    assert not blocks["tiny"].kept and blocks["tiny"].reason == "short"
    assert blocks["Ends with punctuation."].kept  # sentence end rescues
    assert blocks["Heading"].kept  # headings exempt from length rule
    assert blocks["x y z"].kept  # 3 words meets the minimum


def test_malformed_html_never_crashes():
    cases = [
        b"<p>unclosed <b>bold <p>next para with enough words here ok",
        b"</div></p>stray closers<p>Real paragraph with plenty of words.</p>",
        b"<b><i>misnested</b></i><p>Real paragraph with plenty of words.</p>",
        b"< not a tag at all > just text with enough words to keep here",
        b"",
        b"\x00\xff\xfe binary garbage not html at all \x9c\x81",
    ]
    for c in cases:
        html_blocks(c)  # must not raise
    assert "Real paragraph with plenty of words." in extract_main_text(cases[1])


def test_charset_sniff_latin1():
    page = '<meta charset="iso-8859-1"><p>caf\xe9 costs 3 euros today.</p>'.encode(
        "latin-1"
    )
    assert "café costs 3 euros today." == extract_main_text(page)


def test_input_type_contract():
    with pytest.raises(ValueError):
        html_blocks(12345)


def _png_data_uri():
    from ai_invoice_ocr_engine_spark.kernels import encode_png

    img = np.full((8, 8), 200, dtype=np.uint8)
    img[2:6, 2:6] = 30
    payload = encode_png(img)
    return payload, "data:image/png;base64," + base64.b64encode(payload).decode()


def test_spans_interleave_data_uri_media():
    payload, uri = _png_data_uri()
    page = (
        f'<article><p>Paragraph before the embedded figure image.</p>'
        f'<img src="{uri}"><p>Paragraph after the embedded figure image.</p>'
        f'<img src="https://cdn.example.com/x.png"></article>'
    )
    spans, media = html_spans(page)
    assert [s["kind"] for s in spans] == ["text", "image", "text", "image"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]
    # data URI: payload content-addressed and present
    assert spans[1]["media_ref"].startswith("d-")
    assert media[spans[1]["media_ref"]] == payload
    # external URL: payload-less u- ref
    assert spans[3]["media_ref"].startswith("u-")
    assert spans[3]["media_ref"] not in media


def test_malformed_data_uri_raises_valueerror():
    with pytest.raises(ValueError):
        html_spans('<img src="data:image/png;base64,@@notb64@@">')


def test_boiler_img_dropped():
    page = '<header><img src="logo.png"></header><p>Kept paragraph with words.</p>'
    spans, _ = html_spans(page)
    assert [s["kind"] for s in spans] == ["text"]


def test_parse_html_doc_content_addresses_media():
    payload, uri = _png_data_uri()
    page = (
        f'<p>Duplicated image appears twice in this document body.</p>'
        f'<img src="{uri}"><img src="{uri}">'
    ).encode()
    spans, media = parse_html_doc("d1", page)
    assert [s["kind"] for s in spans] == ["text", "media", "media"]
    assert spans[1]["media_ref"] == spans[2]["media_ref"]
    assert spans[1]["media_ref"].startswith("m-")  # ingest content hash
    assert len(media) == 1 and media[0]["image"] == payload


def test_ingest_html_spark(spark):
    payload, uri = _png_data_uri()
    pages = {
        "h1": f'<main><p>Document one body with enough words to keep.</p>'
              f'<img src="{uri}"></main>'.encode(),
        "h2": b"<nav><a href=/>Home</a></nav><p>Document two body with "
              b"enough words to keep.</p>",
        "h3": b"\xff broken \x00",  # parses (permissive) -> no kept spans ok
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in pages.items()], "doc_id string, html binary"
    )
    docs, media = split_ingest(ingest_html(df), persist=False)
    got = {r["doc_id"]: r["spans"] for r in docs.collect()}
    for k, v in pages.items():
        expect, _ = parse_html_doc(k, v)
        assert [tuple(s.asDict().values()) for s in got[k]] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expect
        ], k
    m = media.collect()
    assert len(m) == 1 and bytes(m[0]["image"]) == payload


def test_ingest_html_on_bad_skip(spark):
    df = spark.createDataFrame(
        [("bad", bytearray(b'<img src="data:image/png;base64,@@">'))],
        "doc_id string, html binary",
    )
    with pytest.raises(Exception):
        ingest_html(df, on_bad="fail").collect()
    rows = ingest_html(df, on_bad="skip").collect()
    assert rows[0]["spans"] == [] and "malformed data URI" in rows[0]["error"]


def test_strip_html_udf(spark):
    df = spark.createDataFrame(
        [("a", PAGE.decode()), ("b", None)], "doc_id string, text string"
    )
    rows = {r["doc_id"]: r["main_text"] for r in strip_html(df).collect()}
    assert rows["a"] == EXPECTED_MAIN
    assert rows["b"] is None


def test_cli_ingest_html_directory(tmp_path):
    """`python -m … ingest --html` over a directory of .html/.htm files
    (Spark binaryFile source) writes the two tables extract consumes."""
    import json
    import os
    import subprocess
    import sys

    _, uri = _png_data_uri()
    hdir = tmp_path / "htmls"
    hdir.mkdir()
    (hdir / "a.html").write_text(
        f"<nav><a href=/>Home</a></nav><main><h1>Invoice A</h1>"
        f'<p>Total due is forty two dollars exactly.</p><img src="{uri}">'
        f"</main><footer>Copyright</footer>"
    )
    (hdir / "b.htm").write_text(
        "<article><p>Second page body with plenty of words.</p></article>"
    )
    out = tmp_path / "tables"
    r = subprocess.run(
        [sys.executable, "-m", "ai_invoice_ocr_engine_spark", "ingest",
         "--html", str(hdir), "--out", str(out), "--master", "local[4]"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.splitlines()[-1])
    assert rep["n_docs"] == 2 and rep["n_media"] == 1 and rep["n_errors"] == 0


def test_ingested_html_runs_the_pipeline(spark, tmp_path):
    """HTML front-end → two tables → the OCR extract pipeline: the
    embedded data-URI image is decoded and OCR'd like any corpus frame
    (full interleaved loop, same shape as the PDF round-trip test)."""
    from ai_invoice_ocr_engine_spark.pipeline import extract

    payload, uri = _png_data_uri()
    df = spark.createDataFrame(
        [("h1", bytearray(
            f'<main><p>Lead paragraph with enough words to keep.</p>'
            f'<img src="{uri}"></main>'.encode()))],
        "doc_id string, html binary",
    )
    docs, media = split_ingest(ingest_html(df), persist=False)
    rows = extract(docs, media).collect()
    spans = [s.asDict() for s in rows[0]["spans_out"]]
    assert spans[0]["kind"] == "text"
    assert spans[1]["kind"] == "ocr_text" and spans[1]["media_ref"].startswith("m-")
    assert [s["order"] for s in spans] == list(range(len(spans)))


def test_html_corpus_roundtrip(spark, tmp_path):
    """The synthetic interleaved corpus rendered as raw HTML FILES (with
    full site chrome), fed through ingest_html, must reconstruct the
    span model exactly — the strip removes the chrome and nothing else —
    and media payloads round-trip bit-for-bit (mirror of
    test_pdf_corpus_roundtrip for the HTML front-end)."""
    import hashlib

    from pyspark.sql import functions as F

    from ai_invoice_ocr_engine_spark import fixtures as FX

    docs, media = FX.gen_corpus(seed=11, n_docs=24, max_media_side=256)
    lookup = {m["media_ref"] for m in media}
    docs = [d for d in docs
            if all(s["media_ref"] in lookup for s in d["spans"]
                   if s["kind"] == "media")]
    assert len(docs) >= 20
    hdir = str(tmp_path / "htmls")
    FX.write_html_corpus(hdir, docs, media)

    src = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.html")
        .load(hdir)
        .select(F.regexp_extract(F.col("path"), r"([^/]+)\.html$", 1).alias("doc_id"),
                F.col("content").alias("html"))
    )
    ing_docs, ing_media = split_ingest(ingest_html(src))

    got = {r["doc_id"]: [(s["kind"], s["text"], s["offset"])
                         for s in r.asDict(recursive=True)["spans"]]
           for r in ing_docs.collect()}
    for d in docs:
        want = [(s["kind"], s["text"] or "", s["offset"]) for s in d["spans"]]
        assert got[d["doc_id"]] == want, d["doc_id"]

    blob_by_md5 = {
        "m-" + hashlib.md5(m["image"]).hexdigest()[:16]: m["image"] for m in media
    }
    for r in ing_media.collect():
        assert bytes(r["image"]) == blob_by_md5[r["media_ref"]]


def test_streaming_html_ingest_matches_batch(spark, tmp_path):
    """Two micro-batches of landing .html files == one batch ingest;
    content-addressed media dedups across batches (mirror of the PDF
    streaming test through the shared foreachBatch path)."""
    from ai_invoice_ocr_engine_spark.streaming import incremental_pdf_ingest

    _, uri = _png_data_uri()
    land = tmp_path / "land"
    land.mkdir()
    out = str(tmp_path / "tables")
    ck = str(tmp_path / "ck")

    def run():
        q = incremental_pdf_ingest(spark, str(land), out, ck, source="html")
        q.awaitTermination()

    (land / "s1.html").write_text(
        f'<main><p>Batch one body with enough words to keep.</p>'
        f'<img src="{uri}"></main>'
    )
    run()
    (land / "s2.htm").write_text(
        f'<main><p>Batch two body with enough words to keep.</p>'
        f'<img src="{uri}"></main>'  # same image: must dedup across batches
    )
    run()
    docs = spark.read.parquet(f"{out}/documents.parquet")
    media = spark.read.parquet(f"{out}/media.parquet")
    assert docs.count() == 2
    assert media.count() == 1  # cross-batch content dedup
    spans = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert [s["kind"] for s in spans["s1"]] == ["text", "media"]
    assert spans["s1"][1]["media_ref"] == spans["s2"][1]["media_ref"]


def test_table_rows_are_single_blocks():
    """A multi-cell row is one content unit ('Widget | 2 | 42.00'), exempt
    from the word minimum; link-farm layout tables still drop on link
    density; an inline-condemned span inside a cell contributes nothing
    (and must not split the row)."""
    page = """
    <main><h2>Invoice 1042</h2><table>
    <tr><th>Item</th><th>Qty</th><th>Amount</th></tr>
    <tr><td>Widget</td><td>2</td><td>42.00</td></tr>
    <tr><td>Gadget <span class="sponsor">BUY NOW</span> pro</td><td>7.50</td></tr>
    <tr><td>lone</td></tr>
    </table></main>
    <table><tr><td><a href=1>Nav one</a></td><td><a href=2>Nav two</a></td></tr></table>
    """
    assert extract_main_text(page) == (
        "Invoice 1042\n"
        "Item | Qty | Amount\n"
        "Widget | 2 | 42.00\n"
        "Gadget pro | 7.50"
    )
    by_text = {b.text: b for b in html_blocks(page) if b.kind == "text"}
    assert by_text["lone"].reason == "short"  # single cell: normal rules
    assert by_text["Nav one | Nav two"].reason == "link_density"
