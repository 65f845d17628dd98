"""Raw-file ingestion: PDF or HTML blobs → the engine's two input tables.

The north rule's front-end is "HTML boilerplate strip, PDF/layout
parse, DOM heuristics" feeding the interleaved document model. This
stage turns a DataFrame of raw bytes ``(doc_id string, pdf|html
binary)`` into

  documents(doc_id, spans array<struct<kind,text,media_ref,offset>>)
  media(media_ref, image binary)

via ONE ``mapInPandas`` crossing (pdf.pdf_spans does the COS/content
parse per document inside the Arrow batch — no per-row Python UDF). The
combined intermediate carries each document's spans plus its *distinct*
embedded images; media_refs are content-addressed (md5 of the decoded
payload, same ``m-<16 hex>`` shape as the synthetic corpus) so the
downstream ``media`` table deduplicates identical embedded assets (the
same logo across a million invoices is ONE media row, exactly like the
synthetic corpus reuses media_refs across documents).

Scale posture: the parse is a narrow map stage — no shuffle. The only
shuffle in ``split_ingest`` is the media dedup (``dropDuplicates`` on the
content hash), which moves each distinct image once; doc-side output is
written straight through. At 100 TB of PDFs, call ``ingest_pdfs`` and
persist the combined frame (or write it to a staging table) before
splitting so the parse runs once, not twice — ``split_ingest(df,
persist=True)`` does this for the local case.

Error contract mirrors the pipeline's ``on_bad_media`` policy: ``fail``
raises with the doc_id named (reference parity — one bad file kills the
job loudly); ``skip`` emits the document with empty spans and the parse
error recorded in the ``error`` column so a 100 TB run survives corrupt
files and can count/quarantine them afterwards.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..pdf import pdf_spans

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
MEDIA_ITEM = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("image", BinaryType()),
    ]
)
INGEST_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("media", ArrayType(MEDIA_ITEM)),
        StructField("error", StringType()),
    ]
)


def _content_ref(payload: bytes) -> str:
    return "m-" + hashlib.md5(payload).hexdigest()[:16]


def parse_pdf_doc(doc_id: str, data: bytes,
                  password: bytes = b"") -> tuple[list[dict], list[dict]]:
    """Driver-testable single-document parse → (spans, media) in table
    shape: kinds normalized to the corpus model ('image' → 'media'),
    media_refs rewritten content-addressed. ``password`` opens
    password-protected files (tried as user, then owner)."""
    raw_spans, raw_media = pdf_spans(data, password=password)
    ref_map = {ref: _content_ref(payload) for ref, payload in raw_media.items()}
    spans = []
    for s in raw_spans:
        if s["kind"] == "text":
            spans.append(
                {"kind": "text", "text": s["text"], "media_ref": "",
                 "offset": s["offset"]}
            )
        else:
            spans.append(
                {"kind": "media", "text": "", "media_ref": ref_map[s["media_ref"]],
                 "offset": s["offset"]}
            )
    seen: dict[str, bytes] = {}
    for ref, payload in raw_media.items():
        seen.setdefault(ref_map[ref], payload)
    media = [{"media_ref": r, "image": p} for r, p in sorted(seen.items())]
    return spans, media


def parse_html_doc(doc_id: str, data: bytes) -> tuple[list[dict], list[dict]]:
    """Driver-testable single-document HTML parse → (spans, media), same
    table shape as parse_pdf_doc: main-content text blocks + kept <img>
    elements as interleaved spans (html_extract.html_spans does the
    boilerplate strip), data-URI payloads content-addressed into media
    rows. External-URL images keep their payload-less ``u-…`` refs —
    they have no media row until a fetch stage supplies bytes."""
    from ..html_extract import html_spans

    raw_spans, raw_media = html_spans(data)
    ref_map = {ref: _content_ref(payload) for ref, payload in raw_media.items()}
    spans = []
    for s in raw_spans:
        if s["kind"] == "text":
            spans.append(
                {"kind": "text", "text": s["text"], "media_ref": "",
                 "offset": s["offset"]}
            )
        else:
            ref = ref_map.get(s["media_ref"], s["media_ref"])
            spans.append(
                {"kind": "media", "text": "", "media_ref": ref,
                 "offset": s["offset"]}
            )
    seen: dict[str, bytes] = {}
    for ref, payload in raw_media.items():
        seen.setdefault(ref_map[ref], payload)
    media = [{"media_ref": r, "image": p} for r, p in sorted(seen.items())]
    return spans, media


def _ingest(
    raw_df: DataFrame, blob_col: str, parse, label: str, on_bad: str
) -> DataFrame:
    """Shared one-crossing ingest plumbing for every raw front-end."""
    if on_bad not in ("fail", "skip"):
        raise ValueError(f"on_bad must be 'fail' or 'skip', got {on_bad!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "spans": [], "media": [], "error": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                try:
                    spans, media = parse(doc_id, bytes(blob))
                    err = None
                except (ValueError, NotImplementedError) as e:
                    if on_bad == "fail":
                        raise ValueError(
                            f"{label} parse failed for doc_id={doc_id!r}: {e}"
                        ) from e
                    spans, media, err = [], [], f"{type(e).__name__}: {e}"
                rows["doc_id"].append(doc_id)
                # tuples, not dicts: the Arrow struct conversion takes
                # positional values in schema field order
                rows["spans"].append(
                    [(s["kind"], s["text"], s["media_ref"], s["offset"])
                     for s in spans]
                )
                rows["media"].append(
                    [(m["media_ref"], m["image"]) for m in media]
                )
                rows["error"].append(err)
            yield pd.DataFrame(rows)

    return raw_df.select("doc_id", blob_col).mapInPandas(fn, INGEST_SCHEMA)


def ingest_pdfs(pdf_df: DataFrame, on_bad: str = "fail",
                password: bytes = b"") -> DataFrame:
    """(doc_id, pdf binary) → combined (doc_id, spans, media, error).
    ``password`` applies to every document in the frame (a per-corpus
    secret, the common case for bulk-exported protected invoices)."""
    if password:
        def parse(doc_id, data, _pw=password):
            return parse_pdf_doc(doc_id, data, password=_pw)
        return _ingest(pdf_df, "pdf", parse, "PDF", on_bad)
    return _ingest(pdf_df, "pdf", parse_pdf_doc, "PDF", on_bad)


def ingest_html(html_df: DataFrame, on_bad: str = "fail") -> DataFrame:
    """(doc_id, html binary) → combined (doc_id, spans, media, error):
    the HTML front-end of the same ingest — boilerplate-stripped main
    content + embedded images in the interleaved span model."""
    return _ingest(html_df, "html", parse_html_doc, "HTML", on_bad)


def split_ingest(
    combined: DataFrame, persist: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Combined ingest frame → (documents, media) tables.

    ``persist=True`` caches the combined frame so the PDF parse runs once
    across both outputs (on a cluster, write it to a staging table
    instead). Media dedup is the single shuffle: one row per distinct
    content hash survives."""
    if persist:
        combined = combined.persist()
    docs = combined.select("doc_id", "spans")
    media = (
        combined.select(F.explode("media").alias("m"))
        .select("m.media_ref", "m.image")
        .dropDuplicates(["media_ref"])
    )
    return docs, media
