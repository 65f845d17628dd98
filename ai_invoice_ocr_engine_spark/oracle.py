"""Single-process reference-semantics engine — produces golden outputs.

Plays the role of the reference's ``OCREngine.predict``
(/root/reference/engine.py:44-60): a plain per-document loop over the shared
numpy kernels, with no Spark anywhere. The Spark pipeline must reproduce its
output exactly (span-sequence equality on kind/text/media_ref/order —
BASELINE.json invariant).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from . import kernels as K
from .config import ExtractConfig
from .extractor import extract_doc

GOLDEN_SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)
GOLDEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans_out", pa.list_(GOLDEN_SPAN_TYPE)),
        ("invoice_fields", pa.map_(pa.string(), pa.string())),
        ("n_spans_in", pa.int32()),
        ("n_media", pa.int32()),
        ("n_media_missing", pa.int32()),
        ("n_ocr", pa.int32()),
    ]
)


def run_oracle(
    docs: list[dict], media: list[dict], cfg: ExtractConfig | None = None
) -> list[dict]:
    """docs/media: row dicts (fixtures.gen_corpus output or parquet pylist).

    Returns one golden row per document, in input order (the reference's
    ThreadPool ``ex.map`` preserves input order, /root/reference/engine.py:58).
    """
    cfg = cfg or ExtractConfig()
    weights = K.resolve_weights(cfg.rec)
    lookup = {m["media_ref"]: m["image"] for m in media}
    out = []
    for d in docs:
        res = extract_doc(d["spans"], lookup, cfg, weights)
        res["doc_id"] = d["doc_id"]
        res["invoice_fields"] = sorted(res["invoice_fields"].items())
        out.append(res)
    return out


def run_oracle_parquet(
    docs_path: str, media_path: str, golden_path: str, cfg: ExtractConfig | None = None
) -> str:
    docs = pq.read_table(docs_path).to_pylist()
    media = pq.read_table(media_path).to_pylist()
    rows = run_oracle(docs, media, cfg)
    pq.write_table(pa.Table.from_pylist(rows, schema=GOLDEN_SCHEMA), golden_path)
    return golden_path
