"""Result sinks — distributed analogs of the reference export formats
(SURVEY.md §2.1 S4-S8; /root/reference/utils/export.py).

The reference flattens per-document results to (file, index, text, score)
rows for xlsx/csv (utils/export.py:16-25,43-50) and wraps JSON in a
versioned envelope (utils/export.py:4-15). Here the flattening is a
`posexplode` projection and the sinks are distributed writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ENGINE_VERSION = "0.1.0"


def flat_spans(result: DataFrame) -> DataFrame:
    """result(doc_id, spans_out, …) → one row per span:
    (doc_id, idx, kind, text, media_ref) — the F7 projection."""
    return result.select(
        "doc_id", F.posexplode("spans_out").alias("idx", "s")
    ).select(
        "doc_id",
        "idx",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def write_csv(result: DataFrame, path: str) -> None:
    """S7 analog: flat rows, header, delimiter-escaped by the csv writer."""
    flat_spans(result).write.mode("overwrite").option("header", True).csv(path)


def write_json(result: DataFrame, path: str, run_id: str = "") -> None:
    """S4 analog: one JSON object per document with an embedded version tag
    (the envelope of utils/export.py:10 carried per-row so the sink stays
    distributed — a driver-side global envelope would not scale)."""
    (
        result.select(
            F.lit(ENGINE_VERSION).alias("version"),
            F.lit(run_id).alias("run_id"),
            "doc_id",
            "spans_out",
            "invoice_fields",
        )
        .write.mode("overwrite")
        .json(path)
    )


def write_text(result: DataFrame, path: str) -> None:
    """S8 analog: newline-joined span texts per document."""
    (
        result.select(
            F.concat_ws(
                "\n", F.transform("spans_out", lambda s: s["text"])
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
