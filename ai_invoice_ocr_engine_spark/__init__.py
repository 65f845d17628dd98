"""ai_invoice_ocr_engine_spark — a PySpark-native invoice-OCR extraction engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``Mato989086/AI-INVOICE-OCR-ENGINE`` (an in-process
numpy/cv2 OCR pipeline, see /root/reference): detection -> recognition ->
layout post-processing, run as a distributed batch job over tables of
interleaved text+media documents.

Layout:
    config.py     — pipeline configuration (thresholds mirror reference defaults)
    kernels.py    — numpy-only numeric kernels (detection, CTC, reading order…)
    extractor.py  — per-document extraction (shared by oracle and Spark UDFs)
    oracle.py     — single-process reference-semantics engine (golden outputs)
    fixtures.py   — deterministic synthetic corpus generator
    pipeline.py   — the Spark job: join media, mapInPandas extract, lineage, resume
    xxh.py        — pure-python xxhash64 (bit-compatible with Spark's xxhash64)
    functions/    — reusable DataFrame-level ops (dedup, similarity, text stats)
    operators/    — relational/window operator compositions (sessionize, topk…)
    sources/      — readers/writers (parquet now; Iceberg when a catalog exists)
    streaming/    — incremental-ingest plumbing (foreachBatch wrapper)
"""

from .config import ExtractConfig


def init(spark, cfg=None):
    """Engine constructor mirroring the reference's dococr.init
    (/root/reference/__init__.py:5-7); see api.OCREngineSpark."""
    from .api import OCREngineSpark

    return OCREngineSpark(spark, cfg)


__all__ = ["ExtractConfig", "init"]
__version__ = "0.1.0"
