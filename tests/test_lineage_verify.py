"""Lineage integrity verification: recomputed per-bucket checksums must match
the lineage rows; a corrupted/short output must be flagged."""

import os
import shutil

from ai_invoice_ocr_engine_spark.pipeline import run_extract, verify_lineage


def test_verify_lineage_ok_and_detects_corruption(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    stats = run_extract(
        spark, corpus["docs_path"], corpus["media_path"], out,
        num_buckets=8, run_id="vl",
    )
    assert stats["docs"] > 0
    rep = verify_lineage(spark, out)
    assert rep["ok"] and rep["partitions"] == 8

    # corrupt: drop one bucket directory entirely
    victim = sorted(
        d for d in os.listdir(os.path.join(out, "spans")) if d.startswith("bucket=")
    )[0]
    shutil.rmtree(os.path.join(out, "spans", victim))
    rep2 = verify_lineage(spark, out)
    assert not rep2["ok"] and rep2["mismatched"] >= 1
