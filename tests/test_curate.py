"""Corpus-curation driver (curate.py): the composed funnel must agree
with the corpus_funnel registry query's stage counts on the same table,
the kept output must satisfy every gate it claims to have applied, and
near-dedup must keep exactly the canonical-per-cluster representative."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from ai_invoice_ocr_engine_spark.curate import run_curate
from ai_invoice_ocr_engine_spark.functions import text as T

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def report(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curate"))
    rep = run_curate(spark, f"{SF}/documents.parquet", out, near_dedup=True)
    return rep, out


def test_counts_match_corpus_funnel_query(spark, report):
    from ai_invoice_ocr_engine_spark.queries import REGISTRY

    rep, _out = report
    fn, _sql = REGISTRY["corpus_funnel"]
    row = fn(spark, SF).collect()[0]
    assert rep["n_docs"] == row["n_docs"]
    assert rep["n_pass_quality"] == row["n_pass_quality"]
    assert rep["n_pass_repetition"] == row["n_pass_repetition"]
    assert rep["n_pass_both"] == row["n_pass_both"]
    assert rep["n_after_exact"] == row["n_unique_kept"]
    assert rep["n_after_near"] <= rep["n_after_exact"]
    assert rep["n_kept"] == rep["n_after_near"]


def test_kept_rows_satisfy_every_gate(spark, report):
    rep, out = report
    kept = spark.read.parquet(f"{out}/kept")
    assert kept.count() == rep["n_kept"]
    assert kept.columns == spark.read.parquet(f"{SF}/documents.parquet").columns
    q = T.with_token_stats(kept)
    assert q.where(F.col("quality_score") < 0.75).count() == 0
    r = T.with_repetition_stats(kept)
    assert r.where(F.col("keep") != 1).count() == 0
    fp = T.with_fingerprint(kept)
    assert fp.select("fingerprint").distinct().count() == rep["n_kept"]


@pytest.mark.parametrize("method", ["minhash", "simhash"])
def test_near_dedup_keeps_longest_representative(spark, tmp_path, method):
    # non-repetitive (distinct tokens) so the repetition gate passes and
    # only the dedup stages differentiate the rows; each group gets its
    # OWN token vocabulary so cross-group Jaccard is ~0 (a shared base
    # would make every row a legitimate near-dup of every other)
    def mk(tag):
        return " ".join(f"{tag}{i:03d}" for i in range(120)) + " "

    a, b, c = mk("alpha"), mk("beta"), mk("gamma")
    rows = (
        # cluster: 11 is a TAIL-truncated near-copy of 10 (tail, because
        # the stride-4 shingle grid is shift-sensitive: chopping the head
        # offsets every shingle; chopping the tail keeps them aligned)
        [(10, a + "tail marker alpha"), (11, a.rstrip())]
        # exact copies: min doc_id 20 survives the exact stage
        + [(20, b + "beta"), (21, b + "beta")]
        # singleton
        + [(30, c + "gamma unrelated suffix")]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    rep = run_curate(
        spark, src, str(tmp_path / "out"), near_dedup=True, method=method
    )
    kept_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out/kept")).collect()
    )
    assert rep["n_docs"] == 5 and rep["n_after_exact"] == 4
    assert rep["method"] == method
    assert kept_ids == [10, 20, 30]  # 11 dropped as near-dup of longer 10


def test_cli_curate_subprocess(tmp_path):
    out = str(tmp_path / "cur")
    r = subprocess.run(
        [sys.executable, "-m", "ai_invoice_ocr_engine_spark", "curate",
         "--docs", f"{SF}/documents.parquet", "--out", out,
         "--master", "local[4]"],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.splitlines()[-1])
    assert rep["n_kept"] == rep["n_after_exact"] > 0
    assert json.load(open(f"{out}/report.json")) == rep


def test_near_dedup_string_doc_ids(spark, tmp_path):
    """The ingest schema's doc_id is a STRING — the keep-longest
    tie-break must not negate it (ANSI mode would throw, non-ANSI would
    NULL the tie-break). Equal-length near-dups must keep the smallest
    doc_id deterministically."""

    def mk(tag):
        return " ".join(f"{tag}{i:03d}" for i in range(120)) + " "

    a, b = mk("alpha"), mk("beta")
    rows = [
        # equal-length exact pair: tie-break on doc_id must keep 'doc-a1'
        ("doc-a2", a + "x"), ("doc-a1", a + "x"),
        ("doc-b1", b + "unrelated"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    rep = run_curate(
        spark, src, str(tmp_path / "out"), near_dedup=True, method="minhash"
    )
    kept_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out/kept")).collect()
    )
    assert kept_ids == ["doc-a1", "doc-b1"]
    assert rep["n_kept"] == 2
