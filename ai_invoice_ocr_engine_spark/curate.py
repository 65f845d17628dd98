"""Corpus-curation driver — the engine's training-data gates composed
into the one batch job a 100 TB snapshot run executes end-to-end:

    quality_score >= threshold          (with_token_stats projection)
    -> repetition keep                  (with_repetition_stats, 2 map-side aggs)
    -> exact dedup                      (min doc_id per content fingerprint)
    -> optional MinHash near-dup        (keep longest member per component)
    -> kept-docs parquet + funnel report

The stage counts are exactly the `corpus_funnel` registry query's
acceptance report (queries.py q_corpus_funnel), made actionable: this
module WRITES the surviving corpus instead of only counting it.

Scale notes: every stage is an already-audited primitive — the gates
are whole-stage-codegen projections, exact dedup is one map-side
combinable min-aggregate on the fingerprint, the near-dup path is the
guarded minhash_band_pairs (mega-bucket star-reduction) plus min-label
connected components, and representative selection is a max_by
aggregate rather than a row_number window (no global per-cluster
sort). The only driver-side materialization is the handful of stage
counts in the report.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions import dedup as D
from .functions import text as T


def run_curate(
    spark: SparkSession,
    docs_path: str,
    out: str,
    quality: float = 0.75,
    near_dedup: bool = False,
    fast_hash: bool = False,
    method: str = "minhash",
) -> dict:
    """Run the funnel over a documents parquet/table path; write the
    surviving rows (all original columns) to ``out`` and return the
    stage-count report. ``fast_hash`` selects the xxhash64 MinHash
    family (the 10^12-doc choice; md5 default is the oracle-checkable
    one — see minhash_band_pairs). ``method`` picks the near-dup
    candidate generator: 'minhash' (shingle Jaccard — robust to word
    substitutions) or 'simhash' (token Hamming — cheaper signatures, one
    60-bit int per doc); both ride the same guarded banded joins and the
    same connected-components + keep-longest representative selection."""
    t0 = time.time()
    d = spark.read.parquet(docs_path)

    # quality + fingerprint are per-row projections: compose them through
    # the `carry` passthrough into ONE whole-stage-codegen pass (no
    # doc_id re-join); only the repetition gate (which aggregates grams)
    # needs a join
    qf = T.with_fingerprint(
        T.with_token_stats(d, carry=("text",)), carry=("quality_score",)
    ).select("doc_id", "quality_score", "fingerprint")
    r = T.with_repetition_stats(d).select("doc_id", "keep")
    flags = (
        qf.join(r, "doc_id")
        .select(
            "doc_id",
            "fingerprint",
            (F.col("quality_score") >= quality).alias("pq"),
            (F.col("keep") == 1).alias("pr"),
        )
        .persist()
    )
    counts = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("pq").cast("long")).alias("n_pass_quality"),
        F.sum(F.col("pr").cast("long")).alias("n_pass_repetition"),
        F.sum((F.col("pq") & F.col("pr")).cast("long")).alias("n_pass_both"),
    ).collect()[0]

    both = flags.where(F.col("pq") & F.col("pr"))
    # exact dedup: one canonical (min doc_id) row per content fingerprint —
    # a map-side combinable aggregate, not a window
    kept_ids = both.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    kept_ids = kept_ids.select("doc_id").persist()
    n_after_exact = kept_ids.count()

    report = {
        "n_docs": counts["n_docs"],
        "n_pass_quality": counts["n_pass_quality"],
        "n_pass_repetition": counts["n_pass_repetition"],
        "n_pass_both": counts["n_pass_both"],
        "n_after_exact": n_after_exact,
        "quality_threshold": quality,
        "near_dedup": bool(near_dedup),
        "method": method if near_dedup else None,
    }

    final_ids: DataFrame = kept_ids
    if near_dedup:
        corpus = d.join(kept_ids, "doc_id", "left_semi").select(
            "doc_id", "text"
        )
        if method == "simhash":
            pairs = D.simhash_pairs(corpus)
        elif method == "minhash":
            pairs = D.minhash_band_pairs(corpus, fast_hash=fast_hash)
        else:
            raise ValueError(f"unknown near-dedup method {method!r}")
        labels = D.connected_components_labels(pairs)
        chars = corpus.select(
            "doc_id", F.length("text").cast("long").alias("n_chars")
        )
        # keep the LONGEST member, smallest doc_id on ties. min_by over
        # struct(-n_chars, doc_id) rather than max_by(.., -doc_id): doc_id
        # is a STRING in the ingest schema (sources/ingest.py), so negating
        # it would throw under ANSI mode (and NULL out the tie-break
        # otherwise) — negate the numeric length instead (review r4s5)
        keep_per_cluster = (
            labels.join(chars, "doc_id")
            .groupBy("cluster_id")
            .agg(F.expr("min_by(doc_id, struct(-n_chars, doc_id))").alias("doc_id"))
        )
        # members of a near-dup component that are NOT its representative
        drop = labels.select("doc_id").join(
            keep_per_cluster, "doc_id", "left_anti"
        )
        final_ids = kept_ids.join(drop, "doc_id", "left_anti")
        report["n_after_near"] = final_ids.count()

    kept = d.join(final_ids, "doc_id", "left_semi")
    kept.write.mode("overwrite").parquet(f"{out}/kept")
    # the kept count is already in hand (final_ids was counted for the
    # stage report) — don't rescan the freshly written dataset for it
    report["n_kept"] = report.get("n_after_near", report["n_after_exact"])
    report["out"] = f"{out}/kept"
    report["secs"] = round(time.time() - t0, 3)
    flags.unpersist()
    kept_ids.unpersist()
    return report
