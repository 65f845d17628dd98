"""Physical-plan regression tests: the scale-critical plan properties the
engine relies on (SURVEY.md §4) asserted, not just documented.

A correctness-green query whose plan silently loses predicate pushdown,
broadcast choice, or map-side partial aggregation is a 100 TB incident —
these tests pin the plan shape at the marker level.
"""

import os

import pytest

from ai_invoice_ocr_engine_spark.queries import REGISTRY

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def plan_of(spark, name: str) -> str:
    fn, _sql = REGISTRY[name]
    return fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    # Q1 reads 7 of 11 lineitem columns; ReadSchema must not contain the rest
    plan = plan_of(spark, "pricing_summary")
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs, "no ReadSchema in plan"
    assert "l_orderkey" not in rs[0] and "l_partkey" not in rs[0]


def test_partial_aggregation_before_exchange(spark):
    # map-side combine: two HashAggregates around one Exchange
    plan = plan_of(spark, "pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_small_dims_broadcast(spark):
    plan = plan_of(spark, "topk_orders")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_global_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark):
    plan = plan_of(spark, "exists_late_orders")
    assert "LeftSemi" in plan


def test_range_join_broadcasts_band_dim(spark):
    plan = plan_of(spark, "range_join_buckets")
    assert "BroadcastNestedLoopJoin" in plan


def test_multi_distinct_uses_expand(spark):
    plan = plan_of(spark, "multi_distinct")
    assert "Expand" in plan


def test_disjunctive_predicate_partially_pushed(spark):
    plan = plan_of(spark, "disjunctive_parts")
    assert "PushedFilters: [" in plan
    # quantity range spans all three branches -> pushable to the lineitem scan
    assert "l_quantity" in plan.split("PushedFilters")[1].split("]")[0] or (
        "Or(" in plan
    )


@pytest.mark.parametrize("name", ["grouping_sets_priority", "cube_revenue"])
def test_grouping_sets_single_pass(spark, name):
    # one Expand + aggregation, not a union of per-set scans
    plan = plan_of(spark, name)
    assert "Expand" in plan
    assert plan.count("FileScan") == 1


def test_extract_plan_single_python_crossing(spark, corpus):
    """The flagship plan crosses JVM<->Python exactly once (per distinct
    frame), SURVEY.md §4 — the CIDR'22 Arrow-boundary tax design rule."""
    from ai_invoice_ocr_engine_spark.config import ExtractConfig
    from ai_invoice_ocr_engine_spark.pipeline import extract

    docs = spark.read.parquet(corpus["docs_path"])
    media = spark.read.parquet(corpus["media_path"])
    plan = (
        extract(docs, media, ExtractConfig(), media_strategy="frames")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere
