"""Distributed exact ranking (operators/ranking.py): the partition-offset
pattern must be bit-identical to the single-task Window forms it replaces,
across sizes (incl. fewer rows than tiles), partition counts, and mixed
sort directions — and its plan must not funnel data through one task."""

import numpy as np
import pytest
from pyspark.sql import Window, functions as F

from ai_invoice_ocr_engine_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)


def _df(spark, n, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, max(2, n // 3), n).tolist()  # many ties
    return spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(vals)], "id int, v int"
    )


@pytest.mark.parametrize("n,parts", [(1, 4), (3, 4), (97, 5), (500, 13)])
def test_row_number_matches_global_window(spark, n, parts):
    df = _df(spark, n, seed=n)
    order = [F.desc("v"), F.asc("id")]
    got, total = global_row_number(df, order, num_partitions=parts, pin=True)
    assert total == n
    w = Window.orderBy(*order)
    want = df.withColumn("rn", F.row_number().over(w))
    assert sorted(got.select("id", "rn").collect()) == sorted(
        want.select("id", "rn").collect()
    )


@pytest.mark.parametrize("n,tiles", [(2, 4), (4, 4), (11, 4), (500, 7)])
def test_ntile_matches_global_window(spark, n, tiles):
    df = _df(spark, n, seed=100 + n)
    order = [F.desc("v"), F.asc("id")]
    got = global_ntile(df, tiles, order, out="t", num_partitions=5)
    w = Window.orderBy(*order)
    want = df.withColumn("t", F.ntile(tiles).over(w))
    assert sorted(got.select("id", "t").collect()) == sorted(
        want.select("id", "t").collect()
    )


def test_plan_has_no_global_single_task_window(spark):
    """The whole point: the ranked plan range-partitions and windows per
    range partition — no partition-less windowspecdefinition, which is
    what forces SinglePartition."""
    df = _df(spark, 200, seed=7)
    got, _ = global_row_number(df, [F.asc("v"), F.asc("id")], num_partitions=6)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "_rk_pid" in plan  # the window partitions on the range pid
    # a global window would appear as windowspecdefinition(v ...) with no
    # partition spec; ours always carries the pid partition column
    assert "SinglePartition" not in plan.split("rangepartitioning")[0]


@pytest.mark.parametrize("n", [1, 13, 500])
def test_cumsum_matches_global_window(spark, n):
    from ai_invoice_ocr_engine_spark.operators.ranking import global_cumsum

    df = _df(spark, n, seed=300 + n).withColumn(
        "tok", (F.col("v") % 37).cast("long")
    )
    got = global_cumsum(df, ["id"], "tok", out="c", num_partitions=5)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("c", F.sum("tok").over(w))
    assert sorted(got.select("id", "c").collect()) == sorted(
        want.select("id", "c").collect()
    )


def test_cumsum_plan_no_single_task_window(spark):
    from ai_invoice_ocr_engine_spark.operators.ranking import global_cumsum

    df = _df(spark, 200, seed=11).withColumn("tok", F.lit(3).cast("long"))
    got = global_cumsum(df, ["id"], "tok", num_partitions=6)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "_rk_pid" in plan
    assert "SinglePartition" not in plan.split("rangepartitioning")[0]
