"""Parallelism-determinism pins (round 5): the sf1 sweep proved that
double money-sum accumulation and underdetermined window orders produce
parallelism-DEPENDENT results (BENCH/queries_r5_sf1_prefix.txt, five
queries). After the decimal/total-ordering fixes, the money queries must
return BIT-IDENTICAL rows under different shuffle partitionings and input
partitionings — the property a 1,000-executor run needs. These tests pin
it structurally (not statistically): same query, two partition layouts,
exact row-set equality."""

import pytest
from pyspark.sql import functions as F

from ai_invoice_ocr_engine_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"

#: queries fixed in round 5 + representatives of each converted shape
PINNED = [
    "pricing_summary",
    "cube_revenue",
    "unpivot_revenue",
    "revenue_share_by_nation",
    "running_total",
    "q9_product_profit",
    "ntile_spend_quartiles",
    "monthly_revenue",
]


def _rows(spark, name):
    fn, _sql = REGISTRY[name]
    df = fn(spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", PINNED)
def test_money_query_stable_across_shuffle_partitions(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name} changed rows under a different shuffle layout"


def test_decimal_sum_is_order_independent_by_construction(spark):
    """The underlying mechanism, isolated: a decimal sum over adversarial
    magnitudes (1e9 values mixed with cents) is exact under ANY partition
    layout, while the double sum of the same column visibly drifts —
    demonstrating the class of bug the query conversions removed."""
    rows = [(float(10**9),)] * 1000 + [(0.01,)] * 1000
    df = spark.createDataFrame(rows, "x double")
    dec = lambda d: d.select(  # noqa: E731
        F.sum(F.col("x").cast("decimal(18,2)")).cast("string").alias("s")
    ).collect()[0]["s"]
    a = dec(df.repartition(1))
    b = dec(df.repartition(17))
    assert a == b == "1000000000010.00"