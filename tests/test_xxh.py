"""Parity of the pure-python xxhash64 with Spark's xxhash64 expression —
the fixture skew tier and oracle-side bucket math depend on it."""

from pyspark.sql import functions as F

from ai_invoice_ocr_engine_spark.xxh import spark_bucket, spark_xxhash64_str


def test_xxhash64_matches_spark(spark):
    vals = ["", "a", "doc0042-00000007-s3", "hello world", "x" * 100, "🦆 unicode"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], r["s"]


def test_bucket_matches_spark_pmod(spark):
    vals = [f"doc0042-{i:08d}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    rows = df.select(
        "s", F.pmod(F.xxhash64("s"), F.lit(32)).cast("int").alias("b")
    ).collect()
    for r in rows:
        assert spark_bucket(r["s"], 32) == r["b"]
