"""Distributed exact global ranking: row_number / ntile without the
single-task sort.

``Window.orderBy(...)`` with no partition key is the classic scale
cliff: Spark moves EVERY row into one task to number them (the r2
verdict's one `weak` plan). The standard fix is the partition-offset
pattern: range-repartition on the sort key so partitions are globally
ordered, count rows per partition (P tiny rows to the driver), turn the
counts into cumulative offsets, and add a partition-LOCAL row_number to
each row's offset. Every stage is parallel; the only driver traffic is
one count per partition.

Exactness requires a total order — callers must include a unique
tie-break column in ``order_cols`` (the same requirement the oracle
comparison already imposes on any ranking query).

The two passes (count, then rank) must observe the SAME partitioning.
Range boundaries come from deterministic sampling (fixed per-partition
seeds), so re-execution yields the same boundaries for the same input;
``pin=True`` (default) persists the repartitioned relation
MEMORY_AND_DISK for the duration anyway, removing even that assumption
at the cost of materializing the ranked relation once — at 10^12-row
scale rank the pre-aggregated relation (e.g. per-customer totals), not
raw facts.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window, functions as F


def global_row_number(
    df: DataFrame,
    order_cols,
    out: str = "rn",
    num_partitions: int | None = None,
    pin: bool = True,
) -> tuple[DataFrame, int]:
    """(df + 1-based global row number under ``order_cols``, total rows)."""
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    part = df.repartitionByRange(n, *order_cols)
    if pin:
        part = part.persist(StorageLevel.MEMORY_AND_DISK)
    pid = part.withColumn("_rk_pid", F.spark_partition_id())
    counts = sorted(
        pid.groupBy("_rk_pid").count().collect(), key=lambda r: r["_rk_pid"]
    )
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_rk_pid"]] = acc
        acc += row["count"]
    if offsets:
        omap = F.create_map(
            [F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )
        off = F.coalesce(omap[F.col("_rk_pid")], F.lit(0))
    else:
        off = F.lit(0)
    w = Window.partitionBy("_rk_pid").orderBy(*order_cols)
    ranked = pid.withColumn(
        out, (F.row_number().over(w) + off).cast("int")
    ).drop("_rk_pid")
    return ranked, acc


def global_cumsum(
    df: DataFrame,
    order_cols,
    value_col: str,
    out: str = "cum",
    num_partitions: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """df + INCLUSIVE global running sum of ``value_col`` under
    ``order_cols`` — the same partition-offset pattern as
    `global_row_number` with per-partition SUMS as the offsets (P tiny
    rows to the driver, no single-task window). Exactness requires
    ``order_cols`` to be a total order."""
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    part = df.repartitionByRange(n, *order_cols)
    if pin:
        part = part.persist(StorageLevel.MEMORY_AND_DISK)
    pid = part.withColumn("_rk_pid", F.spark_partition_id())
    sums = sorted(
        pid.groupBy("_rk_pid")
        .agg(F.sum(value_col).alias("_s"))
        .collect(),
        key=lambda r: r["_rk_pid"],
    )
    offsets, acc = {}, 0
    for row in sums:
        offsets[row["_rk_pid"]] = acc
        acc += row["_s"] or 0
    if offsets:
        omap = F.create_map(
            [F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )
        off = F.coalesce(omap[F.col("_rk_pid")], F.lit(0))
    else:
        off = F.lit(0)
    w = (
        Window.partitionBy("_rk_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return pid.withColumn(
        out, (F.sum(value_col).over(w) + off).cast("long")
    ).drop("_rk_pid")


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols,
    out: str = "tile",
    num_partitions: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Exact ``ntile(n_tiles)`` semantics (SQL: first ``total % n`` tiles
    get one extra row) on the distributed rank — bit-identical to
    ``F.ntile(n).over(Window.orderBy(...))`` without its single task."""
    ranked, total = global_row_number(
        df, order_cols, out="_rk_rn", num_partitions=num_partitions, pin=pin
    )
    base, rem = divmod(total, n_tiles)
    if base == 0:  # fewer rows than tiles: tile == rank
        tile = F.col("_rk_rn")
    else:
        boundary = rem * (base + 1)
        tile = F.when(
            F.col("_rk_rn") <= boundary,
            ((F.col("_rk_rn") - 1) / (base + 1)).cast("int") + 1,
        ).otherwise(
            ((F.col("_rk_rn") - boundary - 1) / base).cast("int") + 1 + rem
        )
    return ranked.withColumn(out, tile.cast("int")).drop("_rk_rn")
