"""As-of (most-recent-match) join — a composition, not a custom physical op.

Spark has no ASOF JOIN; the classic distributed formulation is
union-and-carry-forward: tag both sides, union on the shared key space, sort
within each key by time, and carry the right side's payload forward with
``last(ignorenulls=True)`` over an unbounded-preceding window. One shuffle
(by key), no range explosion — the same shape Flink/kdb use for temporal
joins, and it survives 10^12 rows because everything stays key-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts within the same `by` group (direction='backward'),
    or the EARLIEST right row with right_ts >= left_ts
    (direction='forward') — the same carry-forward composition run over
    the reversed time order.

    Ties on timestamp: the right row sorts BEFORE the left probe row at the
    same instant, so an exactly-simultaneous right row matches in either
    direction (>= / <= semantics, like DuckDB's ASOF JOIN).
    """
    if direction == "backward":
        order = [F.asc("__t"), F.asc("__side")]
    elif direction == "forward":
        order = [F.desc("__t"), F.asc("__side")]
    else:
        raise ValueError(f"unknown as-of direction {direction!r}")
    l_tag = left.select(
        F.col(by).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(by).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in payload
        ],
    )
    out_cols = [f.name for f in left.schema.fields] + [
        F.col(f"__c_{c}").alias(c) for c in payload
    ]
    return carried.where(F.col("__side") == 1).select(*out_cols)
