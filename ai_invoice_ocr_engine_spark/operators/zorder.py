"""Z-order (Morton) clustering — the data-layout operator behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``: interleave the bits of two
dimension columns so range-partitioning by the combined key gives every
output partition a tight bounding box in BOTH dimensions. A scan with a
2-D predicate then prunes most files from min/max footer stats alone —
the layout is where data-skipping at 100 TB is won, long before any
executor runs.

Everything here is pure JVM expression tree (shift/and/or — whole-stage
codegen, no Python), and the bit-interleave is generated once for both
the Spark Column and the DuckDB oracle SQL so the two can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of two non-negative
    integer columns (a gets the odd positions, b the even)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)),
                        2 * i + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                        2 * i)
        )
    return z


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as ANSI/DuckDB SQL (oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def cluster_by_zorder(df: DataFrame, col_a: str, col_b: str,
                      num_partitions: int, bits: int = 16) -> DataFrame:
    """Repartition by range of the Morton key and sort within each
    partition — after writing, every file's (col_a, col_b) min/max
    bounding box is a compact Z-curve segment instead of the full
    domain, so 2-D predicates prune files from footer stats.

    At 10^12 rows this is one range shuffle (sampled boundaries), the
    same cost as any global layout pass; run it once per ingest batch,
    not per query."""
    z = zvalue(F.col(col_a), F.col(col_b), bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
