"""Local replica of the driver's correctness gate: run every REGISTRY query
through Spark AND its oracle SQL through DuckDB on the same sf dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from ai_invoice_ocr_engine_spark.queries import REGISTRY  # noqa: E402
from ai_invoice_ocr_engine_spark.sources.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style normalization: fixed decimal rendering
        return f"{v:.6f}"
    if v is None:
        return "NULL"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    import os

    # determinism audit hook (round 5): sweep under a different
    # parallelism/partitioning to surface order-dependent results —
    # a query correct at local[8]/8 partitions AND local[3]/7 partitions
    # (vs the same sequential DuckDB oracle) is parallelism-stable
    master = os.environ.get("SPARK_GRAFT_CHECK_MASTER", "local[8]")
    parts = int(os.environ.get("SPARK_GRAFT_CHECK_PARTS", "8"))
    spark = get_spark(app="check-queries", master=master, shuffle_partitions=parts)
    failures = 0
    for name in names:
        fn, sql = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        t1 = time.time()
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {t1-t0:.1f}s)")
            continue
        try:
            # Fetch through Arrow like the driver does.  Evidence from round
            # 3: queries whose oracle returns NULL-in-int columns or DATE
            # columns passed the driver (Arrow keeps nullable int64 / date32)
            # while a windowed sum(BIGINT) failed it (DuckDB promotes to
            # HUGEINT, which Arrow lowers to float64 → the driver hashes
            # "123.0" vs Spark's "123").  fetchall() hides that class of
            # artifact (Python ints survive HUGEINT); .df() over-reports
            # (NULL-in-int becomes NaN-float).  Arrow reproduces exactly the
            # driver's dtype behavior.
            tbl = con.sql(sql).arrow()
            dcols = list(tbl.column_names)
            drows = [tuple(d[c] for c in dcols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if len(cs) != len(cd):
            print(f"FAIL {name}: rowcount spark={len(cs)} duck={len(cd)}")
            failures += 1
            continue
        if cs != cd:
            bad = [i for i, (x, y) in enumerate(zip(cs, cd)) if x != y]
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(cs)} rows differ; first:\n  spark={cs[i]}\n  duck ={cd[i]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(cs)} rows match ({t1-t0:.1f}s spark)")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
