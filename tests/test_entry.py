"""Driver-contract tests: entry() smoke + a representative subset of
queries() cross-checked against oracle_sql() via DuckDB at sf0.001 (the full
set is exercised by tools/check_queries.py at sf0.01)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.001"
SUBSET = [
    "pricing_summary",
    "window_topk_per_customer",
    "sessionize_events",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    return "NULL" if v is None else str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"doc_id", "spans_out", "n_ocr"}
    assert sum(r["n_ocr"] for r in rows) > 0  # OCR actually fired


def test_registry_is_consistent():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(E.oracle_sql()[name])
    assert sorted(sdf.columns) == sorted(res.columns)
    assert _canon(srows, sdf.columns) == _canon(res.fetchall(), list(res.columns))
