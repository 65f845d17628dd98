"""Synthesize a deterministic sf1.0 tier from the driver's sf0.1 parquet
(VERDICT r4 next-step #2: the full-registry sweep needs an sf1 input, and
/root/testdata is read-only with no sf1 tier). Ten key-offset shards of
sf0.1: every fact/dim key is offset by shard x (max_key+1) so referential
integrity is preserved shard-locally; document text gets a per-shard
suffix token and embeddings a per-shard last-dim epsilon so cross-shard
rows are DISTINCT (exact 10x duplication would collapse the dedup-query
workload shape). region/nation stay fixed (TPC-H dims don't scale).
Deterministic: pure arithmetic over the seed-42 source tables, no RNG.

Usage: python tools/make_sf1.py [out_dir]   (default .cache/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHARDS = 10


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def shard_union(template: str) -> str:
        return "\nUNION ALL\n".join(template.format(s=s) for s in range(SHARDS))

    def write(name: str, sql: str) -> None:
        dst = os.path.join(out, f"{name}.parquet")
        con.sql(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    maxes = {}
    for t, k in (
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        maxes[t] = con.sql(
            f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
    maxes["user"] = con.sql(
        f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    C, O, P, S = maxes["customer"], maxes["orders"], maxes["part"], maxes["supplier"]

    write("customer", shard_union(
        f"SELECT c_custkey + {{s}} * {C} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"
    ))
    write("supplier", shard_union(
        f"SELECT s_suppkey + {{s}} * {S} AS s_suppkey, * EXCLUDE (s_suppkey) "
        f"FROM '{SRC}/supplier.parquet'"
    ))
    write("part", shard_union(
        f"SELECT p_partkey + {{s}} * {P} AS p_partkey, * EXCLUDE (p_partkey) "
        f"FROM '{SRC}/part.parquet'"
    ))
    write("orders", shard_union(
        f"SELECT o_orderkey + {{s}} * {O} AS o_orderkey, "
        f"o_custkey + {{s}} * {C} AS o_custkey, "
        f"* EXCLUDE (o_orderkey, o_custkey) FROM '{SRC}/orders.parquet'"
    ))
    write("lineitem", shard_union(
        f"SELECT l_orderkey + {{s}} * {O} AS l_orderkey, "
        f"l_partkey + {{s}} * {P} AS l_partkey, "
        f"l_suppkey + {{s}} * {S} AS l_suppkey, "
        f"* EXCLUDE (l_orderkey, l_partkey, l_suppkey) "
        f"FROM '{SRC}/lineitem.parquet'"
    ))
    write("events", shard_union(
        f"SELECT event_id + {{s}} * {maxes['events']} AS event_id, ts, "
        f"user_id + {{s}} * {maxes['user']} AS user_id, event_type, value, "
        f"props FROM '{SRC}/events.parquet'"
    ))
    write("documents", shard_union(
        f"SELECT doc_id + {{s}} * {maxes['documents']} AS doc_id, "
        f"CASE WHEN {{s}} = 0 THEN text ELSE text || ' s{{s}}' END AS text, "
        f"lang, source, "
        f"CASE WHEN {{s}} = 0 THEN n_chars ELSE n_chars + 3 "
        f"END AS n_chars FROM '{SRC}/documents.parquet'"
    ))
    write("embeddings", shard_union(
        f"SELECT vec_id + {{s}} * {maxes['embeddings']} AS vec_id, "
        f"list_transform(embedding, (x, i) -> CASE WHEN i = len(embedding) "
        f"THEN x + {{s}} * 0.001::float ELSE x END)::float[] AS embedding, "
        f"label FROM '{SRC}/embeddings.parquet'"
    ))
    print(f"sf1 tier written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
