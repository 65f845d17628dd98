"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline (a single broadcast
join + JVM-side `aggregate` fold — no Python, no shuffle beyond the final
top-k); sign-LSH bucketing is the scale path (candidates restricted to the
query's bucket — at 10^12 vectors the bucket histogram also drives skew
decisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)


def cosine_scores(embeddings: DataFrame, query_vec_id: int = 0) -> DataFrame:
    """cos(v, q) for every vector against the query row, JVM-side."""
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    joined = embeddings.where(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    dot = F.expr(_DOT.format(a="embedding", b="qe"))
    nv = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    nq = F.sqrt(F.expr(_DOT.format(a="qe", b="qe")))
    return joined.select(
        "vec_id", "label", F.round(dot / (nv * nq), 4).alias("cos_sim")
    )


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force ANN baseline: global top-k by cosine (deterministic
    tie-break on vec_id)."""
    return (
        cosine_scores(embeddings, query_vec_id)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_bucket(embeddings: DataFrame, n_bits: int = 8) -> DataFrame:
    """Sign-LSH bucket id from the first n_bits dimensions (a deterministic,
    engine-portable stand-in for random-hyperplane LSH)."""
    bucket = sum(
        [
            F.when(F.element_at("embedding", i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(n_bits)
        ],
        F.lit(0),
    ).cast("int")
    return embeddings.select("vec_id", "label", bucket.alias("bucket"))


def lsh_bucket_histogram(embeddings: DataFrame, n_bits: int = 8) -> DataFrame:
    return (
        lsh_bucket(embeddings, n_bits)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def near_dup_pairs(
    embeddings: DataFrame, n_bits: int = 8, min_cos: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: candidates must
    share the sign-LSH bucket (sub-quadratic at scale), then exact cosine
    filters. Returns (vec_a, vec_b, cos_sim)."""
    bucket = sum(
        [
            F.when(F.element_at("embedding", i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(n_bits)
        ],
        F.lit(0),
    ).cast("int")
    e = embeddings.select("vec_id", "embedding", bucket.alias("bucket"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(_DOT.format(a="a.embedding", b="b.embedding"))
    na = F.sqrt(F.expr(_DOT.format(a="a.embedding", b="a.embedding")))
    nb = F.sqrt(F.expr(_DOT.format(a="b.embedding", b="b.embedding")))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (na * nb), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_cos)
    )
