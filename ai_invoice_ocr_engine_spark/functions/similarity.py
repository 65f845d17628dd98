"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline (a single broadcast
join + JVM-side `aggregate` fold — no Python, no shuffle beyond the final
top-k); sign-LSH bucketing is the scale path (candidates restricted to the
query's bucket — at 10^12 vectors the bucket histogram also drives skew
decisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)


def _cosine_to_query(vectors: DataFrame, q: DataFrame) -> DataFrame:
    """Score (vec_id, label, embedding) rows against the single-row query
    frame q(qe) — the one scoring idiom shared by the brute-force and IVF
    paths so rounding/tie-break semantics cannot drift apart."""
    joined = vectors.crossJoin(F.broadcast(q))
    dot = F.expr(_DOT.format(a="embedding", b="qe"))
    nv = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    nq = F.sqrt(F.expr(_DOT.format(a="qe", b="qe")))
    return joined.select(
        "vec_id", "label", F.round(dot / (nv * nq), 4).alias("cos_sim")
    )


def cosine_scores(embeddings: DataFrame, query_vec_id: int = 0) -> DataFrame:
    """cos(v, q) for every vector against the query row, JVM-side."""
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    return _cosine_to_query(
        embeddings.where(F.col("vec_id") != query_vec_id), q
    )


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force ANN baseline: global top-k by cosine (deterministic
    tie-break on vec_id)."""
    return (
        cosine_scores(embeddings, query_vec_id)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _sign_bucket(n_bits: int):
    """Sign-LSH bucket id Column from the first n_bits dimensions (the ONE
    definition shared by lsh_bucket and near_dup_pairs)."""
    return sum(
        [
            F.when(F.element_at("embedding", i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(n_bits)
        ],
        F.lit(0),
    ).cast("int")


def lsh_bucket(embeddings: DataFrame, n_bits: int = 8) -> DataFrame:
    """Sign-LSH bucket id from the first n_bits dimensions (a deterministic,
    engine-portable stand-in for random-hyperplane LSH)."""
    return embeddings.select("vec_id", "label", _sign_bucket(n_bits).alias("bucket"))


def lsh_bucket_histogram(embeddings: DataFrame, n_bits: int = 8) -> DataFrame:
    return (
        lsh_bucket(embeddings, n_bits)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def auto_bits(n_rows: int, dim: int, target_bucket: int = 1024) -> int:
    """Operating curve for the sign-LSH bit width (VERDICT r4 next-step #8).

    A fixed ``n_bits`` is a fixed 2^n_bits bucket space: per-bucket
    population grows linearly with the corpus and every bucket-local join
    grows quadratically — the exact shape the mega-bucket guards below
    exist to catch. The guard bounds the damage; this picks a width where
    it rarely fires: ``n_bits = clamp(ceil(log2(n_rows / target_bucket)),
    4, dim)``, i.e. EXPECTED bucket size ~``target_bucket`` under a
    balanced sign distribution. At 10^12 vectors / target 1024 that is 30
    bits (needs dim >= 30; real embedding dims are 256+). Recall falls as
    bits rise (each extra sign bit halves the chance a true near-dup pair
    co-buckets on THAT bit); tests/test_functions.py pins the two-width
    recall gate so the curve's trade is measured, not assumed. Callers at
    a fixed SF (the oracle registry) pass explicit n_bits; scale runs
    should pass ``auto_bits(corpus_rows, dim)``.
    """
    import math

    if n_rows <= target_bucket:
        return min(4, dim)
    return max(4, min(dim, math.ceil(math.log2(n_rows / target_bucket))))


def _pair_cosine(prefix_a: str = "a", prefix_b: str = "b"):
    """Rounded cosine Column between two aliased embedding sides — the one
    scoring expression shared by every pair path below so guarded and
    unguarded branches cannot drift."""
    dot = F.expr(_DOT.format(a=f"{prefix_a}.embedding", b=f"{prefix_b}.embedding"))
    na = F.sqrt(F.expr(_DOT.format(a=f"{prefix_a}.embedding", b=f"{prefix_a}.embedding")))
    nb = F.sqrt(F.expr(_DOT.format(a=f"{prefix_b}.embedding", b=f"{prefix_b}.embedding")))
    return F.round(dot / (na * nb), 4)


def near_dup_pairs(
    embeddings: DataFrame,
    n_bits: int = 8,
    min_cos: float = 0.99,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: candidates must
    share the sign-LSH bucket (sub-quadratic at scale), then exact cosine
    filters. Returns (vec_a, vec_b, cos_sim).

    MEGA-BUCKET GUARD (VERDICT r4 next-step #1, ported from the MinHash
    star-reduction at functions/dedup.py:minhash_band_pairs and the
    SemDeDup exact-collapse at semdedup_keep_stats): the sign-LSH bucket
    space is fixed at 2^n_bits, so per-bucket population grows linearly
    with the corpus and the within-bucket all-pairs join grows
    quadratically — a 1M-doc identical-embedding flood is ~5x10^11 pairs
    out of ONE bucket. Buckets larger than ``max_bucket`` are therefore
    handled in two lossless-connectivity stages instead of all-pairs:

    1. EXACT-COLLAPSE: group by the embedding VALUE; each exact class
       emits (class-min, member, 1.0) edges — n-1 rows, and identical
       vectors have rounded cosine exactly 1.0, so these are true output
       edges, not candidates (zero-norm classes are excluded: their
       unguarded cosine is NaN and never passes the filter).
    2. REP STAR-REDUCTION: the per-class representatives re-route — if a
       bucket still holds > ``max_bucket`` DISTINCT embeddings, each rep
       scores against the bucket-min rep only (n-1 cosines, min_cos
       filter applied), otherwise reps all-pair as usual.

    Connectivity through the bucket min is preserved (what dup_clusters /
    canonical-per-cluster consume); pair-level recall between non-min
    reps of a still-oversized bucket is deliberately traded away — the
    same documented trade as the MinHash guard. Every bucket's
    contribution is bounded linearly. The routing is a map-side-combinable
    aggregate + left join (NOT a window): the oversized list is EMPTY on
    benign corpora, so AQE turns the probe into a near-free broadcast.
    Below the threshold the semantics are bit-identical to unguarded
    (what the DuckDB oracle mirrors); the adversarial case is pinned by
    tests/test_functions.py::test_embedding_mega_bucket_guard.
    ``max_bucket=None`` disables the guard.
    """
    e = embeddings.select("vec_id", "embedding", _sign_bucket(n_bits).alias("bucket"))

    def _all_pairs(rows: DataFrame) -> DataFrame:
        a, b = rows.alias("a"), rows.alias("b")
        return (
            a.join(
                b,
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                _pair_cosine().alias("cos_sim"),
            )
            .where(F.col("cos_sim") >= min_cos)
        )

    if max_bucket is None:
        return _all_pairs(e)

    over = (
        e.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__sz"))
        .where(F.col("__sz") > max_bucket)
        .select("bucket")
    )
    marked = e.join(over.withColumn("__over", F.lit(1)), "bucket", "left")
    small = marked.where(F.col("__over").isNull()).select("bucket", "vec_id", "embedding")
    big = marked.where(F.col("__over").isNotNull()).select(
        "bucket", "vec_id", "embedding"
    )

    # stage 1: exact-collapse inside oversized buckets (one map-side agg)
    classes = big.groupBy("bucket", "embedding").agg(F.min("vec_id").alias("rep"))
    norm_pos = F.expr(_DOT.format(a="embedding", b="embedding")) > 0
    class_edges = (
        big.join(classes, ["bucket", "embedding"])
        .where((F.col("vec_id") != F.col("rep")) & norm_pos)
        .select(
            F.col("rep").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            F.lit(1.0).alias("cos_sim"),
        )
    )
    reps = classes.select("bucket", F.col("rep").alias("vec_id"), "embedding")

    # stage 2: re-route the representatives
    rover = (
        reps.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__rn"), F.min("vec_id").alias("__min"))
        .where(F.col("__rn") > max_bucket)
        .select("bucket", "__min")
    )
    rmarked = reps.join(rover, "bucket", "left")
    rep_small = rmarked.where(F.col("__min").isNull()).select(
        "bucket", "vec_id", "embedding"
    )
    anchors = rmarked.where(F.col("vec_id") == F.col("__min")).select(
        "bucket", F.col("embedding").alias("anchor_emb")
    )
    star_members = rmarked.where(
        F.col("__min").isNotNull() & (F.col("vec_id") != F.col("__min"))
    ).select("bucket", "vec_id", "embedding", "__min")
    sdot = F.expr(_DOT.format(a="embedding", b="anchor_emb"))
    sna = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    snb = F.sqrt(F.expr(_DOT.format(a="anchor_emb", b="anchor_emb")))
    star_edges = (
        star_members.join(anchors, "bucket")
        .select(
            F.col("__min").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            F.round(sdot / (sna * snb), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_cos)
    )
    return (
        _all_pairs(small.unionByName(rep_small))
        .unionByName(class_edges)
        .unionByName(star_edges)
    )


def reciprocal_knn_pairs(
    embeddings: DataFrame,
    n_bits: int = 4,
    k: int = 3,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Mutual-kNN near-dup graph, sign-LSH bucketed: within each bucket
    every vector ranks its k nearest neighbours by cosine, and an edge is
    kept only when BOTH endpoints rank each other (the reciprocal-kNN
    criterion — asymmetric hub neighbours, the classic false-positive of
    plain kNN near-dup, drop out). Returns (bucket, vec_a, vec_b,
    cos_sim) with vec_a < vec_b.

    Scale posture: the quadratic stage is bucket-local (sub-quadratic
    overall, same bucketing as near_dup_pairs); ranking is a per-
    (bucket, src) window — key cardinality = vector count, no global
    sort; the mutuality check is a self-join of the top-k edge list
    (k·N rows, not N²). Rank order is (rounded cosine DESC, dst) so the
    window is engine-portable.

    MEGA-BUCKET GUARD (VERDICT r4 next-step #1, same machinery as
    near_dup_pairs): buckets over ``max_bucket`` rows skip the all-pairs
    scoring. Exact-duplicate classes collapse to (class-min, member, 1.0)
    edges first — exact twins ARE each other's nearest neighbours, so
    these are genuine mutual edges (for classes wider than k+1 the star
    over-approximates the unguarded tie-break selection; connectivity-
    preserving trade, documented like the MinHash star guard). The
    per-class representatives then run the normal bucket-local kNN when
    <= ``max_bucket`` distinct embeddings remain; a bucket still wider
    than that degrades to the bucket-min rep's own top-k (n-1 cosines,
    bounded output) — at a width where that fires, ``auto_bits`` says the
    bit width is wrong for the corpus. Below the threshold semantics are
    bit-identical to unguarded (the DuckDB-oracle form); the adversarial
    flood is pinned by tests/test_functions.py. ``max_bucket=None``
    disables the guard."""
    e = embeddings.select(
        "vec_id", "embedding", _sign_bucket(n_bits).alias("bucket")
    )
    if max_bucket is not None:
        over = (
            e.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__sz"))
            .where(F.col("__sz") > max_bucket)
            .select("bucket")
        )
        marked = e.join(over.withColumn("__over", F.lit(1)), "bucket", "left")
        small = marked.where(F.col("__over").isNull()).select(
            "vec_id", "embedding", "bucket"
        )
        big = marked.where(F.col("__over").isNotNull()).select(
            "vec_id", "embedding", "bucket"
        )
        classes = big.groupBy("bucket", "embedding").agg(
            F.min("vec_id").alias("rep")
        )
        norm_pos = F.expr(_DOT.format(a="embedding", b="embedding")) > 0
        class_edges = (
            big.join(classes, ["bucket", "embedding"])
            .where((F.col("vec_id") != F.col("rep")) & norm_pos)
            .select(
                "bucket",
                F.col("rep").alias("vec_a"),
                F.col("vec_id").alias("vec_b"),
                F.lit(1.0).alias("cos_sim"),
            )
        )
        reps = classes.select("bucket", F.col("rep").alias("vec_id"), "embedding")
        rover = (
            reps.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__rn"), F.min("vec_id").alias("__min"))
            .where(F.col("__rn") > max_bucket)
            .select("bucket", "__min")
        )
        rmarked = reps.join(rover, "bucket", "left")
        rep_small = rmarked.where(F.col("__min").isNull()).select(
            "vec_id", "embedding", "bucket"
        )
        anchors = rmarked.where(F.col("vec_id") == F.col("__min")).select(
            "bucket", F.col("embedding").alias("anchor_emb")
        )
        star_members = rmarked.where(
            F.col("__min").isNotNull() & (F.col("vec_id") != F.col("__min"))
        ).select("bucket", "vec_id", "embedding", "__min")
        sdot = F.expr(_DOT.format(a="embedding", b="anchor_emb"))
        sna = F.sqrt(F.expr(_DOT.format(a="anchor_emb", b="anchor_emb")))
        snb = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
        star_scored = star_members.join(anchors, "bucket").select(
            "bucket",
            F.col("__min").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            F.round(sdot / (sna * snb), 4).alias("cos_sim"),
        )
        sw = Window.partitionBy("bucket").orderBy(F.desc("cos_sim"), "vec_b")
        star_edges = (
            star_scored.withColumn("rk", F.row_number().over(sw))
            .where(F.col("rk") <= k)
            .drop("rk")
        )
        inner = reciprocal_knn_pairs(
            small.unionByName(rep_small).select("vec_id", "embedding"),
            n_bits=n_bits,
            k=k,
            max_bucket=None,
        )
        return inner.unionByName(class_edges).unionByName(star_edges)
    a = e.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("ea"),
        "bucket",
    )
    b = e.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("eb"),
        "bucket",
    )
    dot = F.expr(_DOT.format(a="ea", b="eb"))
    na = F.sqrt(F.expr(_DOT.format(a="ea", b="ea")))
    nb = F.sqrt(F.expr(_DOT.format(a="eb", b="eb")))
    scored = (
        a.join(b, "bucket")
        .where(F.col("src") != F.col("dst"))
        .select(
            "bucket", "src", "dst",
            F.round(dot / (na * nb), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("bucket", "src").orderBy(F.desc("cos_sim"), "dst")
    edges = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )
    back = edges.select(
        F.col("dst").alias("b_src"), F.col("src").alias("b_dst")
    )
    return (
        edges.where(F.col("src") < F.col("dst"))
        .join(
            back,
            (F.col("src") == F.col("b_src")) & (F.col("dst") == F.col("b_dst")),
        )
        .select(
            "bucket",
            F.col("src").alias("vec_a"),
            F.col("dst").alias("vec_b"),
            "cos_sim",
        )
    )


def semdedup_keep_stats(
    embeddings: DataFrame, n_bits: int = 8, min_cos: float = 0.99
) -> DataFrame:
    """SemDeDup-style embedding pruning (cluster, then drop within-cluster
    cosine near-duplicates keeping one representative — Abbas et al. 2023),
    with the deterministic sign-LSH bucket as the cluster: within each
    bucket, every vector that has a cosine >= ``min_cos`` neighbor of
    SMALLER vec_id is dropped (the module's min-label convention, same as
    line_dedup / substring_dedup). Returns per-bucket acceptance stats
    (bucket, n_vectors, n_reps, n_kept).

    Scale posture — the pair join is guarded by a LOSSLESS exact-duplicate
    collapse: stage 1 groups by the embedding VALUE and keeps the min
    vec_id (one map-side-combinable aggregate), so identical-embedding
    floods — the adversarial mega-bucket case for every banded self-join
    in this package — never reach the pair join at all. Collapse-first
    provably preserves the kept set: an exact twin has cosine 1 with its
    class min, so every non-representative is pruned either way; and any
    pruning a non-representative w could do, its representative (same
    embedding, vec_id <= w) does too. tests/test_functions.py pins this
    equivalence against the unguarded form on a duplicate-heavy corpus.
    """
    e = embeddings.select(
        "vec_id", "embedding", _sign_bucket(n_bits).alias("bucket")
    )
    # ONE full-corpus aggregation: the collapse carries each class's size,
    # so every later count runs over the (much smaller) representative
    # set. PERSISTED because four downstream subtrees reference it and
    # Catalyst re-derives unpersisted common subplans per reference
    # (measured: 12 corpus scans in the unpersisted physical plan, and
    # AQE exchange reuse only recovered 2) — same lineage-truncation
    # device as ivf_centroids and curate.run_curate.
    reps = e.groupBy("bucket", "embedding").agg(
        F.min("vec_id").alias("vec_id"),
        F.count(F.lit(1)).alias("class_n"),
    ).persist()
    pruned = (
        near_dup_pairs(reps.select("vec_id", "embedding"), n_bits, min_cos)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    kept = reps.join(pruned, "vec_id", "left_anti")
    # every bucket keeps at least its smallest representative (nothing can
    # prune it), so the per-bucket counts inner-join losslessly
    return (
        reps.groupBy("bucket")
        .agg(
            F.sum("class_n").alias("n_vectors"),
            F.count(F.lit(1)).alias("n_reps"),
        )
        .join(
            kept.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_kept")),
            "bucket",
        )
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) index — the coarse-quantizer scale path for ANN.
# Pure DataFrame ops: deterministic Lloyd k-means (no RNG, no MLlib), then
# probe-limited search. At 10^12 vectors the assignment table IS the index
# (write it partitioned by cid); a query touches nprobe/k of the corpus.
# --------------------------------------------------------------------------


def _dist2(a: str, b: str):
    """Squared L2 between two array columns, JVM-side."""
    return F.expr(
        "aggregate(zip_with({a}, {b}, (x, y) -> (cast(x as double) - cast(y as double)) *"
        " (cast(x as double) - cast(y as double))), cast(0.0 as double),"
        " (acc, v) -> acc + v)".format(a=a, b=b)
    )


def ivf_centroids(embeddings: DataFrame, k: int = 16, iters: int = 3) -> DataFrame:
    """Lloyd k-means → (cid int, centroid array<double>).

    Init = the k lowest vec_ids (seedless and engine-portable); each
    iteration is one broadcast assignment + one per-dimension mean. Empty
    clusters keep their previous centroid. Each iteration's centroids are
    COLLECTED (k tiny rows) and re-created as a literal DataFrame: this
    truncates the self-referencing lineage (otherwise iteration i re-runs
    every previous iteration's full-corpus assignment — O(iters²) scans)
    and pins the values for every downstream consumer. Per-dimension means
    are quantized to 9 decimals so the ±1-ULP spread of distributed
    float-sum merge order cannot surface in assignments across runs or
    parallelism levels (exact determinism of a distributed double mean is
    not guaranteed by Spark; the quantization absorbs it).
    """
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    e = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    w = Window.orderBy("vec_id")
    cents = (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cid"),
            F.col("v").alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = ivf_assign(e.withColumnRenamed("v", "embedding"), cents)
        means = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("val"), 9).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
        # empty clusters: retain previous centroid (left join + coalesce)
        cents = (
            cents.alias("old")
            .join(means.alias("new"), "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias(
                    "centroid"
                ),
            )
        )
        cents = spark.createDataFrame(
            sorted(((r["cid"], r["centroid"]) for r in cents.collect())),
            "cid int, centroid array<double>",
        )
    return cents


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid (ties → lowest cid).

    The centroids are k tiny rows: collect them into an array-of-structs
    LITERAL and compute the per-row argmin with `transform` + `array_min`
    (struct ordering = (d2, cid), so min gives nearest-then-lowest-cid) —
    a pure projection, zero Exchange. The previous crossJoin + window
    argmin shuffled k×N rows just to pick a per-row minimum; at 10^12
    vectors that shuffle IS the job, this is free. Returns
    (vec_id, cid, embedding)."""
    rows = sorted(
        (int(r["cid"]), [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    )
    cents_lit = ", ".join(
        "named_struct('cid', {cid}, 'c', array({vals}))".format(
            cid=cid,
            vals=", ".join(f"cast('{v!r}' as double)" for v in vec),
        )
        for cid, vec in rows
    )
    d2 = (
        "aggregate(zip_with(cast(embedding as array<double>), s.c,"
        " (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    argmin = (
        f"array_min(transform(array({cents_lit}),"
        f" s -> named_struct('d2', {d2}, 'cid', s.cid))).cid"
    )
    return embeddings.select(
        "vec_id", F.expr(argmin).alias("cid"), "embedding"
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 3,
) -> DataFrame:
    """IVF-probed cosine top-k: scan only the nprobe clusters nearest the
    query. nprobe == n_clusters degrades to exact brute force (tested equal
    to cosine_topk); smaller nprobe trades recall for a 1/nprobe-ish scan.
    Output schema matches cosine_topk (vec_id, label, cos_sim)."""
    cents = ivf_centroids(embeddings, k=n_clusters, iters=iters)
    assigned = ivf_assign(
        embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
        cents,
    )
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").cast("array<double>").alias("qe")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", _dist2("centroid", "qe").alias("d2"))
        .orderBy(F.asc("d2"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    cand = (
        assigned.join(F.broadcast(probe), "cid", "left_semi")
        .where(F.col("vec_id") != query_vec_id)
        .join(embeddings.select("vec_id", "label"), "vec_id")
    )
    return (
        _cosine_to_query(cand, q)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_batch(
    embeddings: DataFrame, query_vec_ids: list[int], k: int = 10
) -> DataFrame:
    """Batched retrieval: top-k by cosine for MANY queries in one pass —
    the shape real pipelines use (score a batch of incoming docs against
    the corpus), vs cosine_topk's single probe.

    The query batch is tiny → broadcast inner join (every corpus partition
    scores all queries locally, one corpus scan total); per-query top-k via
    rank-window over (query_id)-partitioned scores. At 10^12 vectors the
    window shuffle carries Q×N score rows — acceptable for small Q; for
    large query batches compose with ivf_assign so each query only scores
    its probed clusters (candidates drop to Q×N·nprobe/k_clusters).
    Returns (query_id, rank, vec_id, cos_sim), deterministic ties by
    vec_id."""
    from pyspark.sql import Window

    q = embeddings.where(F.col("vec_id").isin(query_vec_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = embeddings.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    )
    dot = F.expr(_DOT.format(a="embedding", b="qe"))
    nv = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    nq = F.sqrt(F.expr(_DOT.format(a="qe", b="qe")))
    scored = joined.select(
        "query_id", "vec_id", F.round(dot / (nv * nq), 4).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_sim")
    )
