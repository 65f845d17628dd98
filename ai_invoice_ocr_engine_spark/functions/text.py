"""Text analysis over a documents table — language-ID heuristic, quality
scoring, token counting, document fingerprinting. Pure built-in functions
(whole-stage-codegen'd JVM expressions; no Python in the hot path), so the
same logic scales from 500 rows to 10^12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: tiny marker lists for the n-gram/marker language-ID heuristic
EN_MARKERS = ["the", "and", "of", "is", "a", "to", "in"]
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "it"]

#: BPE-ish token regex: letter runs, digit runs, single other non-space
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Unicode script ranges as literal-character classes — literal BMP chars
#: (not \u/\x{} escapes) so the SAME pattern string means the same thing
#: under Java regex (Spark) and RE2 (the DuckDB oracle). Ordered: the
#: order doubles as the deterministic tie-break for the dominant script.
SCRIPT_RANGES = [
    ("latin", "[A-Za-z]"),
    ("cyrillic", f"[{chr(0x0400)}-{chr(0x04FF)}]"),
    ("greek", f"[{chr(0x0370)}-{chr(0x03FF)}]"),
    ("cjk", f"[{chr(0x4E00)}-{chr(0x9FFF)}]"),
]


def with_scripts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode script-mix detection — the multilingual-corpus routing
    stage (which tokenizer / langid model / quality gate a document
    should flow to): per-script character counts, the dominant script
    (ties broken by the fixed SCRIPT_RANGES order), and script purity
    (dominant count / all scripted chars).

    Scale: four regexp projections over the scan — whole-stage codegen,
    no Python, no shuffle; a narrow map at 10^12 docs."""
    counts = {
        name: F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        for name, pat in SCRIPT_RANGES
    }
    cols = [counts[n].alias(f"n_{n}") for n, _ in SCRIPT_RANGES]
    names = [n for n, _ in SCRIPT_RANGES]
    dom = F.lit(names[-1])
    for n in reversed(names[:-1]):
        later = [counts[m] for m in names[names.index(n) + 1:]]
        cond = counts[n] >= later[0]
        for c in later[1:]:
            cond = cond & (counts[n] >= c)
        dom = F.when(cond, F.lit(n)).otherwise(dom)
    total = counts[names[0]]
    for n in names[1:]:
        total = total + counts[n]
    dom_count = F.greatest(*[counts[n] for n in names])
    return docs.select(
        "doc_id",
        *cols,
        dom.alias("dominant_script"),
        F.round(dom_count / F.greatest(total, F.lit(1)), 4).alias("script_purity"),
    )


def with_token_stats(
    docs: DataFrame, text_col: str = "text", carry: tuple = ()
) -> DataFrame:
    """Adds n_tokens / n_bpe_tokens / avg_token_len / stopword_ratio /
    quality_score. Quality formula: length-normalized token count blended
    with (1 - stopword_ratio) — a deterministic stand-in for the usual
    fasttext-style quality models. ``carry`` names extra input columns to
    keep in the projection, so callers composing several per-row gates
    (curate.run_curate) stay in ONE whole-stage-codegen pass instead of
    re-joining stats frames on doc_id."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(F.filter(toks, lambda t: t != F.lit("")))
    # double the backslash: Spark's SQL parser unescapes string literals
    spark_re = TOKEN_RE.replace("\\", "\\\\")
    n_bpe = F.size(F.expr(f"regexp_extract_all({text_col}, '{spark_re}', 0)"))
    n_nonspace = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    avg_len = F.round(n_nonspace / F.greatest(n_tokens, F.lit(1)), 4)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4)
    quality = F.round(
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0)) + 0.6 * (1.0 - stop_ratio), 4
    )
    return docs.select(
        "doc_id",
        *carry,
        n_tokens.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def with_langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic; emits the marker hit-count and the
    prediction next to the corpus's labeled lang for eval."""
    toks = F.split(F.col(text_col), " ")
    en_arr = F.array(*[F.lit(s) for s in EN_MARKERS])
    n_en = F.size(F.filter(toks, lambda t: F.array_contains(en_arr, t)))
    pred = F.when(n_en >= 2, F.lit("en")).otherwise(F.lit("other"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        n_en.alias("n_en_markers"),
        pred.alias("predicted_lang"),
    )


#: double-encoded UTF-8 signature: a latin-1 rendering of a UTF-8 lead
#: byte C2/C3 (U+00C2/U+00C3) followed by a continuation byte rendered as
#: U+0080–U+00BF — the classic "Ã©"/"â€™" mojibake shape. Literal BMP
#: chars (not escapes) so Java regex and RE2 compile the same class.
DOUBLE_ENC_RE = f"[{chr(0xC2)}{chr(0xC3)}][{chr(0x80)}-{chr(0xBF)}]"

#: C0 control characters except whitespace (\t \n \r): decode garbage in
#: web text. \xNN escapes are understood identically by Java regex and RE2.
CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

#: U+FFFD — what a lossy bytes→str decode leaves behind.
REPLACEMENT_RE = f"[{chr(0xFFFD)}]"


def with_encoding_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-quality gate (the CCNet/C4 'is this even valid text' stage):
    per document the count of double-encoded UTF-8 signatures (mojibake),
    U+FFFD replacement characters, and non-whitespace C0 control characters,
    plus the boolean keep flag a curation funnel consumes. A corpus decoded
    with the wrong charset fails loudly here instead of poisoning every
    downstream token statistic.

    Scale shape: three regexp projections over the scan — whole-stage
    codegen, no Python, no shuffle; a narrow map at 10^12 docs."""
    t = F.col(text_col)
    n_dbl = F.size(F.regexp_extract_all(t, F.lit(DOUBLE_ENC_RE), F.lit(0)))
    n_rep = F.size(F.regexp_extract_all(t, F.lit(REPLACEMENT_RE), F.lit(0)))
    n_ctl = F.size(F.regexp_extract_all(t, F.lit(CTRL_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        n_dbl.alias("n_double_enc"),
        n_rep.alias("n_replacement"),
        n_ctl.alias("n_ctrl"),
        ((n_dbl == 0) & (n_rep == 0) & (n_ctl == 0)).alias("encoding_clean"),
    )


def with_repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    top2_th: float = 0.12,
    dup3_th: float = 0.05,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1:
    fraction of the text inside the most common n-gram; fraction of
    duplicate n-grams), on word n-grams: per document the dominant-bigram
    share, the duplicate-trigram fraction, and the keep/drop decision.
    Gopher's published thresholds are char-fractions over full web pages;
    these defaults are calibrated to this corpus's short word-stream docs
    (flag the extreme tail of the measured distribution) and are plain
    parameters for real corpora.

    Scale shape: the duplicate fraction is a per-row linear pass
    (array_distinct, no shuffle). The dominant-bigram count uses
    explode → count(doc_id, bigram) → max(doc_id) — two map-side-combinable
    aggregations — instead of a per-row quadratic fold, so book-length
    documents cost O(len · log) across the cluster, not O(len²) on one core.
    """
    words = docs.select(
        "doc_id",
        F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit("")).alias("ws"),
    )
    grams = words.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.when(F.size("ws") < 2, F.array().cast("array<string>"))
        .otherwise(
            F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        )
        .alias("bis"),
        F.when(F.size("ws") < 3, F.array().cast("array<string>"))
        .otherwise(
            F.expr(
                "transform(sequence(1, size(ws) - 2), "
                "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), "
                "element_at(ws, i + 2)))"
            )
        )
        .alias("tris"),
    )
    top = (
        grams.select("doc_id", F.explode("bis").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_n"))
    )
    s = grams.join(top, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).alias("top_bigram_n"),
        F.when(F.size("bis") == 0, F.lit(0.0))
        .otherwise(F.round(F.coalesce(F.col("top_bigram_n"), F.lit(0)) / F.size("bis"), 4))
        .alias("top_bigram_frac"),
        F.when(F.size("tris") == 0, F.lit(0.0))
        .otherwise(F.round(1.0 - F.size(F.array_distinct("tris")) / F.size("tris"), 4))
        .alias("dup_trigram_frac"),
    )
    keep = (
        F.when((F.col("top_bigram_frac") > top2_th) | (F.col("dup_trigram_frac") > dup3_th), F.lit(0))
        .otherwise(F.lit(1))
    )
    return s.withColumn("keep", keep)


def with_fingerprint(
    docs: DataFrame, text_col: str = "text", carry: tuple = ()
) -> DataFrame:
    """Content fingerprint: 60-bit integer from md5 of the
    whitespace-normalized lowercased text (stable across engines).
    ``carry`` as in with_token_stats."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", "")
    fp = F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint")
    return docs.select(
        "doc_id",
        *carry,
        F.length(norm).alias("n_norm_chars"),
        fp.alias("fingerprint"),
    )


def chunk_windows(docs: DataFrame, window: int = 32, stride: int = 24,
                  text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunking — the context-window packing
    step of a training/RAG pipeline: split each doc into whitespace
    tokens, emit windows of `window` tokens every `stride` (the tail
    window keeps its remainder). One narrow Generate per doc, no
    shuffle at all until a consumer aggregates: at 10^12 docs this is a
    pure map stage that scales with the scan.

    Returns (doc_id, chunk_idx, n_chunk_tokens, chunk_fp) — the chunk
    text itself is fingerprinted rather than materialized so the
    cross-engine check is value-exact without hauling strings around.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    d = docs.select("doc_id", toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest((n - 1), F.lit(0)) - F.pmod(F.greatest(n - 1, F.lit(0)),
                                               F.lit(stride)),
        F.lit(stride),
    )
    # the last window starting before n (ceil((n - window)/stride) + 1
    # windows); windows starting at/after n contribute nothing and are
    # filtered by the slice-size predicate below
    d = d.select(
        "doc_id", "__toks",
        F.posexplode(starts).alias("chunk_idx", "__start"),
    ).where((F.col("__start") == 0) | (F.col("__start") < F.size("__toks")))
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, window)
    chunk_txt = F.array_join(chunk, " ")
    fp = F.conv(F.substring(F.md5(chunk_txt), 1, 15), 16, 10).cast("bigint")
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        fp.alias("chunk_fp"),
    )
