"""Streaming operators: watermarked windowed aggregation and a custom
stateful sessionizer (``applyInPandasWithState``).

The reference has no streaming surface (SURVEY.md §2.9 — its only
concurrency is an in-process ThreadPool, /root/reference/engine.py:57-58).
These are the beyond-reference pieces a continuously-ingesting corpus needs:

  * ``windowed_event_stats`` — tumbling-window counts/sums with a watermark
    bounding state for late data. The SAME function body runs on a batch or
    a streaming DataFrame (withWatermark is a no-op in batch), so the
    stream==batch equality test pins the semantics.
  * ``stateful_sessions`` — gap-based sessionization as explicit keyed state
    (the streaming twin of queries.q_sessionize_events' lag+cumsum window,
    itself the relational shape of the reference's reading-order line scan,
    /root/reference/postprocess.py:54-68). Closed sessions are emitted as
    soon as the gap proves them closed; the open tail session per user rides
    in the GroupState between micro-batches.

Scale posture: state is per-key (user) and O(1) per key — a watermark bounds
window state, the session state holds one open session per user AND idle
keys are evicted by a processing-time timeout (emit-and-clear), so state is
bounded by ACTIVE users, not every user_id ever seen. Both operators shuffle
once on the grouping key and then stream.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: gap (seconds) after which a new session starts — matches
#: queries.q_sessionize_events
SESSION_GAP_S = 1800

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", IntegerType()),
    ]
)


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type stats; batch and streaming DataFrames accept
    the identical plan (stream==batch equality is tested)."""
    # watermarks require TIMESTAMP (with local tz); parquet NTZ columns cast
    # losslessly under the engine's fixed UTC session timezone
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


#: default idle eviction: a user silent for this long (processing time) has
#: their open session emitted and their state cleared — keyed state stays
#: bounded by ACTIVE users instead of growing with every user_id ever seen
IDLE_TIMEOUT_MS = 3_600_000


def _session_fn(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int | None = IDLE_TIMEOUT_MS,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events (sorted by time) into the per-user
    open-session state; emit every session the gap closes. On an idle
    timeout the open session is emitted and the key's state removed
    (emit-and-clear — the same trade the watermark makes for late data:
    an event arriving after eviction starts a fresh session)."""
    if state.hasTimedOut:
        open_s = tuple(state.get) if state.exists else None
        state.remove()
        if open_s is not None:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [open_s[0]],
                    "session_end": [open_s[1]],
                    "n_events": [open_s[2]],
                }
            )
        return
    es: list[int] = []
    for pdf in pdfs:
        es.extend(int(v) for v in pdf["es"])
    es.sort()
    open_s: tuple[int, int, int] | None = tuple(state.get) if state.exists else None
    # Cross-batch late-data guard: an event older than the OPEN session's
    # START arrived out of order ACROSS micro-batches and may belong to a
    # session already emitted — append mode can never reopen one, so it is
    # dropped (the same trade a watermark makes). Events WITHIN the open
    # session's span are safe: they cannot touch any emitted session, so
    # they fold in (count up; `last` via max so a mid-span event never
    # regresses it) — keeping stream==batch equality for in-span
    # out-of-order splits.
    if open_s is not None:
        es = [t for t in es if t >= open_s[0]]
    closed: list[tuple[int, int, int]] = []
    for t in es:
        if open_s is None:
            open_s = (t, t, 1)
        elif t - open_s[1] > SESSION_GAP_S:
            closed.append(open_s)
            open_s = (t, t, 1)
        else:
            open_s = (open_s[0], max(open_s[1], t), open_s[2] + 1)
    if open_s is not None:
        state.update(open_s)
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def stateful_sessions(
    events: DataFrame, idle_timeout_ms: int | None = IDLE_TIMEOUT_MS
) -> DataFrame:
    """events(user_id, ts) → closed sessions via explicit keyed state.

    Ordering contract: WITHIN a micro-batch events may arrive in any order
    (sorted before folding); ACROSS micro-batches an event inside the open
    session's span folds in safely, while an event older than the open
    session's START is DROPPED (it may belong to an already-emitted
    session, which append mode can never reopen — the same trade a
    watermark makes for the built-in session_window). A user idle for
    ``idle_timeout_ms`` of processing time has their open session emitted
    and their keyed state REMOVED (state stays bounded by active users on
    an unbounded-key stream); ``None`` disables eviction and keeps the
    final open session per user in state.
    """
    import functools

    fn = functools.partial(_session_fn, idle_timeout_ms=idle_timeout_ms)
    prepped = events.select("user_id", F.unix_timestamp("ts").alias("es"))
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def closed_sessions_batch(events: DataFrame) -> DataFrame:
    """Batch oracle for ``stateful_sessions``: lag+cumsum sessionization,
    minus each user's final (still-open) session."""
    from pyspark.sql import Window

    e = events.select("user_id", F.unix_timestamp("ts").alias("es"))
    w = Window.partitionBy("user_id").orderBy("es")
    flagged = e.withColumn(
        "new_s",
        F.when(
            F.lag("es").over(w).isNull()
            | ((F.col("es") - F.lag("es").over(w)) > SESSION_GAP_S),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sess = flagged.groupBy("user_id", "session_id").agg(
        F.min("es").alias("session_start"),
        F.max("es").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )
    last = sess.groupBy("user_id").agg(F.max("session_id").alias("last_id"))
    return (
        sess.join(last, "user_id")
        .where(F.col("session_id") != F.col("last_id"))
        .select("user_id", "session_start", "session_end", "n_events")
    )


def streaming_dedup_events(events: DataFrame,
                           watermark: str = "240 hours") -> DataFrame:
    """Cross-micro-batch exact dedup: first sighting of each
    (user_id, event_type) pair wins, duplicates in LATER micro-batches
    are suppressed by keyed state. dropDuplicatesWithinWatermark keeps
    that state bounded by the watermark horizon — the plain
    dropDuplicates variant never evicts and is the same slow OOM the
    sessionizer's idle timeout exists to prevent. With a watermark at
    least as long as the corpus span, the stream output equals the
    batch DISTINCT (tested); with a shorter one, duplicates farther
    apart than the horizon intentionally re-emit — that's the
    state-size/completeness trade every 10^12-row streaming dedup has
    to pick."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    gap_s: int = SESSION_GAP_S,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream INNER interval join: every right event
    within ``(l_ts, l_ts + gap_s]`` of a left event by the same user —
    the streaming attribution join (click -> purchase within the window).

    Both sides carry a watermark and the join condition bounds right-time
    against left-time, which is exactly what lets Spark EVICT join state:
    a buffered left row older than (right watermark - gap) can never match
    again and is dropped, so state is bounded by the watermark horizon ×
    event rate, not the stream's lifetime. Without the time bound this
    would be an ever-growing state OOM — the same failure mode the
    sessionizer's idle timeout and the dedup's withinWatermark variant
    exist to prevent. The SAME function body runs on batch DataFrames
    (watermarks are a no-op there), so stream==batch equality is testable
    and tested.
    """
    l = left.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("l_ts"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").cast("timestamp").alias("r_ts"),
        F.col("event_type").alias("r_type"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (l["user_id"] == r["r_user"])
        & (r["r_ts"] > l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {int(gap_s)} SECONDS"))
    )
    return l.join(r, cond, "inner").select(
        "user_id",
        F.unix_timestamp("l_ts").alias("left_ts"),
        F.unix_timestamp("r_ts").alias("right_ts"),
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("lag_s"),
    )
