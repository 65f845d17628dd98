"""Streaming windowed aggregation + custom stateful sessionizer: the
stream==batch equality contracts (SURVEY.md §2.9 — beyond-reference ops)."""

import os

import pytest
from pyspark.sql import functions as F

from ai_invoice_ocr_engine_spark.streaming.windows import (
    closed_sessions_batch,
    stateful_sessions,
    windowed_event_stats,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """events split into 4 time-ordered files so availableNow processing
    crosses several micro-batches (state survival is what's under test)."""
    d = tmp_path_factory.mktemp("events_stream")
    e = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "es_", F.unix_timestamp("ts")
    )
    qs = e.approxQuantile("es_", [0.25, 0.5, 0.75], 0.0)
    bounds = [None, *qs, None]
    for i in range(4):
        part = e
        if bounds[i] is not None:
            part = part.where(F.col("es_") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("es_") <= bounds[i + 1])
        part = part.drop("es_")
        part.coalesce(1).write.parquet(str(d / f"chunk_{i}"))
        for f in (d / f"chunk_{i}").iterdir():
            if f.name.endswith(".parquet"):
                f.rename(d / f"part_{i}.parquet")
        for f in (d / f"chunk_{i}").iterdir():
            f.unlink()
        (d / f"chunk_{i}").rmdir()
    return str(d)


def _run_stream(spark, df_fn, stream_dir, checkpoint, out_mode, name):
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        df_fn(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(out_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_agg_stream_equals_batch(spark, events_stream_dir, tmp_path):
    batch = windowed_event_stats(spark.read.parquet(f"{SF}/events.parquet"))
    stream = _run_stream(
        spark,
        windowed_event_stats,
        events_stream_dir,
        str(tmp_path / "ck_win"),
        "complete",
        "win_stats",
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(stream, cols) == _rows(batch, cols)
    assert stream.count() > 10


def test_stateful_sessions_match_batch_closed(spark, events_stream_dir, tmp_path):
    stream = _run_stream(
        spark,
        stateful_sessions,
        events_stream_dir,
        str(tmp_path / "ck_sess"),
        "append",
        "sessions",
    )
    batch = closed_sessions_batch(spark.read.parquet(f"{SF}/events.parquet"))
    cols = ["user_id", "session_start", "session_end", "n_events"]
    got, want = _rows(stream, cols), _rows(batch, cols)
    assert got == want
    assert len(got) > 5  # sessions actually closed across micro-batches


def test_session_fn_drops_cross_batch_late_events():
    """Cross-batch ordering guard: events inside the open session's span
    fold in (stream==batch equality for in-span out-of-order splits);
    events before the open session's START are dropped — append mode can
    never reopen an emitted session. Drives _session_fn directly with a
    stub GroupState across three micro-batches."""
    import pandas as pd

    from ai_invoice_ocr_engine_spark.streaming.windows import _session_fn

    class StubState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    st = StubState()
    out1 = list(_session_fn(("u1",), iter([pd.DataFrame({"es": [100, 200]})]), st))
    assert out1 == [] and st.get == (100, 200, 2)
    # batch 2: 150 is INSIDE the open span -> folds (count up, last kept by
    # max); 250 extends; 50 is before the open session's start -> dropped
    out2 = list(_session_fn(("u1",), iter([pd.DataFrame({"es": [50, 150, 250]})]), st))
    assert out2 == [] and st.get == (100, 250, 4)
    # batch 3: gap > 1800 closes the session with the folded count
    out3 = list(_session_fn(("u1",), iter([pd.DataFrame({"es": [5000]})]), st))
    assert len(out3) == 1
    row = out3[0].iloc[0]
    assert (row["session_start"], row["session_end"], row["n_events"]) == (100, 250, 4)
    assert st.get == (5000, 5000, 1)
