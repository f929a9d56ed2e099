"""Streaming ⇔ batch equivalence: the same windowed aggregation over a
replayed bounded `events` source must equal the batch groupBy oracle."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from cubes_spark.streaming import (
    read_parquet_stream,
    replay_to_memory,
    session_aggregate,
    windowed_aggregate,
)
from tests.conftest import SF_DIR

def aggs():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n_events": F.count(F.lit(1)).cast("long"),
        "value_sum": F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double"),
    }


def batch_events(spark):
    # schema-adaptive: ParquetStore converts genuine TIMESTAMP(NANOS)
    # columns and reads anything else (micros/millis) natively
    from cubes_spark.sources.workspace import ParquetStore
    return ParquetStore(spark, SF_DIR).table("events")


def normalize(df):
    rows = df.orderBy("window_start", "event_type").collect()
    return [(r["window_start"], r["event_type"], r["n_events"],
             r["value_sum"]) for r in rows]


def test_streaming_equals_batch_tumbling(spark):
    stream = read_parquet_stream(spark, f"{SF_DIR}/events.parquet")
    assert stream.isStreaming
    windowed = windowed_aggregate(
        stream, aggs(), window="1 hour", group_by=["event_type"],
        watermark="2 hours",
    )
    result = replay_to_memory(windowed, "stream_tumbling")

    batch = windowed_aggregate(
        batch_events(spark), aggs(), window="1 hour",
        group_by=["event_type"],
    )
    assert normalize(result) == normalize(batch)
    assert len(normalize(result)) > 0


def test_streaming_sliding_window(spark):
    stream = read_parquet_stream(spark, f"{SF_DIR}/events.parquet")
    windowed = windowed_aggregate(
        stream, aggs(), window="2 hours", slide="1 hour",
        watermark="2 hours",
    )
    result = replay_to_memory(windowed, "stream_sliding")
    batch = windowed_aggregate(
        batch_events(spark), aggs(), window="2 hours", slide="1 hour",
    )
    # every batch row appears in the streaming result (sliding windows
    # double-count rows by design)
    b = {(r["window_start"], r["n_events"], r["value_sum"])
         for r in batch.collect()}
    s = {(r["window_start"], r["n_events"], r["value_sum"])
         for r in result.collect()}
    assert b == s


def test_session_aggregate_batch(spark):
    # batch form of session windows over a tiny synthetic trace
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "u1"),
        (2, base + dt.timedelta(minutes=10), "u1"),   # same session
        (3, base + dt.timedelta(minutes=60), "u1"),   # new session
        (4, base + dt.timedelta(minutes=5), "u2"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = session_aggregate(
        df, {"n": F.count(F.lit(1)).cast("long")},
        gap="30 minutes", group_by=["user_id"],
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["n"])
    assert sorted(by_user["u1"]) == [1, 2]
    assert by_user["u2"] == [1]


def test_stateful_sessionize_replay(spark, tmp_path):
    """applyInPandasWithState custom sessionization: closed sessions
    emitted in append mode; the per-key open session stays in state
    (Structured Streaming's append contract on a bounded replay)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from cubes_spark.streaming import (
        read_parquet_stream,
        replay_to_memory,
        stateful_sessionize,
    )

    def t(minute):
        return pd.Timestamp(2024, 1, 1, 10, minute)

    rows = [
        # user 1: session A (3 events), gap, session B (1 event, open)
        (1, t(0), 1, "view", 1.5),
        (2, t(1), 1, "click", 2.0),
        (3, t(2), 1, "buy", 0.25),
        (4, t(30), 1, "view", 1.0),
        # user 2: one session, stays open -> not emitted
        (5, t(5), 2, "view", 9.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    src = str(tmp_path / "events")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = read_parquet_stream(spark, src, schema)
    sessions = stateful_sessionize(
        stream, gap_seconds=600, watermark="3650 days",
        value_col="value",
    )
    out = replay_to_memory(sessions, "t_sessions", output_mode="append")
    got = {r["user_id"]: r for r in out.collect()}

    assert list(got) == [1]            # only user 1 closed a session
    s = got[1]
    assert s["session_start"] == t(0)
    assert s["session_end"] == t(2)
    assert s["n_events"] == 3
    assert s["value_usum"] == 3_750_000          # floor(3.75e6)
    assert s["event_seq"] == "view>click>buy"


def test_stateful_sessionize_timeout_branch():
    """The event-time-timeout path emits the open session and clears
    state — exercised directly against a scripted GroupState."""
    import pandas as pd

    from cubes_spark.streaming.stream import make_session_fn

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (1_000_000, 2_000_000, 2, 123, "a>b")
        removed = False

        def remove(self):
            self.removed = True

        def update(self, value):
            raise AssertionError("timeout branch must not update state")

    fn = make_session_fn(600, 8, "ts", "value", "event_type", "event_id")
    state = FakeState()
    out = list(fn((7,), iter([]), state))
    assert state.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["user_id"] == 7
    assert row["session_start"] == pd.Timestamp(1_000_000, unit="us")
    assert row["session_end"] == pd.Timestamp(2_000_000, unit="us")
    assert row["n_events"] == 2
    assert row["value_usum"] == 123
    assert row["event_seq"] == "a>b"


def test_stateful_sessionize_state_carry():
    """A second micro-batch continues the open session from state and
    closes it when the gap passes."""
    import pandas as pd

    from cubes_spark.streaming.stream import make_session_fn

    class FakeState:
        hasTimedOut = False
        exists = False
        stored = None
        timeout_ms = None

        @property
        def get(self):
            return self.stored

        def update(self, value):
            self.stored = value
            self.exists = True

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def remove(self):
            self.stored = None
            self.exists = False

    fn = make_session_fn(60, 8, "ts", "value", "event_type", "event_id")
    state = FakeState()

    def batch(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value"])

    t0 = pd.Timestamp(2024, 1, 1, 0, 0, 0)
    out1 = list(fn((1,), iter([batch([
        (1, t0, 1, "view", 1.0),
        (2, t0 + pd.Timedelta(seconds=30), 1, "click", 1.0),
    ])]), state))
    assert out1 == []                       # session still open
    assert state.stored[2] == 2             # n carried in state

    # next batch: first event continues, second is past the gap
    out2 = list(fn((1,), iter([batch([
        (3, t0 + pd.Timedelta(seconds=60), 1, "buy", 1.0),
        (4, t0 + pd.Timedelta(seconds=300), 1, "view", 2.0),
    ])]), state))
    assert len(out2) == 1
    closed = out2[0].iloc[0]
    assert closed["n_events"] == 3
    assert closed["event_seq"] == "view>click>buy"
    assert state.stored[2] == 1             # new open session in state


def test_watermark_finalizes_append_windows(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): append mode emits
    EXACTLY the windows finalized by the watermark — a window stays
    held back until the watermark passes its end, and a late row
    arriving while its window's state is still open merges into it
    (Spark's contract: the watermark finalizes/evicts state; dropping
    older rows is permitted, only eviction is guaranteed)."""
    import time as _time

    import pandas as pd

    from pyspark.sql import functions as F
    from cubes_spark.streaming import (
        read_parquet_stream,
        replay_to_memory,
        windowed_aggregate,
    )

    import glob
    import os

    src = str(tmp_path / "events")

    def write(rows, mode):
        pdf = pd.DataFrame(rows, columns=["ts", "k", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode(mode) \
            .parquet(src)

    t = lambda h, m=0: pd.Timestamp(2024, 1, 1, h, m)  # noqa: E731
    # batch 1: max event time 11:00 -> watermark 10:00 (1h)
    write([(t(10, 30), "a", 1.0), (t(11, 0), "a", 1.0)], "overwrite")
    first_files = set(glob.glob(os.path.join(src, "*.parquet")))
    # batch 2: a LATE row at 08:30 (< watermark) + on-time 11:30
    write([(t(8, 30), "a", 100.0), (t(11, 30), "a", 1.0)], "append")
    # file-source order is by modification time — pin it explicitly
    now = _time.time()
    for f in glob.glob(os.path.join(src, "*.parquet")):
        os.utime(f, (now - 1000, now - 1000) if f in first_files
                 else (now, now))

    schema = spark.read.parquet(src).schema
    stream = read_parquet_stream(spark, src, schema,
                                 max_files_per_trigger=1)
    agg = windowed_aggregate(
        stream,
        {"n": F.count(F.lit(1)).cast("long")},
        window="1 hour", watermark="1 hour",
    )
    out = replay_to_memory(agg, "t_late", output_mode="append")
    windows = {r["window_start"]: r["n"] for r in out.collect()}

    # final watermark = 11:30 - 1h = 10:30.  Exactly the windows with
    # end <= 10:30 are emitted: the late 08:30 row's window (merged
    # while its state was open, then finalized).  The 10:00-11:00 and
    # 11:00-12:00 windows are still open — append holds them back.
    assert windows == {t(8): 1}


def test_stream_exact_dedup_cross_batch(spark, tmp_path):
    """Streaming ingest dedup: a duplicate arriving in a LATER
    micro-batch is dropped by keyed state (dropDuplicatesWithin-
    Watermark on the content hash)."""
    import glob
    import os
    import time as _time

    import pandas as pd

    from cubes_spark.streaming import (
        read_parquet_stream,
        replay_to_memory,
        stream_exact_dedup,
    )

    src = str(tmp_path / "docs")

    def write(rows, mode):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        spark.createDataFrame(pdf).coalesce(1).write.mode(mode) \
            .parquet(src)

    t0 = pd.Timestamp(2024, 1, 1, 10)
    write([(1, t0, "hello world"),
           (2, t0, "something else")], "overwrite")
    first = set(glob.glob(os.path.join(src, "*.parquet")))
    write([(3, t0 + pd.Timedelta(minutes=5), "HELLO   world"),  # dup
           (4, t0 + pd.Timedelta(minutes=5), "fresh content")],
          "append")
    now = _time.time()
    for f in glob.glob(os.path.join(src, "*.parquet")):
        os.utime(f, (now - 1000, now - 1000) if f in first
                 else (now, now))

    schema = spark.read.parquet(src).schema
    stream = read_parquet_stream(spark, src, schema,
                                 max_files_per_trigger=1)
    deduped = stream_exact_dedup(stream, ts_col="ts")
    out = replay_to_memory(deduped, "t_sdedup", output_mode="append")
    kept = sorted(r["doc_id"] for r in out.collect())
    # doc 3 is a normalized duplicate of doc 1 from the PREVIOUS batch
    assert kept == [1, 2, 4]


def test_stream_exact_dedup_batch_mode(spark):
    """Batch fallback keeps one row per normalized content."""
    from cubes_spark.streaming import stream_exact_dedup

    df = spark.createDataFrame(
        [(1, "a  b"), (2, "A B"), (3, "c")], ["doc_id", "text"]
    )
    out = stream_exact_dedup(df)
    assert out.count() == 2


def test_text_ops_run_on_streams(spark, tmp_path):
    """Stateless text operators (quality stats, language ID, PII
    redaction) are narrow maps — the same expressions run unchanged on
    a streaming DataFrame."""
    import pandas as pd

    from cubes_spark.llm import redact_pii, text_stats
    from cubes_spark.streaming import read_parquet_stream

    src = str(tmp_path / "docs")
    pdf = pd.DataFrame(
        [(1, "the quick brown fox, mail me at a@b.co")],
        columns=["doc_id", "text"],
    )
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = read_parquet_stream(spark, src, schema)
    annotated = redact_pii(text_stats(stream))
    assert annotated.isStreaming

    import tempfile

    q = (annotated.writeStream.format("memory").queryName("t_textstream")
         .outputMode("append")
         .option("checkpointLocation", tempfile.mkdtemp() + "/cp")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    row = spark.table("t_textstream").collect()[0]
    assert row["n_email"] == 1
    assert "[EMAIL]" in row["text_redacted"]
    assert row["quality_score"] > 0


def test_batch_sessionize(spark):
    """Window-function sessionization: islands enumerable by hand;
    includes each user's final session (unlike the streaming append
    contract)."""
    from datetime import datetime, timezone

    from cubes_spark.streaming import batch_sessionize

    def ts(minute):
        return datetime(2024, 1, 1, 10, minute, tzinfo=timezone.utc)

    rows = [
        # user 1: two sessions (gap 40 min > 30 min)
        (1, ts(0), 1, "view", 1.5),
        (2, ts(10), 1, "click", 2.0),
        (3, ts(50), 1, "buy", 3.25),
        # user 2: one session
        (4, ts(5), 2, "view", 0.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = sorted(batch_sessionize(df, gap_seconds=1800).collect(),
                 key=lambda r: (r.user_id, r.session_start))
    assert len(out) == 3
    s1, s2, s3 = out
    assert (s1.user_id, s1.n_events, s1.event_seq) == (1, 2, "view>click")
    assert s1.value_usum == 3_500_000
    assert (s2.user_id, s2.n_events, s2.event_seq) == (1, 1, "buy")
    assert s2.session_start == s2.session_end
    assert (s3.user_id, s3.n_events) == (2, 1)
    # boundary: exactly the gap does NOT split (strict >)
    df2 = spark.createDataFrame(
        [(1, ts(0), 9, "a", 1.0), (2, ts(30), 9, "b", 1.0)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    assert batch_sessionize(df2, gap_seconds=1800).count() == 1


def test_batch_sessionize_custom_type_col(spark):
    """Every payload column is parameterizable — a frame without an
    'event_type' column sessionizes via type_col."""
    from datetime import datetime, timezone

    from cubes_spark.streaming import batch_sessionize

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, tzinfo=timezone.utc),
          7, "open", 1.0),
         (2, datetime(2024, 1, 1, 10, 5, tzinfo=timezone.utc),
          7, "close", 2.0)],
        "event_id long, ts timestamp, user_id long, "
        "kind string, value double")
    out = batch_sessionize(df, gap_seconds=1800,
                           type_col="kind").collect()
    assert len(out) == 1
    assert out[0].event_seq == "open>close"


def test_stateful_sessionize_null_value_and_late_event(spark, tmp_path):
    """Null values must not kill the micro-batch (batch F.sum skips
    nulls but counts the event), and a late within-gap event must
    widen the open session, never move last-seen backwards."""
    import json
    import os

    from cubes_spark.streaming import replay_to_memory, \
        stateful_sessionize

    src = tmp_path / "events"
    src.mkdir()

    def write(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # batch 1: two events; batch 2: a LATE event between them (same
    # session), then a gap-closing event whose distance from the TRUE
    # latest (10:20) exceeds the gap while its distance from the late
    # event (10:05) would wrongly exceed it twice over
    write("b1.jsonl", [
        {"user_id": 1, "ts": "2024-01-01T10:00:00", "event_id": 1,
         "event_type": "a", "value": 1.0},
        {"user_id": 1, "ts": "2024-01-01T10:20:00", "event_id": 2,
         "event_type": "b", "value": None},
    ])
    write("b2.jsonl", [
        {"user_id": 1, "ts": "2024-01-01T10:05:00", "event_id": 3,
         "event_type": "c", "value": 2.0},
        {"user_id": 1, "ts": "2024-01-01T11:00:00", "event_id": 4,
         "event_type": "d", "value": 4.0},
    ])
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, "
            "event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src)))
    sessions = stateful_sessionize(stream, gap_seconds=1800,
                                   watermark="2 hours")
    out = replay_to_memory(sessions, "null_late_sessions",
                           output_mode="append")
    rows = sorted(out.collect(), key=lambda r: r.session_start)
    # first session: events 1, 3(late), 2 — span 10:00..10:20,
    # value sum 3.0 (null contributes 0)
    assert rows[0].n_events == 3
    assert rows[0].session_start.minute == 0
    assert rows[0].session_end.minute == 20
    assert rows[0].value_usum == 3_000_000


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream interval join == the same join in batch mode:
    bounded replay through two watermarked file streams produces
    exactly the batch interval-join pairs."""
    import datetime

    from cubes_spark.streaming import (
        read_parquet_stream,
        replay_to_memory,
        stream_interval_join,
    )

    def _dt(minute):
        return datetime.datetime(2024, 1, 1, 10, minute)

    rows = [
        # (event_id, ts, user_id, kind, value)
        (1, _dt(0), 1, "click", 1.0),
        (2, _dt(20), 1, "purchase", 10.0),   # joins click 1 (20m gap)
        (3, _dt(55), 1, "purchase", 11.0),   # 55m gap: out of window
        (4, _dt(5), 2, "click", 2.0),
        (5, _dt(10), 2, "click", 3.0),
        (6, _dt(30), 2, "purchase", 12.0),   # joins BOTH clicks
        (7, _dt(15), 3, "purchase", 13.0),   # no clicks for user 3
    ]
    src = str(tmp_path / "ij_events.parquet")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "kind string, value double"
    ).write.parquet(src)

    def sides(df_source):
        p = df_source.filter(F.col("kind") == "purchase").select(
            F.col("event_id").alias("pid"), "user_id", "ts")
        c = df_source.filter(F.col("kind") == "click").select(
            F.col("event_id").alias("cid"), "user_id",
            F.col("ts").alias("click_ts"))
        return p, c

    p, c = sides(read_parquet_stream(spark, src))
    joined = stream_interval_join(
        p, c, on="user_id", left_ts="ts", right_ts="click_ts",
        lower_seconds=1800, upper_seconds=0, watermark="1 hour")
    got = replay_to_memory(joined, "t_ij", output_mode="append")
    pairs = {(r.pid, r.cid) for r in got.collect()}
    assert pairs == {(2, 1), (6, 4), (6, 5)}

    # batch mode, same helper, same answer
    bp, bc = sides(spark.read.parquet(src))
    batch = stream_interval_join(
        bp, bc, on="user_id", left_ts="ts", right_ts="click_ts",
        lower_seconds=1800, upper_seconds=0)
    assert {(r.pid, r.cid) for r in batch.collect()} == pairs


def test_streaming_countmin_equals_batch(spark, tmp_path):
    """Windowed count-min grid built incrementally on a stream ==
    the batch grid over the same data."""
    import datetime

    from cubes_spark.functions.sketches import countmin_sketch
    from cubes_spark.streaming import (
        read_parquet_stream,
        replay_to_memory,
    )

    rows = [(i, datetime.datetime(2024, 1, 1 + i % 3, i % 24),
             f"k{i % 11}") for i in range(300)]
    src = str(tmp_path / "cm_events.parquet")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, k string"
    ).write.parquet(src)

    batch = countmin_sketch(
        spark.read.parquet(src), "k", depth=3, width=32,
        window="1 day", ts_col="ts")
    stream = countmin_sketch(
        read_parquet_stream(spark, src), "k", depth=3, width=32,
        window="1 day", ts_col="ts")
    got = replay_to_memory(stream, "t_cm_stream")
    key = lambda r: (r.window_start, r.row, r.bucket, r.n)
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, batch.collect()))


def test_stream_interval_join_left_outer_batch(spark):
    """Left-outer interval join keeps unmatched left rows (batch
    mode; the streaming path shares the same condition)."""
    import datetime

    from cubes_spark.streaming import stream_interval_join

    d = datetime.datetime
    left = spark.createDataFrame(
        [(1, 7, d(2024, 1, 1, 10, 30)), (2, 8, d(2024, 1, 1, 10, 0))],
        "pid long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, 7, d(2024, 1, 1, 10, 15))],
        "cid long, user_id long, click_ts timestamp")
    out = stream_interval_join(
        left, right, on="user_id", left_ts="ts",
        right_ts="click_ts", lower_seconds=1800, upper_seconds=0,
        how="left_outer")
    got = {r.pid: r.cid for r in out.collect()}
    assert got == {1: 10, 2: None}


def test_streaming_incremental_cuboid_maintenance(spark, tmp_path):
    """Incremental view maintenance from a stream: each micro-batch's
    PARTIAL aggregate merges into a parquet cuboid (union + re-group
    of distributive states — the refresh_aggregate math driven by
    foreachBatch), and after the bounded replay the cuboid equals the
    batch aggregate of everything."""
    import datetime
    import os

    from pyspark.sql import functions as F

    from cubes_spark.streaming import read_parquet_stream

    d = datetime.datetime
    src = str(tmp_path / "ivm_events")
    os.makedirs(src)
    # three files -> three micro-batches with maxFilesPerTrigger=1
    for b in range(3):
        rows = [(b * 100 + i, d(2024, 1, 1 + b, i % 24),
                 f"t{i % 3}", float(i)) for i in range(50)]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, kind string, v double"
        ).coalesce(1).write.parquet(src, mode="append")

    cuboid = str(tmp_path / "cuboid")

    def merge_batch(batch_df, batch_id):
        part = batch_df.groupBy("kind").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(20,2)")).alias("v_sum"))
        if os.path.exists(cuboid):
            existing = batch_df.sparkSession.read.parquet(cuboid)
            part = existing.unionByName(part).groupBy("kind").agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("v_sum").alias("v_sum"))
        part = part.localCheckpoint(eager=True)  # break read->write
        part.write.mode("overwrite").parquet(cuboid)

    stream = read_parquet_stream(spark, src, max_files_per_trigger=1)
    q = (stream.writeStream.foreachBatch(merge_batch)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r.kind: (r.n, float(r.v_sum))
           for r in spark.read.parquet(cuboid).collect()}
    expect = {r.kind: (r.n, float(r.v_sum))
              for r in spark.read.parquet(src).groupBy("kind").agg(
                  F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum(F.col("v").cast("decimal(20,2)"))
                  .alias("v_sum")).collect()}
    assert got == expect


def test_streaming_hll_equals_batch(spark, tmp_path):
    """Windowed HLL registers built incrementally on a stream == the
    batch registers over the same data; the estimate from the
    streamed registers is exact-arithmetic identical too."""
    import datetime

    from cubes_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )
    from cubes_spark.streaming import (
        read_parquet_stream,
        replay_to_memory,
    )

    rows = [(i, datetime.datetime(2024, 1, 1 + i % 3, i % 24),
             f"user{i % 97}") for i in range(600)]
    src = str(tmp_path / "hll_events.parquet")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, u string"
    ).write.parquet(src)

    batch = hll_registers(
        spark.read.parquet(src), "u", m=32, window="1 day",
        ts_col="ts")
    stream = hll_registers(
        read_parquet_stream(spark, src), "u", m=32, window="1 day",
        ts_col="ts")
    got = replay_to_memory(stream, "t_hll_stream")
    key = lambda r: (r.window_start, r.bucket, r.register)
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, batch.collect()))
    est_s = {(r.window_start, r.hll_est) for r in
             hll_estimate(got, ["window_start"], m=32).collect()}
    est_b = {(r.window_start, r.hll_est) for r in
             hll_estimate(batch, ["window_start"], m=32).collect()}
    assert est_s == est_b
    for _, est in est_s:
        assert abs(est - 97) * 2 <= 97        # ±50% of true 97


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    """Stream-static broadcast enrichment == the same join + windowed
    aggregation run in batch; rows whose key is absent from the
    dimension are dropped by the inner join on both paths."""
    import datetime

    from cubes_spark.streaming import (
        read_parquet_stream,
        replay_to_memory,
        stream_static_enrich,
        windowed_aggregate,
    )

    rows = [(i, datetime.datetime(2024, 3, 1 + i % 2, i % 24),
             ["click", "view", "purchase", "ghost"][i % 4], float(i))
            for i in range(400)]
    src = str(tmp_path / "enrich_events.parquet")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(src)
    dim = spark.createDataFrame(
        [("click", "engage", 2), ("view", "engage", 1),
         ("purchase", "convert", 10)],
        "event_type string, category string, w long").cache()

    aggs = {
        "n": F.count(F.lit(1)).cast("long"),
        "w_sum": F.sum("w").cast("long"),
    }

    def run(df):
        return windowed_aggregate(
            stream_static_enrich(df, dim, on="event_type"),
            aggs, window="1 hour", group_by=["category"],
            watermark="2 hours")

    got = replay_to_memory(run(read_parquet_stream(spark, src)),
                           "t_enrich_stream")
    key = lambda r: (r.window_start, r.category, r.n, r.w_sum)
    batch = run(spark.read.parquet(src))
    assert sorted(map(key, got.collect())) \
        == sorted(map(key, batch.collect()))
    # 'ghost' events have no dimension row -> dropped, never aggregated
    assert all(r.category in ("engage", "convert")
               for r in got.collect())


class TestMaintainAggregate:
    """Streaming cuboid maintenance: per-batch partial partitions,
    idempotent on batch replay, merge-on-read, compaction."""

    AGGS = {
        "n_events": ("count", None),
        "value_sum": ("sum", "__vdec__"),
        "value_max": ("max", "__vdec__"),
    }

    def _staged(self, spark, tmp_path, n_files=3):
        src = str(tmp_path / "events_files")
        batch_events(spark).repartition(n_files) \
            .write.mode("overwrite").parquet(src)
        return src

    def _stream(self, spark, src):
        return read_parquet_stream(
            spark, src, max_files_per_trigger=1
        ).select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("value").cast("decimal(20,6)").alias("__vdec__"),
        )

    def _expected(self, spark):
        return {
            (r.event_type, r.hour): (r.n, float(r.s), float(r.m))
            for r in batch_events(spark).groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("hour")
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(20,6)"))
                .cast("double").alias("s"),
                F.max(F.col("value").cast("decimal(20,6)"))
                .cast("double").alias("m"),
            ).collect()
        }

    def _read(self, spark, path):
        from cubes_spark.streaming import read_aggregate
        return {
            (r.event_type, r.hour):
            (r.n_events, float(r.value_sum), float(r.value_max))
            for r in read_aggregate(spark, path, self.AGGS).collect()
        }

    def test_multi_batch_equals_batch(self, spark, tmp_path):
        from cubes_spark.streaming import maintain_aggregate

        src = self._staged(spark, tmp_path)
        log = str(tmp_path / "log")
        maintain_aggregate(self._stream(spark, src), log,
                           ["event_type", "hour"], self.AGGS,
                           query_name="t_maintain_multi")
        # one partial partition per micro-batch (one file per trigger)
        batches = {r["__batch_id__"] for r in spark.read.parquet(log)
                   .select("__batch_id__").distinct().collect()}
        assert len(batches) == 3
        assert self._read(spark, log) == self._expected(spark)

    def test_replay_is_idempotent(self, spark, tmp_path):
        from cubes_spark.streaming import maintain_aggregate

        src = self._staged(spark, tmp_path)
        log = str(tmp_path / "log")
        maintain_aggregate(self._stream(spark, src), log,
                           ["event_type", "hour"], self.AGGS,
                           query_name="t_maintain_once")
        # a fresh checkpoint replays batches 0..n-1 with the SAME ids:
        # dynamic partition overwrite must REPLACE, not duplicate
        maintain_aggregate(self._stream(spark, src), log,
                           ["event_type", "hour"], self.AGGS,
                           query_name="t_maintain_again")
        assert self._read(spark, log) == self._expected(spark)

    def test_compaction_preserves_and_shrinks(self, spark, tmp_path):
        from cubes_spark.streaming import (compact_aggregate,
                                           maintain_aggregate)

        src = self._staged(spark, tmp_path)
        log = str(tmp_path / "log")
        maintain_aggregate(self._stream(spark, src), log,
                           ["event_type", "hour"], self.AGGS,
                           query_name="t_maintain_compact")
        before = self._read(spark, log)
        compact_aggregate(spark, log, self.AGGS)
        batches = {r["__batch_id__"] for r in spark.read.parquet(log)
                   .select("__batch_id__").distinct().collect()}
        assert batches == {-1}
        assert self._read(spark, log) == before == self._expected(spark)

    def test_fresh_checkpoint_over_compacted_log_refuses(
            self, spark, tmp_path):
        # batch-id idempotency holds only while the original checkpoint
        # lives: a fresh checkpoint replays batch ids 0..n over the
        # folded __batch_id__=-1 partition and would double-count —
        # batch 0 must refuse, leaving the log intact
        from cubes_spark.streaming import (compact_aggregate,
                                           maintain_aggregate)

        src = self._staged(spark, tmp_path)
        log = str(tmp_path / "log")
        maintain_aggregate(self._stream(spark, src), log,
                           ["event_type", "hour"], self.AGGS,
                           query_name="t_maintain_guard")
        compact_aggregate(spark, log, self.AGGS)
        with pytest.raises(Exception, match="double-count"):
            maintain_aggregate(self._stream(spark, src), log,
                               ["event_type", "hour"], self.AGGS,
                               query_name="t_maintain_guard2")
        assert self._read(spark, log) == self._expected(spark)

    def test_resume_with_checkpoint_after_compaction(
            self, spark, tmp_path):
        # the supported continuation: same checkpoint → new files get
        # NEW batch ids alongside the retained -1 partition
        from cubes_spark.streaming import (compact_aggregate,
                                           maintain_aggregate)

        src = self._staged(spark, tmp_path)
        log = str(tmp_path / "log")
        ckpt = str(tmp_path / "ckpt")
        maintain_aggregate(self._stream(spark, src), log,
                           ["event_type", "hour"], self.AGGS,
                           query_name="t_maintain_resume",
                           checkpoint=ckpt)
        compact_aggregate(spark, log, self.AGGS)
        # one more source file lands (duplicate rows: totals double)
        batch_events(spark).coalesce(1).write.mode("append").parquet(src)
        maintain_aggregate(self._stream(spark, src), log,
                           ["event_type", "hour"], self.AGGS,
                           query_name="t_maintain_resume2",
                           checkpoint=ckpt)
        batches = {r["__batch_id__"] for r in spark.read.parquet(log)
                   .select("__batch_id__").distinct().collect()}
        assert -1 in batches and len(batches) == 2
        merged = self._read(spark, log)
        for key, (n, s, m) in self._expected(spark).items():
            assert merged[key] == (2 * n, 2 * s, m), key

    def test_nondistributive_raises(self, spark, tmp_path):
        from cubes_spark.errors import ArgumentError
        from cubes_spark.streaming import maintain_aggregate

        src = self._staged(spark, tmp_path, n_files=1)
        with pytest.raises(ArgumentError):
            maintain_aggregate(
                self._stream(spark, src), str(tmp_path / "log"),
                ["event_type"], {"value_avg": ("avg", "__vdec__")},
                query_name="t_maintain_bad")


def test_maintain_aggregate_invariant_to_batch_split(spark, tmp_path):
    """The maintained cuboid must be IDENTICAL however the stream is
    split into micro-batches — partial merges are exact (decimal/long)
    so batch boundaries can't leak into results."""
    from cubes_spark.streaming import maintain_aggregate, read_aggregate

    aggs = {
        "n_events": ("count", None),
        "value_sum": ("sum", "__vdec__"),
        "value_min": ("min", "__vdec__"),
    }

    def build(n_files, tag):
        src = str(tmp_path / f"src_{tag}")
        # deterministic subset (NOT limit(), whose row pick is
        # scheduling-dependent): both builds stage identical rows,
        # differing only in file split
        batch_events(spark).filter(F.col("event_id") % 5 == 0) \
            .repartition(n_files) \
            .write.mode("overwrite").parquet(src)
        stream = read_parquet_stream(
            spark, src, max_files_per_trigger=1
        ).select(
            "event_type",
            F.col("value").cast("decimal(20,6)").alias("__vdec__"),
        )
        log = str(tmp_path / f"log_{tag}")
        maintain_aggregate(stream, log, ["event_type"], aggs,
                           query_name=f"t_split_{tag}")
        return {
            r.event_type: (r.n_events, str(r.value_sum),
                           str(r.value_min))
            for r in read_aggregate(spark, log, aggs).collect()
        }

    one = build(1, "one")
    five = build(5, "five")
    assert one == five


def test_stream_near_dup_equals_batch(spark, tmp_path):
    """Streaming near-dup candidates == the batch window join.  The
    replay uses an effectively-unbounded watermark (the bounded-replay
    pattern of the other streaming entries) so parity holds for ANY
    micro-batch arrival order — the file source breaks mtime ties
    arbitrarily, so same-second staged files can replay out of
    event-time order, and a short watermark would then (correctly,
    per the late-data contract) drop the late side.  Pins both the
    stateless per-row banding and the stream-stream self-join."""
    from cubes_spark.llm.dedup import row_minhash_bands
    from cubes_spark.sources.workspace import ParquetStore
    from cubes_spark.streaming import (replay_to_memory,
                                       stream_near_dup_candidates)
    from tests.conftest import SF_DIR

    docs = ParquetStore(spark, SF_DIR).table("documents").withColumn(
        "ts",
        F.expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval("
               "0, 0, 0, 0, 0, CAST(doc_id AS INT), 0)"))
    src = str(tmp_path / "docs")
    docs.repartitionByRange(3, "ts").write.mode("overwrite") \
        .parquet(src)

    batch = {
        tuple(r) for r in stream_near_dup_candidates(
            spark.read.parquet(src), horizon_seconds=1800
        ).select("id_old", "id_new", "band_id").collect()
    }
    stream = read_parquet_stream(spark, src, max_files_per_trigger=1)
    got = {
        tuple(r) for r in replay_to_memory(
            stream_near_dup_candidates(stream, horizon_seconds=1800,
                                       watermark="3650 days"),
            "t_stream_near_dup", output_mode="append"
        ).select("id_old", "id_new", "band_id").collect()
    }
    assert got == batch
    # sanity on the blocking itself: every candidate pair shares at
    # least one band in the row-wise banding
    banded = row_minhash_bands(docs)
    bb = {}
    for r in banded.collect():
        bb.setdefault(r.doc_id, set()).add((r.band_id, r.band_hash))
    for id_old, id_new, _band in batch:
        assert bb[id_old] & bb[id_new]
