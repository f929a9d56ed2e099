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

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),          # TIMESTAMP(NANOS) as long
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

def aggs():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n_events": F.count(F.lit(1)).cast("long"),
        "value_sum": F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double"),
    }


def batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return df.withColumn(
        "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
    )


def normalize(df):
    rows = df.orderBy("window_start", "event_type").collect()
    return [(r["window_start"], r["event_type"], r["n_events"],
             r["value_sum"]) for r in rows]


def test_streaming_equals_batch_tumbling(spark):
    stream = read_parquet_stream(
        spark, f"{SF_DIR}/events.parquet", EVENTS_SCHEMA, ts_unit="nanos"
    )
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
    stream = read_parquet_stream(
        spark, f"{SF_DIR}/events.parquet", EVENTS_SCHEMA, ts_unit="nanos"
    )
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
