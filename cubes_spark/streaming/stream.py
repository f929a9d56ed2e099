"""Streaming aggregation primitives (tumbling / sliding / session
windows with watermarks) and a deterministic replay harness.

The aggregation shape mirrors the batch browser: event-time window +
group keys → aggregate columns; a streaming result over a replayed
bounded source equals the batch groupBy over the same data (verified in
tests/test_streaming.py).
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "read_parquet_stream",
    "windowed_aggregate",
    "session_aggregate",
    "replay_to_memory",
]


def read_parquet_stream(spark: SparkSession, path: str,
                        schema: StructType,
                        ts_col: str = "ts",
                        ts_unit: Optional[str] = None,
                        max_files_per_trigger: Optional[int] = None) -> DataFrame:
    """Parquet file-source stream.  ``ts_unit='nanos'`` reads a
    TIMESTAMP(NANOS) column declared as long in `schema` and truncates
    to a micro-precision timestamp (Spark cannot read nanos natively;
    see __spark_entry__._table).  ``max_files_per_trigger`` bounds
    per-batch intake for backlog processing."""
    if ts_unit == "nanos":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if os.path.isfile(path):
        # the file-stream source requires a directory; expose a single
        # parquet file through a temp dir symlink
        staging = tempfile.mkdtemp(prefix="cubes_spark_stream_")
        os.symlink(os.path.abspath(path),
                   os.path.join(staging, os.path.basename(path)))
        path = staging
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if ts_unit == "nanos":
        df = df.withColumn(
            ts_col,
            F.timestamp_micros(F.floor(F.col(ts_col) / 1000).cast("long")),
        )
    return df


def windowed_aggregate(events: DataFrame,
                       aggregates: Dict[str, Column],
                       ts_col: str = "ts",
                       window: str = "1 hour",
                       slide: Optional[str] = None,
                       group_by: Optional[Sequence[str]] = None,
                       watermark: Optional[str] = "1 hour") -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time window
    aggregation.

    Works identically on batch and streaming DataFrames — the batch
    form IS the correctness oracle for the streaming form.  With a
    watermark, state for windows older than (max event time − watermark)
    is dropped and later rows are discarded — the standard bounded-state
    contract at scale.
    """
    if events.isStreaming and watermark:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide \
        else F.window(ts_col, window)
    keys = [win.alias("window")] + [F.col(k) for k in (group_by or [])]
    out = events.groupBy(*keys).agg(
        *[col.alias(name) for name, col in aggregates.items()]
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in (group_by or [])],
        *[F.col(name) for name in aggregates],
    )


def session_aggregate(events: DataFrame,
                      aggregates: Dict[str, Column],
                      ts_col: str = "ts",
                      gap: str = "30 minutes",
                      group_by: Optional[Sequence[str]] = None,
                      watermark: Optional[str] = "1 hour") -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    session per group key (native ``session_window`` state merging —
    no custom stateful operator needed)."""
    if events.isStreaming and watermark:
        events = events.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    keys = [win.alias("session")] + [F.col(k) for k in (group_by or [])]
    out = events.groupBy(*keys).agg(
        *[col.alias(name) for name, col in aggregates.items()]
    )
    return out.select(
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *[F.col(k) for k in (group_by or [])],
        *[F.col(name) for name in aggregates],
    )


def replay_to_memory(stream_df: DataFrame, query_name: str,
                     timeout_sec: int = 120) -> DataFrame:
    """Run a streaming aggregation over a bounded source to completion
    (``availableNow`` trigger, complete mode) and return the final
    result as a batch DataFrame from the memory sink."""
    spark = stream_df.sparkSession
    checkpoint = tempfile.mkdtemp(prefix="cubes_spark_ckpt_")
    query = (
        stream_df.writeStream
        .format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(checkpoint, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    return spark.table(query_name)
