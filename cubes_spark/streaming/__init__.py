"""Structured Streaming layer over the aggregation model.

The reference is strictly batch/request-response (no streaming
anywhere; SURVEY §2.9) — this module is the designed-in extension for
the `events`-style append stream: the SAME logical aggregation
(groupBy window + event keys + aggregate columns) declared once runs
either as a batch DataFrame or incrementally with watermarked state.

Scale design: windowed streaming aggregation is a keyed-state operator
— state is partitioned by (window, keys) across executors, watermarks
bound state size and admit late data up to the threshold, and
`availableNow` triggers process a backlog in bounded batches.  Nothing
here is driver-side.
"""

from cubes_spark.streaming.stream import (
    batch_sessionize,
    compact_aggregate,
    maintain_aggregate,
    read_aggregate,
    read_parquet_stream,
    replay_to_memory,
    session_aggregate,
    stateful_sessionize,
    stream_exact_dedup,
    stream_static_enrich,
    stream_interval_join,
    stream_near_dup_candidates,
    windowed_aggregate,
)

__all__ = [
    "batch_sessionize",
    "read_parquet_stream",
    "windowed_aggregate",
    "session_aggregate",
    "stateful_sessionize",
    "stream_exact_dedup",
    "stream_static_enrich",
    "stream_interval_join",
    "replay_to_memory",
    "maintain_aggregate",
    "read_aggregate",
    "compact_aggregate",
    "stream_near_dup_candidates",
]
