"""Shared helpers for the LLM-pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Ensure per-row-heavy work (hashing, shingling, vector math) has
    at least ``defaultParallelism`` partitions to run on.

    A small parquet file arrives as one partition and would pin an
    entire hash pipeline to a single core; a 100 TB table already has
    thousands of partitions and passes through untouched — the check
    makes this a no-op exactly when a shuffle would hurt.
    """
    if df.isStreaming:
        # partitioning comes from the source; df.rdd is illegal on a
        # streaming DataFrame — stateless text/dedup expressions run
        # on streams unchanged
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    # NOTE: no inputFiles() fast path — Spark packs small files into
    # shared scan partitions (maxPartitionBytes / openCostInBytes), so
    # "many input files" does NOT imply "many partitions"; the only
    # trustworthy answer is the planned partition count itself
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
