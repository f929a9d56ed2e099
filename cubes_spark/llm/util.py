"""Shared helpers for the LLM-pipeline operators."""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame

__all__ = ["spread", "libm_ln", "let_", "lit_double_array"]


def lit_double_array(values) -> Column:
    """A literal ``array<double>`` column built as ONE SQL expression.

    ``F.array(*[F.lit(v) for v in vals])`` issues one py4j round trip
    per element — measured 0.78 s of pure plan-CONSTRUCTION time for a
    1024-element plane/codebook matrix (r14 opt round), paid on every
    operator call.  Python ``repr`` of a float is its shortest
    round-tripping decimal form and Spark's parser reads double
    literals with the same IEEE-754 round-trip, so the parsed array is
    bit-identical to the ``F.lit`` one (test-asserted); one ``F.expr``
    parse costs ~4 ms.  Falls back to ``F.lit`` construction when a
    value is non-finite (inf/nan have no SQL literal form).
    """
    import math

    from pyspark.sql import functions as F

    vals = [float(v) for v in values]
    if vals and all(math.isfinite(v) for v in vals):
        return F.expr(
            "array(" + ",".join(repr(v) + "D" for v in vals) + ")")
    # empty: bare array() would be array<string>/array<null>, not
    # array<double> — keep the F.lit path's analysis behaviour
    return F.array(*[F.lit(v) for v in vals]).cast("array<double>")


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` ONCE and use it many times inside ``body`` — a
    let-expression for the Column algebra.

    Catalyst does NOT eliminate common subexpressions across
    higher-order-function lambda bodies: a captured expression like a
    ``regexp_replace`` normalization referenced from a per-element
    ``transform`` lambda is re-evaluated for EVERY element, turning an
    O(n) pass into O(n²) (measured 69 s vs 7 s on 10k-char documents
    for character shingling).  Wrapping the expression as the single
    element of an array and binding it through a ``transform`` lambda
    variable forces one evaluation; lambda-variable references inside
    ``body`` are plain value reads.

    Prefer materializing a real column (``withColumn``) when a
    DataFrame is at hand; ``let_`` is for pure Column-level helpers
    that cannot see the DataFrame.
    """
    from pyspark.sql import functions as F

    return F.get(F.transform(F.array(value), body), F.lit(0))


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


def libm_ln(col):
    """Natural log computed by the C library (``math.log``) through
    an Arrow-batched pandas UDF — NOT the JVM's ``Math.log``.

    The two disagree by 1 ulp on ~2% of integer inputs (measured:
    37/2000 of ln(1..2000), e.g. ln(3) = ...96 JVM vs ...98 glibc),
    and DuckDB uses the C library — so any oracle-checked operator
    whose OUTPUT carries raw ln values must route them through this
    instead of ``F.expr("ln(...)")``, or the value hash diverges at
    the last double bit.  Intended for BOUNDED frames (top-k terms,
    category counts): the Python hop is a few hundred rows, never the
    fact table.  NULL and non-positive inputs yield NULL like SQL ln.
    """
    import math

    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _ln(s: pd.Series) -> pd.Series:
        return s.map(lambda v: math.log(v)
                     if v is not None and v > 0 else None)

    return _ln(col)
