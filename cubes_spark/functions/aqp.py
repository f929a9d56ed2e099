"""Approximate query processing from bounded weighted samples.

Priority sampling (Duffield, Lund & Thorup, JACM 2007): draw a
FIXED-SIZE weighted sample such that any subset-sum of the weight
column can later be estimated without rescanning the facts — the
sample IS the synopsis.  Near-optimal variance among all k-sample
schemes, and the BlinkDB-style answer to "total revenue by segment,
now, off a 100 TB fact table": maintain one k-row sample per
partition grain, estimate from it, bound the error.

The reference has nothing like it (its aggregates always rescan the
facts — SURVEY §2.4); Spark's ``TABLESAMPLE`` is unweighted and
non-deterministic across runs.

Determinism: the uniform draw for a row is the portable md5 hash of
its id (``u ∈ [1, 2^60)``), the priority is ``q = w·2^60 / u``
computed in DECIMAL(38,0), ranks break ties by id — so the sample,
the threshold and every estimate are a pure function of the data and
replayable bit-for-bit by a SQL oracle (DuckDB HUGEINT arithmetic).

Scale shape: priorities are a narrow projection; per-group top-k is
one rank window after a map-side ``_partition_topk``-style prune is
unnecessary here because the window input is already one row per
fact row — the shuffle is on the GROUP key (same as the aggregation
it replaces) and AQE handles skew.  The k+1 rows per group kept are
the complete mergeable state.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cubes_spark.llm.text import hash64

__all__ = ["priority_sample", "priority_estimate"]

#: 2^60 — exclusive upper bound of the portable hash space
_HASH_SPACE = 1 << 60
#: priorities are clamped here so they stay BIGINT-safe; a clamped
#: priority only ever TIES other clamped ones (ids break the tie),
#: and max(w, tau) is unaffected for any real weight
_CLAMP = 4 << 60


def priority_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str, group_cols: Optional[list] = None,
                    salt: str = "ps") -> DataFrame:
    """The k+1 highest-priority rows per group: ``(group...,
    id, weight, priority, rank)`` with ``rank`` 1..k+1.

    ``weight_col`` must be a non-negative INTEGER column (pre-scale
    money to cents).  Row k+1 is kept because its priority is the
    Horvitz-Thompson threshold tau; estimation uses rows 1..k and
    tau (:func:`priority_estimate`).  Rows with zero weight draw
    priority 0 and are never sampled ahead of any weighted row.
    """
    from pyspark.sql import Window

    group_cols = list(group_cols or [])
    u = hash64(F.concat(F.lit(salt + ":"),
                        F.col(id_col).cast("string"))) + 1
    q = F.expr(
        f"CAST(least((CAST(weight AS DECIMAL(38,0)) * "
        f"CAST({_HASH_SPACE} AS DECIMAL(38,0))) div "
        f"CAST(__u__ AS DECIMAL(38,0)), "
        f"CAST({_CLAMP} AS DECIMAL(38,0))) AS BIGINT)")
    staged = df.select(
        *group_cols, F.col(id_col).alias("id"),
        F.col(weight_col).cast("long").alias("weight"),
        u.alias("__u__"),
    ).withColumn("priority", q).drop("__u__")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("priority").desc(), F.col("id").asc())
    return (
        staged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k + 1)
    )


def priority_estimate(sample: DataFrame, k: int,
                      group_cols: Optional[list] = None) -> DataFrame:
    """Unbiased subset-sum estimate per group from a
    :func:`priority_sample`: ``(group..., est_sum, n_sampled)``.

    Horvitz-Thompson weights: with tau = the (k+1)-th priority (0
    when the group has ≤ k rows — the sample is then complete and
    the estimate EXACT), each sampled row contributes
    ``max(weight, tau)`` and ``est_sum = Σ_{rank≤k} max(w_i, tau)``.
    Filter the sample first to estimate any sub-population's sum
    from the same synopsis — that is the point of the method.
    """
    group_cols = list(group_cols or [])
    tau = sample.filter(F.col("rank") == k + 1).select(
        *group_cols, F.col("priority").alias("__tau__"))
    kept = sample.filter(F.col("rank") <= k)
    if group_cols:
        joined = kept.join(tau, group_cols, "left")
    else:
        # no group: tau is one row (or absent); a constant-key left
        # join keeps the plan uniform
        joined = (kept.withColumn("__k__", F.lit(1))
                  .join(tau.withColumn("__k__", F.lit(1)),
                        "__k__", "left").drop("__k__"))
    contrib = F.greatest(
        F.col("weight"), F.coalesce(F.col("__tau__"), F.lit(0)))
    return (
        joined.groupBy(*group_cols)
        .agg(F.sum(contrib).cast("long").alias("est_sum"),
             F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
