"""Declarative data-quality checks over a table.

The validation layer every large-scale pipeline runs before trusting
a load: declare rules, get one row per rule with its violation count
— all row-level rules evaluated in a SINGLE aggregation pass over the
table (conditional sums, map-side combinable), plus one bounded pass
per uniqueness rule and one anti-join per referential rule.  At
100 TB the single-pass property is the difference between "the DQ
suite costs one scan" and "the DQ suite costs one scan per rule".

The reference has model validation (``cubes validate`` — metadata
only); these are DATA checks in the dbt-expectations / Deequ family,
re-expressed as Spark aggregations.

Rule forms (``rules`` is a list of dicts, ``name`` optional):

* ``{"check": "not_null", "column": c}``
* ``{"check": "accepted_values", "column": c, "values": [...]}``
* ``{"check": "in_range", "column": c, "min": lo, "max": hi}``
  (bounds optional — one-sided ranges allowed)
* ``{"check": "matches", "column": c, "pattern": regex}``
* ``{"check": "expression", "expr": sql_bool}`` — violation when the
  SQL predicate is FALSE or NULL
* ``{"check": "unique", "columns": [c, ...]}`` — violations = rows
  beyond the first of each duplicated key
* ``{"check": "foreign_key", "columns": [...], "ref": DataFrame,
  "ref_columns": [...]}`` — child rows (with non-null keys) whose
  key is absent from the reference table
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dq_check", "benford_digits", "BENFORD_PPM"]


def _violation_predicate(rule: Dict[str, Any]) -> Any:
    check = rule["check"]
    if check == "not_null":
        return F.col(rule["column"]).isNull()
    if check == "accepted_values":
        col = F.col(rule["column"])
        return ~col.isin(list(rule["values"])) | col.isNull()
    if check == "in_range":
        col = F.col(rule["column"])
        bad = F.lit(False)
        if rule.get("min") is not None:
            bad = bad | (col < F.lit(rule["min"]))
        if rule.get("max") is not None:
            bad = bad | (col > F.lit(rule["max"]))
        return bad | col.isNull()
    if check == "matches":
        col = F.col(rule["column"])
        return ~col.rlike(rule["pattern"]) | col.isNull()
    if check == "expression":
        return ~F.coalesce(F.expr(rule["expr"]), F.lit(False))
    raise ValueError(f"unknown row-level check: {check}")


def _rule_name(rule: Dict[str, Any]) -> str:
    if "name" in rule:
        return rule["name"]
    target = rule.get("column") \
        or "_".join(rule.get("columns", [])) \
        or rule.get("expr", "")
    return f"{rule['check']}:{target}"


def dq_check(df: DataFrame, rules: Sequence[Dict[str, Any]]
             ) -> DataFrame:
    """Evaluate ``rules`` against ``df``: one output row per rule —
    ``(rule, check, n_rows, n_violations, passed)``.

    Row-level rules share ONE aggregation job over the table; each
    ``unique`` rule adds one map-side-combinable groupBy on its key
    (counting rows beyond the first per duplicated key); each
    ``foreign_key`` rule adds one left-anti join against its (usually
    broadcast-sized) reference.  Results union into a rule-count-
    sized frame.
    """
    rules = list(rules)
    spark = df.sparkSession

    row_rules = [r for r in rules
                 if r["check"] not in ("unique", "foreign_key")]
    results: List[DataFrame] = []

    total = F.count(F.lit(1)).cast("long")
    if row_rules:
        aggs = [total.alias("__n__")] + [
            F.sum(F.when(_violation_predicate(r), 1).otherwise(0))
            .cast("long").alias(f"__v{i}__")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        entries = []
        for i, r in enumerate(row_rules):
            entries.append(F.lit(_rule_name(r)))
            entries.append(F.struct(
                F.lit(r["check"]).alias("check"),
                F.col(f"__v{i}__").alias("v")))
        results.append(wide.select(
            F.explode(F.create_map(*entries)).alias("rule", "__s__"),
            F.col("__n__")).select(
                "rule", F.col("__s__.check").alias("check"),
                F.col("__n__").alias("n_rows"),
                F.col("__s__.v").alias("n_violations")))

    for r in rules:
        if r["check"] == "unique":
            cols = list(r["columns"])
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c__"))
                .agg(F.sum(F.col("__c__") - 1).cast("long")
                     .alias("n_violations"),
                     F.sum("__c__").cast("long").alias("n_rows"))
            )
            results.append(dup.select(
                F.lit(_rule_name(r)).alias("rule"),
                F.lit("unique").alias("check"),
                "n_rows", "n_violations"))
        elif r["check"] == "foreign_key":
            cols = list(r["columns"])
            ref_cols = list(r.get("ref_columns", cols))
            ref = r["ref"].select(
                *[F.col(rc).alias(c)
                  for c, rc in zip(cols, ref_cols)]).distinct()
            child = df.select(*cols).na.drop(subset=cols)
            orphans = child.join(ref, cols, "left_anti").agg(
                F.count(F.lit(1)).cast("long").alias("n_violations"))
            n = df.agg(total.alias("n_rows"))
            results.append(n.crossJoin(orphans).select(
                F.lit(_rule_name(r)).alias("rule"),
                F.lit("foreign_key").alias("check"),
                "n_rows", "n_violations"))

    out = results[0]
    for more in results[1:]:
        out = out.unionAll(more)
    return out.withColumn("passed", F.col("n_violations") == 0)


#: Benford first-digit expectation log10(1 + 1/d), pre-rounded to ppm
#: so both engines compare against identical integer constants.
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910,
               5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757}


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column
    (Benford 1938; the classic fraud/synthetic-data smell test):
    observed first-significant-digit shares vs the log10(1+1/d)
    expectation, all in integer ppm with a per-digit chi-square-style
    deviation term

        dev_ppm = (obs_ppm − exp_ppm)² div exp_ppm

    so the whole audit — shares, expectations, deviations — is
    engine-exact (the irrational logs enter only as the nine
    pre-rounded constants in :data:`BENFORD_PPM`).

    One map-side-combinable groupBy on the digit (9 groups) plus a
    broadcast of the scalar total; the first digit comes from the
    value in CENTS so fractional amounts keep their leading
    significant digit.  Rows ≤ 0 or null are excluded (Benford is
    defined on positive magnitudes).

    Returns ``(digit, n, obs_ppm, exp_ppm, dev_ppm)`` — 9 rows.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    base = (df.select(cents.alias("__c__"), digit.alias("digit"))
            .filter(F.col("__c__") > 0))
    counts = (base.groupBy("digit")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    total = base.agg(F.count(F.lit(1)).cast("long").alias("__N__"))
    exp_expr = "CASE digit " + " ".join(
        f"WHEN {d} THEN {p}L" for d, p in BENFORD_PPM.items()) + " END"
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("obs_ppm", F.expr("(1000000 * n) div __N__"))
            .withColumn("exp_ppm", F.expr(exp_expr))
            .withColumn("dev_ppm", F.expr(
                "((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm))"
                " div exp_ppm"))
            .select("digit", "n", "obs_ppm", "exp_ppm", "dev_ppm"))
