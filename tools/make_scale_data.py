"""Generate scaled-up test data for scale sweeps.

Replicates ``documents`` / ``events`` / ``embeddings`` and the OLAP
star (``lineitem``/``orders``/``customer``/``supplier``/``part``,
with consistently shifted join keys; ``nation``/``region`` shared)
from a source scale-factor directory N times, writing parquet to a
target directory (scratch, e.g. /tmp/sf1).  Used for the per-round
scale sweep: sf0.1 -> sf1 is the cheapest available 100x proxy — one
decade of data growth with identical per-row statistics.

Copies must not be trivial clones for the dedup family: identical
text across copies would make every document a 10-way exact
duplicate, changing the workload's dup density instead of its size.
Each copy therefore inserts a copy-specific letter every 7 characters
— every k-shingle of copy i contains letters copy j lacks, so
cross-copy similarity collapses to ~0 while WITHIN-copy near-dup
structure (what the operators actually measure) is preserved
verbatim.  Embedding copies get a deterministic per-copy component
nudge for the same reason.

Usage: python tools/make_scale_data.py [src_sf_dir] [target_dir] [N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scale_tables(spark, src: str, target: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from cubes_spark.sources.workspace import ParquetStore

    # the text salt alphabet and the embedding rotation both repeat
    # past their modulus, which would re-create byte-identical /
    # cosine-aligned cross-copy rows — the exact workload distortion
    # this generator exists to avoid; refuse instead of silently
    # generating a different benchmark
    if factor > 26:
        raise ValueError(
            f"factor {factor} > 26: text salts would repeat "
            "(copies i and i+26 become byte-identical)")
    os.makedirs(target, exist_ok=True)

    # read through the engine's store so timestamp flavors normalize
    # to TIMESTAMP before writing (bare spark.read on driver-written
    # NTZ-annotated files would bake TIMESTAMP_NTZ into the copies'
    # Spark schema metadata)
    store = ParquetStore(spark, src)

    docs = store.table("documents")
    max_doc = docs.agg(F.max("doc_id")).first()[0] or 0
    offset = int(max_doc) + 1
    copies = []
    for i in range(factor):
        salt = chr(ord("a") + (i % 26))
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * offset))
        if i > 0:
            c = c.withColumn(
                "text",
                F.regexp_replace(F.col("text"), "(?s)(.{7})",
                                 f"$1{salt}"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite") \
        .parquet(f"{target}/documents.parquet")

    events = store.table("events")
    max_user = events.agg(F.max("user_id")).first()[0] or 0
    max_event = events.agg(F.max("event_id")).first()[0] or 0
    uoff, eoff = int(max_user) + 1, int(max_event) + 1
    eout = None
    for i in range(factor):
        c = (events
             .withColumn("user_id", F.col("user_id") + F.lit(i * uoff))
             .withColumn("event_id", F.col("event_id") + F.lit(i * eoff)))
        eout = c if eout is None else eout.unionByName(c)
    eout.repartition(32).write.mode("overwrite") \
        .parquet(f"{target}/events.parquet")

    emb = store.table("embeddings")
    first = emb.select("embedding").first()
    dim = len(first[0]) if first and first[0] is not None else 0
    if factor > max(dim - 1, 1):
        raise ValueError(
            f"factor {factor} > embedding dim - 1 ({dim - 1}): "
            "rotations would repeat (cross-copy cosine re-aligns)")
    max_vec = emb.agg(F.max("vec_id")).first()[0] or 0
    voff = int(max_vec) + 1
    vout = None
    for i in range(factor):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * voff))
        if i > 0:
            # rotate the vector by i positions: norm-preserving,
            # deterministic, destroys cross-copy cosine alignment
            c = c.withColumn(
                "embedding",
                F.expr(f"concat(slice(embedding, {i} + 1, "
                       f"size(embedding) - {i}), "
                       f"slice(embedding, 1, {i}))"))
        vout = c if vout is None else vout.unionByName(c)
    vout.repartition(32).write.mode("overwrite") \
        .parquet(f"{target}/embeddings.parquet")

    # -- the OLAP star: lineitem/orders/customer/supplier/part
    #    replicated with consistently shifted keys (copy i's facts
    #    reference copy i's dimension rows, so join structure, fan-out
    #    and per-key cardinalities are preserved exactly); nation and
    #    region are genuinely shared dimensions and copy once — at
    #    scale they stay broadcast-sized by design, which is the point
    store2 = store

    def _offsets(table, key):
        mx = store2.table(table).agg(F.max(key)).first()[0] or 0
        return int(mx) + 1

    ooff = _offsets("orders", "o_orderkey")
    coff = _offsets("customer", "c_custkey")
    soff = _offsets("supplier", "s_suppkey")
    poff = _offsets("part", "p_partkey")

    shifts = {
        "lineitem": {"l_orderkey": ooff, "l_partkey": poff,
                     "l_suppkey": soff},
        "orders": {"o_orderkey": ooff, "o_custkey": coff},
        "customer": {"c_custkey": coff},
        "supplier": {"s_suppkey": soff},
        "part": {"p_partkey": poff},
    }
    for table, keymap in shifts.items():
        src_df = store2.table(table)
        tout = None
        for i in range(factor):
            c = src_df
            for key, off in keymap.items():
                c = c.withColumn(key, F.col(key) + F.lit(i * off))
            tout = c if tout is None else tout.unionByName(c)
        tout.repartition(32).write.mode("overwrite") \
            .parquet(f"{target}/{table}.parquet")
    for table in ("nation", "region"):
        store2.table(table).write.mode("overwrite") \
            .parquet(f"{target}/{table}.parquet")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    target = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from cubes_spark.sources.workspace import default_session

    spark = default_session("make_scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    scale_tables(spark, src, target, factor)
    for t in ("documents", "events", "embeddings", "lineitem",
              "orders", "customer", "supplier", "part", "nation",
              "region"):
        n = spark.read.parquet(f"{target}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
