"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the point of this module):

* **Never all-pairs.**  Candidate generation is always a *bucketed
  equi-join* — identical hash (exact), an equal LSH band (MinHash), or
  an equal SimHash band (pigeonhole) — so the shuffle is keyed by
  bucket and the comparison count is sum-of-squares *per bucket*, not
  N².  At 100 TB the bucket key distributes; a skewed bucket (e.g. the
  empty document) is bounded by dropping over-full buckets
  (``max_bucket_size``), the standard LSH skew guard.
* **Portable hashing** (md5-derived, see ``text.hash64``) so a DuckDB
  oracle reproduces signatures bit-for-bit.
* All expressions are native ``pyspark.sql.functions`` — JVM-side,
  codegen'd, no Python in the row path.

SimHash banding is *exact* for a Hamming-distance threshold: splitting
``nbits`` into ``d+1`` bands guarantees any pair within distance ``d``
agrees on at least one full band (pigeonhole), so candidates ⊇ true
pairs and the final distance filter makes the result identical to the
all-pairs answer — verified against an all-pairs DuckDB oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cubes_spark.llm.text import hash64, token_array
from cubes_spark.llm.util import spread

__all__ = [
    "content_hash",
    "source_shingle_overlap",
    "exact_duplicates",
    "dedup_against",
    "duplicate_spans",
    "span_duplicate_docs",
    "benchmark_contamination",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "row_minhash_bands",
    "simhash",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "connected_components",
    "duplicate_clusters",
    "fuzzy_pairs",
    "jaccard_similarity_join",
    "minhash_recall",
    "dedup_keep_best",
    "DEFAULT_MAX_BUCKET_SIZE",
]

#: Default LSH bucket-size cap.  A bucket of m members emits m² candidate
#: pairs; at 100 TB the degenerate buckets (empty documents, boilerplate)
#: are the first thing that explodes, so over-full buckets are dropped BY
#: DEFAULT.  4096² ≈ 17M comparisons is a bounded worst case per bucket;
#: content shared by >4096 documents is exact-duplicate territory, which
#: ``exact_duplicates`` handles in one hash-groupBy.  Pass
#: ``max_bucket_size=None`` to disable.
DEFAULT_MAX_BUCKET_SIZE = 4096


def _bucket_pairs(banded: DataFrame, keys: list, id_col: str,
                  payload_col: str,
                  max_bucket_size: Optional[int]) -> DataFrame:
    """Ordered in-bucket candidate pairs from banded rows — the LSH
    pair generator, shaped as ONE shuffle.

    ``groupBy(bucket) → collect sorted (id, payload) members → nested
    explode`` replaces the banded equi-self-join: the join form
    shuffles the banded rows twice (once per branch) and needs either a
    persisted upstream or a full recompute, plus a separate
    guard pass; this form shuffles them once, needs no persist (the
    signature pipeline is consumed exactly once), and the skew guard is
    a free ``size(members) <= max_bucket_size`` filter on the collected
    bucket — no count aggregation, no broadcast anti-join.

    Memory is bounded: a bucket row holds at most ``max_bucket_size``
    members (cap 4096 → ≤ ~4 MB), and the pair explosion streams
    through two chained generators — the per-row partner slice is
    O(bucket), never the O(bucket²) flattened pair list.  Members are
    sorted by id, so ``id_a < id_b`` holds by construction and each
    bucket emits each pair exactly once (cross-bucket duplicates are
    dropped by the caller)."""
    member = F.struct(F.col(id_col).alias("__id__"),
                      F.col(payload_col).alias("__p__"))
    buckets = (
        banded.groupBy(*keys)
        .agg(F.array_sort(F.collect_list(member)).alias("__members__"))
        .filter(F.size("__members__") >= 2)
    )
    if max_bucket_size is not None:
        # the standard LSH skew guard: degenerate buckets (empty
        # documents, boilerplate shared by thousands) are mass-duplicate
        # territory that exact_duplicates handles in one hash-groupBy
        buckets = buckets.filter(F.size("__members__") <= max_bucket_size)
    lefts = buckets.select(
        F.col("__members__"),
        F.posexplode("__members__").alias("__i__", "__a__"),
    )
    partners = F.slice(
        F.col("__members__"),
        F.col("__i__") + F.lit(2),
        F.size("__members__") - F.col("__i__") - F.lit(1),
    )
    return (
        lefts.select(F.col("__a__"), F.explode(partners).alias("__b__"))
        .select(
            F.col("__a__.__id__").alias("id_a"),
            F.col("__a__.__p__").alias("payload_a"),
            F.col("__b__.__id__").alias("id_b"),
            F.col("__b__.__p__").alias("payload_b"),
        )
    )


def content_hash(text: Column, normalize: bool = True) -> Column:
    """Per-document content hash (md5 over whitespace-normalized
    lowercased text) — the exact-dedup key."""
    if normalize:
        text = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(text)


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     normalize: bool = True) -> DataFrame:
    """Exact-duplicate clusters via hash group-by.

    Returns one row per duplicated content: ``(content_hash,
    cluster_size, canonical_id)`` where ``canonical_id`` is the minimum
    id of the cluster.  Hash-groupBy is the scalable primitive: one
    shuffle keyed by a well-distributed 128-bit hash.
    """
    hashed = spread(df).select(
        content_hash(F.col(text_col), normalize).alias("content_hash"),
        F.col(id_col),
    )
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("cluster_size") > 1)
    )


def _token_span_hashes(df: DataFrame, text_col: str, id_col: str,
                       k: int) -> DataFrame:
    """(id, span_hash) for every k-token span: local explode of the
    whitespace-token array, 64-bit portable hash, span text never
    leaves the stage."""
    toks = spread(df).select(
        F.col(id_col), token_array(F.col(text_col)).alias("t"))
    starts = F.when(
        F.size("t") >= k,
        F.sequence(F.lit(1), F.size("t") - F.lit(k - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return toks.select(
        F.col(id_col),
        F.explode(
            F.transform(starts,
                        lambda i: F.array_join(F.slice("t", i, k), " "))
        ).alias("span"),
    ).select(F.col(id_col), hash64(F.col("span")).alias("span_hash"))


def duplicate_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 8,
                    min_docs: int = 2) -> DataFrame:
    """Exact substring dedup: token spans shared across documents.

    The corpus-level counterpart of near-dup LSH (the shape of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, which uses a suffix array on one giant
    concatenation): every run of ``k`` consecutive whitespace tokens is
    hashed, and a span is *duplicated* when it occurs in at least
    ``min_docs`` distinct documents.  Returns ``(span_hash, n_docs,
    n_occurrences, canonical_id)`` per duplicated span.

    Scale shape: tokens explode locally (factor ≈ document length, same
    as MinHash shingling), only the 64-bit md5-derived span hash is
    shuffled (never the span text), and the group-by is map-side
    combinable.  No joins, one shuffle, portable hashes — a SQL oracle
    replays it exactly.
    """
    return (
        _token_span_hashes(df, text_col, id_col, k)
        .groupBy("span_hash")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def span_duplicate_docs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        min_docs: int = 2) -> DataFrame:
    """Per-document duplicated-span exposure: ``(id, n_dup_spans,
    n_spans, dup_fraction)``.  Documents whose spans are mostly shared
    are boilerplate/copy candidates; ``filter(dup_fraction > x)`` is
    the removal policy knob.

    THREE shuffles, zero joins, single evaluation of the span explode:
    per-(doc, hash) counts → a count window keyed by the hash (rows
    per hash = distinct docs, since already grouped) → per-doc rollup.
    The join formulation evaluated the explode three times and paid
    seven exchanges for the same answer.

    Skew note: a span shared by millions of documents concentrates
    its (doc, hash) rows in one window partition.  Such mega-spans are
    mass-duplicate territory — surface them with
    :func:`duplicate_spans` and drop them up front (the same guard
    philosophy as the LSH ``max_bucket_size`` cap)."""
    from pyspark.sql.window import Window

    spans = _token_span_hashes(df, text_col, id_col, k)
    per = spans.groupBy(id_col, "span_hash").agg(
        F.count(F.lit(1)).alias("c"))
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("span_hash"))
    marked = per.withColumn("n_docs", n_docs)
    out = marked.groupBy(id_col).agg(
        F.sum("c").alias("n_spans"),
        F.sum(F.when(F.col("n_docs") >= min_docs, F.col("c"))
              .otherwise(F.lit(0))).alias("n_dup_spans"),
    )
    return out.select(
        F.col(id_col),
        F.col("n_dup_spans"),
        F.col("n_spans"),
        F.round(F.col("n_dup_spans").cast("double")
                / F.col("n_spans"), 4).alias("dup_fraction"),
    )


def benchmark_contamination(corpus: DataFrame, benchmark: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id", k: int = 8,
                            threshold: float = 0.5,
                            broadcast: bool = True) -> DataFrame:
    """Test-set decontamination: per-corpus-document overlap with a
    benchmark corpus, measured as the fraction of the document's
    *distinct* k-token spans that also occur anywhere in the benchmark
    (the n-gram-collision decontamination of the GPT-2/GPT-3 data
    work).  Returns ``(id, n_grams, n_overlap, contaminated)``;
    ``contaminated`` = overlap fraction >= `threshold` (computed in
    exact integer arithmetic: ``n_overlap * 10000 >= threshold_bp *
    n_grams``).

    Scale shape: the per-document gram set is deduped INSIDE the row
    (``array_distinct`` before the explode — no corpus-wide distinct
    shuffle), the benchmark gram set (eval/test suites — thousands of
    docs, not terabytes) is deduped and broadcast by default so the
    membership test is map-side, and ONE group-by keyed by document id
    is the only corpus shuffle.  Set ``broadcast=False`` to fall back
    to a hash equi-join when the benchmark is genuinely large.

    Documents with no spans at all (shorter than k tokens) are absent
    from the output — they carry no n-gram evidence either way.
    """
    bench_grams = (
        _token_span_hashes(benchmark, text_col, id_col, k)
        .select("span_hash").distinct()
        .withColumn("__hit__", F.lit(1))
    )
    if broadcast:
        bench_grams = F.broadcast(bench_grams)
    toks = spread(corpus).select(
        F.col(id_col), token_array(F.col(text_col)).alias("t"))
    starts = F.when(
        F.size("t") >= k,
        F.sequence(F.lit(1), F.size("t") - F.lit(k - 1)),
    ).otherwise(F.array().cast("array<int>"))
    spans = F.array_distinct(
        F.transform(starts,
                    lambda i: F.array_join(F.slice("t", i, k), " ")))
    grams = toks.select(
        F.col(id_col),
        F.explode(spans).alias("span"),
    ).select(F.col(id_col), hash64(F.col("span")).alias("span_hash"))
    marked = grams.join(bench_grams, "span_hash", "left")
    threshold_bp = int(round(threshold * 10000))
    out = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0))).cast("long")
            .alias("n_overlap"),
    )
    return out.select(
        F.col(id_col), F.col("n_grams"), F.col("n_overlap"),
        (F.col("n_overlap") * 10000
         >= F.lit(threshold_bp) * F.col("n_grams")).alias("contaminated"),
    )


# -- Arrow-native shingle/MinHash kernels (r15 opt round, guide §4.2) --
#
# The shingle → md5 → universal-hash pipeline used to run as JVM
# expressions: a HOF transform producing the shingle array (substr per
# position + array_distinct, interpreted CodegenFallback lambdas), an
# explode to the (doc, shingle) grain, one md5+conv per shingle row and
# a 16-min groupBy.  The kernels below compute the same numbers in one
# Arrow stage per document batch — C-speed hashlib.md5, numpy int64
# mixing — with the normalization replicated byte-exactly (fuzz-tested
# in tests/test_minhash_arrow.py) and the md5 input bytes therefore
# identical, so signatures are bit-identical by construction.

#: Java regex ``\s`` is the ASCII class ``[ \t\n\x0B\f\r]`` — Python's
#: ``\s`` is Unicode-aware and must NOT be used in the replica.
_JAVA_WS_PATTERN = "[ \\t\\n\\x0B\\f\\r]+"


def _normalize_text_py(s: Optional[str]) -> Optional[str]:
    """Python replica of ``regexp_replace(lower(trim(x)), '\\s+', ' ')``
    under JVM semantics: ``trim`` strips U+0020 only (SPARK-17299),
    ``\\s`` is ASCII-only, ``lower`` is the locale-independent
    ASCII-fast-path lowercasing (parity fuzz-tested over Unicode)."""
    import re

    if s is None:
        return None
    return re.sub(_JAVA_WS_PATTERN, " ", s.strip(" ").lower())


def _shingle_list_py(s: Optional[str], k: int) -> Optional[list]:
    """Distinct character k-shingles of the normalized text in
    first-occurrence order — exactly ``_shingle_array``'s
    ``array_distinct(transform(sequence(...), substr))`` (``max(len−k+1,
    1)`` positions, so short/empty text yields one short shingle).
    Null text yields ``[None]``: ``greatest(NULL−k+1, 1)`` skips the
    null → one position → one null substr — NOT a null array."""
    norm = _normalize_text_py(s)
    if norm is None:
        return [None]
    n = len(norm)
    if n <= k:
        return [norm[:k]]
    return list(dict.fromkeys(
        norm[i:i + k] for i in range(n - k + 1)))


#: per-task md5-memo insertion cap (entries) for the Arrow kernels
#: below: md5(g) is a pure function of the string, so memoizing it is
#: bit-identical; the cap bounds worker memory on adversarial
#: vocabularies (when full the memo stops ADMITTING, never evicts —
#: under Zipf the hot grams enter first, so hit rates stay high).
#: Measured on the bench corpus: shingles repeat 500x across rows,
#: tokens 8700x — the md5 calls were >99% redundant.
_MD5_MEMO_CAP = 1 << 20


def _shingle_hashes_py(s: Optional[str], k: int,
                       memo: Optional[dict] = None) -> Optional[list]:
    """31-bit md5-derived hashes (``hash64(·, nhex=8) % P``) of the
    distinct shingles: first 4 md5 bytes big-endian — the integer the
    SQL ``conv(substring(md5(x), 1, 8), 16, 10)`` parses — mod the
    Mersenne prime.  ``memo`` (optional, per task) caches the
    shingle→hash map — exact by construction (md5 is pure)."""
    import hashlib

    sh = _shingle_list_py(s, k)
    if sh == [None]:
        # null text: the one null shingle hashes to NULL — no finite
        # hashes, the signature minima stay NULL
        return None
    if memo is None:
        return [int.from_bytes(
            hashlib.md5(g.encode("utf-8")).digest()[:4],
            "big") % MINHASH_P for g in sh]
    out = []
    for g in sh:
        h = memo.get(g)
        if h is None:
            h = int.from_bytes(
                hashlib.md5(g.encode("utf-8")).digest()[:4],
                "big") % MINHASH_P
            if len(memo) < _MD5_MEMO_CAP:
                memo[g] = h
        out.append(h)
    return out


def _band_digests_py(sig, bands: int, rows: int) -> list:
    """Band digests replicating ``md5(concat_ws(',', band_id,
    CAST(slice(sig, …) AS array<string>)))`` — ``concat_ws`` skips a
    NULL array (null-text docs), so those digest just the band id."""
    import hashlib

    out = []
    for bb in range(bands):
        parts = [str(bb)]
        if sig is not None:
            parts += [str(int(x)) for x in sig[bb * rows:(bb + 1) * rows]]
        out.append(hashlib.md5(
            ",".join(parts).encode("utf-8")).hexdigest())
    return out


def _minhash_stage(df: DataFrame, text_col: str, id_col: str,
                   num_hashes: int, shingle_k: int,
                   bands: Optional[int] = None,
                   keep_cols: Sequence[str] = ()) -> DataFrame:
    """One Arrow stage computing per-ROW MinHash signatures (and
    optionally band digests): ``(id, keep…, sig[, __bands__])``.
    Stateless — runs on streaming frames unchanged."""
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)

    a, b = minhash_params(num_hashes)
    rows = (num_hashes // bands) if bands else 0
    keep = list(keep_cols)
    base = df if df.isStreaming else spread(df)
    src = base.select(F.col(id_col), *[F.col(c) for c in keep],
                      F.col(text_col))
    fields = [src.schema[id_col]] + [src.schema[c] for c in keep]
    fields.append(StructField("sig", ArrayType(LongType()), True))
    if bands is not None:
        fields.append(
            StructField("__bands__", ArrayType(StringType()), True))
    out_schema = StructType(fields)

    def fn(batches):
        import numpy as np

        A = np.asarray(a, dtype=np.int64)[:, None]
        B = np.asarray(b, dtype=np.int64)[:, None]
        memo: dict = {}  # shingle → hash, once per task (_MD5_MEMO_CAP)
        for pdf in batches:
            sigs = []
            bnds = []
            for s in pdf[text_col]:
                hs = _shingle_hashes_py(s, shingle_k, memo)
                if hs is None:
                    sig = None
                else:
                    H = np.asarray(hs, dtype=np.int64)[None, :]
                    # a_i·h < 2^62 by construction — exact in int64
                    sig = [int(v) for v in
                           ((A * H + B) % MINHASH_P).min(axis=1)]
                sigs.append(sig)
                if bands is not None:
                    bnds.append(_band_digests_py(sig, bands, rows))
            out = pdf[[id_col] + keep].copy()
            out["sig"] = sigs
            if bands is not None:
                out["__bands__"] = bnds
            yield out

    return src.mapInPandas(fn, out_schema)


def _shingle_arrays_frame(df: DataFrame, text_col: str,
                          keep_cols: Sequence[str], k: int,
                          out_col: str = "__sh__") -> DataFrame:
    """``(keep…, out_col: array<string>)`` in one Arrow stage — the
    Arrow-native counterpart of selecting :func:`_shingle_array`
    (identical shingle strings and first-occurrence order via
    ``_shingle_list_py``; the per-position substr + array_distinct
    HOF lambdas were CodegenFallback and interpreted per element)."""
    from pyspark.sql.types import (ArrayType, StringType, StructField,
                                   StructType)

    keep = list(keep_cols)
    base = df if df.isStreaming else spread(df)
    src = base.select(*[F.col(c) for c in keep], F.col(text_col))
    schema = StructType(
        [src.schema[c] for c in keep]
        + [StructField(out_col, ArrayType(StringType()), True)])

    def fn(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = [_shingle_list_py(s, k)
                            for s in pdf[text_col]]
            yield out

    return src.mapInPandas(fn, schema)


def _shingle_array(text: Column, k: int) -> Column:
    """Distinct character k-shingles of normalized text (array<string>).

    DuckDB: ``list_distinct(list_transform(generate_series(1,
    greatest(len(t)-k+1, 1)), i -> substr(t, i, k)))``.

    The normalization is let-bound (util.let_) so the regex runs ONCE
    per document — referenced directly from the per-position lambda
    it would re-run for every shingle (O(n²) in document length).
    """
    from cubes_spark.llm.util import let_

    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return let_(normalized, lambda t: F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(k)))
    ))


#: Mersenne prime 2^31-1: the universal-hash modulus.  Coefficients are
#: fixed integer formulas (not an RNG) so any SQL oracle reproduces them.
MINHASH_P = 2147483647


def minhash_params(num_hashes: int):
    """Deterministic (a_i, b_i) coefficients for ``h_i(x) = (a_i * x +
    b_i) mod P``.  Bounded so ``a_i * x`` stays < 2^62 — no overflow in
    signed 64-bit on any engine."""
    a = [((i + 1) * 2654435761) % (MINHASH_P - 1) + 1
         for i in range(num_hashes)]
    b = [((i + 1) * 40503 * 65537 + 12345) % MINHASH_P
         for i in range(num_hashes)]
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_hashes: int = 16,
                       shingle_k: int = 5) -> DataFrame:
    """MinHash signature per document via universal hashing:
    ``sig[i] = min over shingles s of (a_i * h(s) + b_i) mod P`` with
    ``h`` the portable 32-bit md5-derived hash.

    Shape (r15): ONE Arrow stage computes each row's shingle hashes
    and signature (C-speed md5, numpy int64 mixing — bit-identical to
    the old explode → JVM md5 → 16-min-groupBy pipeline, see
    ``_minhash_stage``), then a groupBy merges per-id component
    minima.  The merge preserves the original duplicate-id semantics
    (min over the UNION of shingle sets = min of per-row minima) and
    its shuffle carries one 16-long row per input row instead of the
    whole (doc, shingle) grain.

    Returns ``(id, sig)`` with ``sig: array<bigint>``.
    """
    per_row = _minhash_stage(df, text_col, id_col, num_hashes,
                             shingle_k)
    aggs = [
        F.min(F.element_at(F.col("sig"), i + 1)).alias(f"__m{i}__")
        for i in range(num_hashes)
    ]
    sig = per_row.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{i}__") for i in range(num_hashes)]).alias("sig"),
    )


def row_minhash_bands(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_hashes: int = 16,
                      bands: int = 4,
                      shingle_k: int = 5,
                      keep_cols: Optional[Sequence[str]] = None,
                      ) -> DataFrame:
    """Per-ROW MinHash-LSH banding: ``(id, keep_cols…, band_id,
    band_hash)`` with ``bands`` rows per document, computed entirely
    by array expressions — NO groupBy, so it runs STATELESSLY on a
    streaming DataFrame (the building block of
    :func:`~cubes_spark.streaming.stream_near_dup_candidates`).

    The signature components and band hashes are bit-identical to
    :func:`minhash_signatures` + :func:`minhash_candidate_pairs`'s
    banding (same shingle set, one md5 per shingle, same universal-
    hash mixing, same band digest) — since r15 both run through the
    same Arrow kernel (``_minhash_stage``); here the band digests are
    emitted per row straight from the stage (no groupBy, stateless on
    streams) and posexploded."""
    rows = num_hashes // bands
    if rows * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")
    keep = list(keep_cols or [])

    staged = _minhash_stage(df, text_col, id_col, num_hashes,
                            shingle_k, bands=bands, keep_cols=keep)
    return staged.select(
        F.col(id_col), *[F.col(c) for c in keep],
        F.posexplode("__bands__").alias("band_id", "band_hash"),
    )


def minhash_candidate_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_hashes: int = 16,
                            bands: int = 4,
                            shingle_k: int = 5,
                            min_est_jaccard: Optional[float] = None,
                            max_bucket_size: Optional[int] =
                            DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH banding.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    a pair is a candidate iff some band hashes equal.  The join is a
    bucketed self-join on ``(band_id, band_hash)`` — never all-pairs.
    Output: ``(id_a, id_b, est_jaccard)`` with ``id_a < id_b``,
    ``est_jaccard`` = fraction of equal signature components, optionally
    filtered to ``>= min_est_jaccard``.
    """
    rows = num_hashes // bands
    if rows * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")

    # No persist needed: the bucket-groupBy pair generator consumes the
    # signature pipeline exactly once (the self-join form read it from
    # both branches and required a materialization barrier).
    sigs = minhash_signatures(df, text_col, id_col, num_hashes,
                              shingle_k)

    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat_ws(
                ",",
                b.cast("string"),
                F.slice(F.col("sig"), b * rows + 1, rows).cast("array<string>"),
            )
        ),
    )
    banded = sigs.select(
        F.col(id_col), F.col("sig"),
        F.posexplode(band_arr).alias("band_id", "band_hash"),
    )
    pairs = _bucket_pairs(banded, ["band_id", "band_hash"], id_col,
                          "sig", max_bucket_size) \
        .withColumnsRenamed({"payload_a": "sig_a", "payload_b": "sig_b"}) \
        .dropDuplicates(["id_a", "id_b"])
    # r15: the match count unrolled to num_hashes compiled IF terms
    # (one F.expr parse) instead of the interpreted zip_with/aggregate
    # HOF fold; the NULL guard reproduces the fold's null algebra
    # (either sig NULL → est NULL; NULL components compare to 0 both
    # ways).  Same integers, same division — bit-identical.
    matches = " + ".join(
        f"IF(sig_a[{i}] = sig_b[{i}], 1, 0)" for i in range(num_hashes))
    est = (
        F.when(F.col("sig_a").isNull() | F.col("sig_b").isNull(),
               F.lit(None).cast("int"))
        .otherwise(F.expr(matches)).cast("double")
        / F.lit(float(num_hashes))
    )
    result = pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
    if min_est_jaccard is not None:
        result = result.filter(F.col("est_jaccard") >= min_est_jaccard)
    return result


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            nbits: int = 48, out_col: str = "simhash") -> DataFrame:
    """Per-document SimHash over whitespace tokens (with multiplicity).

    Bit ``b`` of the fingerprint is 1 iff the majority of token hashes
    have bit ``b`` set (sum of ±1 votes > 0).  ``nbits <= 60`` since
    token hashes are 60-bit (15 hex digits of md5).

    Shape (r15): one Arrow stage hashes each row's tokens (C-speed
    md5) and sums its ±1 bit votes in numpy — exact int64, same
    numbers the old (doc, token)-grain explode + JVM md5 + 48-sum
    groupBy produced — then a groupBy merges per-id vote sums (vote
    addition is associative, so duplicate-id semantics are unchanged)
    and the fingerprint assembles from the merged votes exactly as
    before.  The shuffle carries one 48-long row per input row
    instead of the token grain.
    """
    from pyspark.sql.types import (ArrayType, LongType, StructField,
                                   StructType)

    base = df if df.isStreaming else spread(df)
    src = base.select(F.col(id_col), F.col(text_col))
    out_schema = StructType([
        src.schema[id_col],
        StructField("__votes__", ArrayType(LongType()), True)])

    def fn(batches):
        import hashlib
        import re

        import numpy as np

        ws = re.compile(_JAVA_WS_PATTERN)
        shifts = np.arange(nbits, dtype=np.int64)
        memo: dict = {}  # token → 60-bit hash, per task (md5 is pure)
        for pdf in batches:
            votes_col = []
            for s in pdf[text_col]:
                # token_array(lower(s)): trim spaces, split on Java \s+
                # (split keeps leading/trailing empty fields — re.split
                # matches Spark's limit=-1 semantics); null/blank text
                # has no tokens → null votes, like the explode_outer
                # null row's skipped-by-sum hashes
                if s is None:
                    votes_col.append(None)
                    continue
                t = s.lower().strip(" ")
                if t == "":
                    votes_col.append(None)
                    continue
                toks = ws.split(t)
                hl = []
                for tok in toks:
                    h = memo.get(tok)
                    if h is None:
                        h = int(hashlib.md5(tok.encode("utf-8"))
                                .hexdigest()[:15], 16)
                        if len(memo) < _MD5_MEMO_CAP:
                            memo[tok] = h
                    hl.append(h)
                H = np.array(hl, dtype=np.int64)
                bits = (H[:, None] >> shifts[None, :]) & 1
                votes = (2 * bits - 1).sum(axis=0)
                votes_col.append([int(v) for v in votes])
            out = pdf[[id_col]].copy()
            out["__votes__"] = votes_col
            yield out

    per_row = src.mapInPandas(fn, out_schema)
    votes = per_row.groupBy(id_col).agg(*[
        F.sum(F.element_at(F.col("__votes__"), b + 1))
        .alias(f"__v{b}__")
        for b in range(nbits)
    ])
    fingerprint = F.lit(0).cast("long")
    for b in range(nbits):
        fingerprint = fingerprint + F.when(
            F.col(f"__v{b}__") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), fingerprint.alias(out_col))


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            nbits: int = 48,
                            max_distance: int = 3,
                            max_bucket_size: Optional[int] =
                            DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """All pairs with SimHash Hamming distance <= ``max_distance`` —
    computed via *exact* multi-band LSH, never all-pairs.

    The fingerprint is split into ``max_distance + 1`` bands; by
    pigeonhole any pair within the distance agrees on >= 1 full band,
    so the banded self-join is a lossless candidate generator and the
    final ``bit_count(xor) <= d`` filter makes the result identical to
    the quadratic answer.  Output ``(id_a, id_b, distance)``.

    The ``max_bucket_size`` skew guard (on by default) trades that
    exactness ONLY for degenerate buckets holding more than that many
    fingerprints — mass-duplicated content that belongs to
    ``exact_duplicates``.
    """
    bands = max_distance + 1
    width = nbits // bands
    # no persist: the bucket-groupBy pair generator consumes the
    # fingerprints once (see minhash_candidate_pairs)
    sh = simhash(df, text_col, id_col, nbits=nbits)

    # last band absorbs the remainder bits when bands don't divide nbits
    band_exprs = []
    for b in range(bands):
        start = b * width
        w = width if b < bands - 1 else nbits - start
        band_exprs.append(
            F.shiftright(F.col("simhash"), start)
            .bitwiseAND(F.lit((1 << w) - 1))
        )
    band_arr = F.array(*band_exprs)

    banded = sh.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(band_arr).alias("band_id", "band_val"),
    )
    pairs = _bucket_pairs(banded, ["band_id", "band_val"], id_col,
                          "simhash", max_bucket_size) \
        .dropDuplicates(["id_a", "id_b"])
    distance = F.bit_count(
        F.col("payload_a").bitwiseXOR(F.col("payload_b")))
    return (
        pairs.select("id_a", "id_b", distance.alias("distance"))
        .filter(F.col("distance") <= max_distance)
    )


def ngram_jaccard_pairs(candidates: DataFrame, docs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 5,
                        min_jaccard: float = 0.0) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs ``(id_a, id_b)``.

    The verify step after LSH candidate generation: joins the candidate
    edge list (small) against per-document shingle sets and computes
    ``|A ∩ B| / |A ∪ B|`` with array intrinsics.  Cost is
    O(candidates), not O(N²).
    """
    # JVM shingle expression kept HERE deliberately (r15, measured):
    # this frame is consumed by BOTH join branches, so an Arrow stage
    # runs twice and ships the big string arrays through Python twice
    # — interleaved A/B showed 1.5x SLOWER (doc_jaccard 1.9→2.8 s)
    sh = spread(docs).select(
        F.col(id_col),
        _shingle_array(F.col(text_col), shingle_k).alias("__sh__"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh__").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh__").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")) \
        .otherwise(F.lit(0.0))
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


def connected_components(pairs: DataFrame,
                         id_a: str = "id_a", id_b: str = "id_b",
                         max_iterations: int = 25) -> DataFrame:
    """Connected components over a near-duplicate pair list:
    ``(node, component)`` with ``component`` = the smallest node id in
    the cluster.  This is the step that turns PAIRS into dedup
    CLUSTERS (pick one canonical document per component).

    Distributed iterative min-label propagation — the standard
    large-scale CC shape (GraphFrames/Pregel style, all DataFrame
    ops): each round every node adopts the minimum label among itself
    and its neighbours; rounds needed = graph diameter (near-dup
    clusters are shallow, typically 2-4).  Each round is one
    equi-join + one map-side-combinable min-groupBy; lineage is
    truncated per round with ``localCheckpoint`` so plans stay O(1)
    instead of growing by two joins per iteration — the difference
    between converging and dying of plan bloat at 100 TB.

    ONE Spark job per round: labels are monotone non-increasing, so
    the sum of labels is a convergence invariant — the same action
    that materializes the round's checkpoint also returns the sum
    (decimal-exact, overflow-free), and an unchanged sum IS
    convergence.  No separate join-old-vs-new change count.
    """
    # directed list checkpointed BEFORE the symmetric union: the
    # union's two branches otherwise re-run the caller's whole
    # pair-producing pipeline (MinHash-LSH candidate generation for
    # the dedup entries) once each (r15 opt round, §2.4)
    edges = pairs.select(F.col(id_a).alias("src"),
                         F.col(id_b).alias("dst")) \
        .localCheckpoint(eager=True)
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    prev_sum = None
    for _ in range(max_iterations):
        neighbour = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component").union(neighbour)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        label_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
            .alias("s")).first().s
        labels = new_labels
        if prev_sum is not None and label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels


def duplicate_clusters(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       id_a: str = "id_a",
                       id_b: str = "id_b") -> DataFrame:
    """(id, component, is_canonical) for every document: paired docs
    get their cluster's min-id as component (the canonical member);
    unpaired docs are their own singleton component.  Downstream dedup
    = ``filter(is_canonical)``."""
    comps = connected_components(pairs, id_a, id_b)
    out = df.select(F.col(id_col)).join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    )
    component = F.coalesce(F.col("component"), F.col(id_col))
    return out.select(
        F.col(id_col),
        component.alias("component"),
        (component == F.col(id_col)).alias("is_canonical"),
    )


def dedup_against(df: DataFrame, reference: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  normalize: bool = True,
                  broadcast: bool = False) -> DataFrame:
    """Incremental ingest dedup: drop rows whose (normalized) content
    already exists in a reference corpus — the append-only shape of a
    continuously-ingesting pipeline (new crawl vs everything already
    ingested).  An anti-join on the 128-bit content hash: only hashes
    move, never text.  With ``broadcast=True`` the reference hash set
    is broadcast (when the already-ingested side is the small one —
    e.g. a single day's backlog); the default hash equi-join handles
    the usual case where the reference corpus is the 100 TB side."""
    ref_hashes = reference.select(
        content_hash(F.col(text_col), normalize).alias("content_hash")
    ).distinct()
    if broadcast:
        ref_hashes = F.broadcast(ref_hashes)
    hashed = spread(df).withColumn(
        "content_hash", content_hash(F.col(text_col), normalize))
    return hashed.join(ref_hashes, "content_hash", "left_anti") \
        .drop("content_hash")


def fuzzy_pairs(df: DataFrame, col: str = "text",
                id_col: str = "doc_id",
                max_distance: int = 1,
                max_bucket_size: Optional[int] = DEFAULT_MAX_BUCKET_SIZE,
                ) -> DataFrame:
    """Edit-distance-bounded candidate pairs via deletion-neighborhood
    blocking (FastSS, Bocek et al. 2007) — fuzzy entity resolution
    over short strings (names, codes, URLs) without an all-pairs
    scan.

    Two strings within Levenshtein distance 1 necessarily share a
    member of each other's {self} ∪ {one-char deletions} neighborhood,
    so blocking on those variants is COMPLETE for ``max_distance=1``
    (the brute-force oracle in the correctness gate confirms no pair
    is missed).  Candidates then verify with the built-in
    ``levenshtein`` — JVM-side, no Python.

    Scale shape: the variant explode is narrow (L+1 variants per row),
    pair generation is the shared single-shuffle
    :func:`_bucket_pairs` (groupBy variant, skew-capped), and each
    verified pair carries its exact distance.  Output:
    ``(id_a, id_b, val_a, val_b, distance)`` with ``id_a < id_b``.

    Only ``max_distance=1`` blocks exactly; deeper neighborhoods grow
    as L^k — for larger distances compose with n-gram or phonetic
    blocking instead.
    """
    if max_distance != 1:
        raise ValueError(
            "fuzzy_pairs blocks exactly for max_distance=1; larger "
            "distances need L^k deletion neighborhoods — use n-gram "
            "blocking (minhash_candidate_pairs) for looser matching")
    s = F.col(col)
    deletions = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.greatest(F.length(s) - i, F.lit(0)))),
    )
    variants = F.array_distinct(F.concat(F.array(s), deletions))
    banded = spread(df).select(
        F.col(id_col), s.alias("__val__"),
        F.explode(variants).alias("__v__"),
    )
    pairs = _bucket_pairs(banded, ["__v__"], id_col, "__val__",
                          max_bucket_size)
    verified = (
        pairs.dropDuplicates(["id_a", "id_b"])
        .withColumn("distance",
                    F.levenshtein(F.col("payload_a"),
                                  F.col("payload_b")).cast("long"))
        .filter(F.col("distance") <= max_distance)
    )
    return verified.select(
        "id_a", "id_b",
        F.col("payload_a").alias("val_a"),
        F.col("payload_b").alias("val_b"),
        "distance")


def jaccard_similarity_join(df: DataFrame, threshold: float = 0.5,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            max_bucket_size: Optional[int] =
                            DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """EXACT token-set Jaccard self-join at a threshold via prefix
    filtering (AllPairs / PPJoin family, Bayardo et al. 2007) — the
    lossless alternative to MinHash when recall must be 1.0.

    Each document's distinct tokens sort by GLOBAL frequency
    (rarest first, ties by token); only the first
    ``|x| − ⌈t·|x|⌉ + 1`` tokens — the prefix — generate candidates,
    because two sets with Jaccard ≥ t must share a prefix token.
    Candidates bucket by prefix token through the shared
    single-shuffle :func:`_bucket_pairs`; verification is integer
    arithmetic (intersection/union SIZES, threshold compared as
    ``100·inter ≥ 100·t·union``) so results are exact and the
    brute-force oracle in the gate doubles as a completeness proof.

    Scale shape: the frequency table is a token-keyed count (map-side
    combinable); prefixes shrink as t grows (t=0.7 prunes ~70% of
    postings); the rarest-first ordering keeps prefix-token buckets
    SMALL by construction — the frequent tokens that would blow up a
    bucket are exactly the ones pushed out of prefixes.  Returns
    ``(id_a, id_b, inter_size, union_size)``.
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    toks = df.select(
        F.col(id_col),
        F.array_distinct(token_array(F.col(text_col))).alias("__set__"),
    ).filter(F.size("__set__") > 0)
    exploded = toks.select(id_col, F.explode("__set__").alias("__t__"))
    freq = exploded.groupBy("__t__").agg(
        F.count(F.lit(1)).alias("__f__"))
    ranked = (
        exploded.join(freq, "__t__")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(
            F.struct(F.col("__f__").alias("f"),
                     F.col("__t__").alias("t")))).alias("__ord__"))
    )
    size = F.size("__ord__")
    prefix_len = size - F.ceil(size * F.lit(float(threshold))) \
        .cast("int") + 1
    with_prefix = ranked.select(
        id_col,
        F.transform("__ord__", lambda x: x["t"]).alias("__sorted__"),
        F.slice(F.transform("__ord__", lambda x: x["t"]),
                F.lit(1), prefix_len).alias("__prefix__"),
    )
    banded = with_prefix.select(
        id_col, F.col("__sorted__").alias("__payload__"),
        F.explode("__prefix__").alias("__pt__"),
    )
    pairs = _bucket_pairs(banded, ["__pt__"], id_col, "__payload__",
                          max_bucket_size).dropDuplicates(
        ["id_a", "id_b"])
    inter = F.size(F.array_intersect("payload_a", "payload_b"))
    sa, sb = F.size("payload_a"), F.size("payload_b")
    uni = sa + sb - inter
    out = pairs.select(
        "id_a", "id_b",
        inter.cast("long").alias("inter_size"),
        uni.cast("long").alias("union_size"),
    )
    t_scaled = int(round(threshold * 10 ** 6))
    return out.filter(
        F.col("inter_size") * 10 ** 6
        >= F.lit(t_scaled) * F.col("union_size"))


def cdc_chunks(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", window: int = 8,
               mask_bits: int = 5,
               salt: str = "cdc") -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync family): split each
    document at positions where the rolling window's hash has its low
    ``mask_bits`` bits zero — boundaries are a pure function of LOCAL
    content, so an insertion early in a document shifts only the one
    chunk it lands in, never every downstream chunk (the property
    fixed-size chunking lacks, and the reason storage dedup and
    long-document near-dup pipelines chunk this way).

    Returns ``(id, chunk_idx, chunk_text, chunk_hash)``; expected
    chunk length is ~``2^mask_bits`` characters.

    Scale shape: one narrow projection — per-row HOF work is one
    codepoint-array pass plus O(len·window) INTEGER multiply-adds
    JVM-side (a Karp–Rabin window polynomial, base 37 — like real
    FastCDC/Gear, arithmetic only), embarrassingly parallel, no
    shuffle.  The earlier md5-per-position boundary hash measured
    ~4 µs/position (string concat + md5 + hex parse per window);
    the polynomial over a once-computed codepoint array is the same
    content-defined boundary property at integer-op cost, and is
    replayed token-for-token by the SQL oracle (``ascii``/``substr``
    arithmetic).  Chunk ids stay md5-derived (one hash per CHUNK —
    ~2^mask_bits× rarer than positions).
    """
    txt = F.col(text_col)
    length = F.length(txt)
    # a boundary sits AFTER position p when the window ENDING at p
    # hashes to low-zero bits; guard short texts (Spark's sequence()
    # runs DESCENDING when end < start).  H(p) = Σ_{i=1..w}
    # (cp[p-w+i]+1)·37^(i-1) fits int64 for any codepoint
    # (1.2e6·37^7 ≈ 1e17); 37^k mod 32 cycles through 8 DISTINCT odd
    # weights, so the 5-bit mask sees every window character.  The
    # codepoint array MUST be a materialized column — as a bare
    # expression each of the window's element_at references would
    # inline (and re-run) the whole split per position.
    cps = F.col("__cps__")

    def _window_hash(p):
        h = F.lit(0).cast("long")
        for i in range(1, window + 1):
            h = h + (F.element_at(cps, p - window + i)
                     + 1).cast("long") * F.lit(37 ** (i - 1))
        return h

    ends = F.filter(
        F.sequence(F.lit(window), length),
        lambda p: _window_hash(p) % (1 << mask_bits) == 0,
    )
    bounds_expr = F.array_distinct(F.concat(
        F.array(F.lit(0)),
        F.when(length >= window, ends)
        .otherwise(F.array().cast("array<int>")),
        F.array(length),
    ))
    # bounds MUST also be a materialized column: referenced from
    # inside the chunk-slicing lambda it would be re-evaluated (the
    # full boundary scan!) for EVERY chunk element — O(len²/chunk)
    # per document instead of O(len·window).  Lambda bodies are
    # interpreted per element with no cross-element subexpression
    # reuse, so anything a lambda touches repeatedly needs to be an
    # attribute, not an expression.
    bounds = F.col("__bounds__")
    idx = F.when(
        F.size(bounds) >= 2,
        F.sequence(F.lit(1), F.size(bounds) - 1),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        idx,
        lambda i: txt.substr(
            F.element_at(bounds, i) + 1,
            F.element_at(bounds, i + 1) - F.element_at(bounds, i),
        ),
    )
    exploded = spread(df).withColumn(
        "__cps__", F.transform(F.split(txt, ""), F.ascii)) \
        .withColumn("__bounds__", bounds_expr).select(
        F.col(id_col),
        F.posexplode(chunks).alias("__i__", "chunk_text"),
    )
    return exploded.select(
        F.col(id_col),
        (F.col("__i__") + 1).cast("int").alias("chunk_idx"),
        "chunk_text",
        hash64(F.concat(F.lit("cdch:"), F.col("chunk_text")))
        .alias("chunk_hash"),
    )


def cdc_dedup_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 8,
                    mask_bits: int = 5) -> DataFrame:
    """Per-document chunk-level duplication profile over CDC chunks:
    ``(id, n_chunks, n_dup_chunks, dup_chunk_bp)`` where a chunk is
    *dup* when its (text-identical) hash occurs in at least one OTHER
    document — the chunk-granular dedup signal for long documents
    that exact/minhash whole-document methods miss (a page that
    copies two paragraphs is invisible to both).

    One groupBy on chunk hash (map-side combinable counts of distinct
    docs) + one broadcast-or-shuffle join back; ratios in integer
    basis points so the oracle matches exactly.
    """
    chunks = cdc_chunks(df, text_col, id_col, window,
                        mask_bits).persist()
    docs_per_hash = chunks.groupBy("chunk_hash").agg(
        F.count_distinct(id_col).alias("__nd__"))
    marked = chunks.join(docs_per_hash, "chunk_hash").select(
        F.col(id_col),
        (F.col("__nd__") > 1).cast("int").alias("__dup__"),
    )
    return (
        marked.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
             F.sum("__dup__").cast("long").alias("n_dup_chunks"))
        .withColumn(
            "dup_chunk_bp",
            F.expr("(10000 * n_dup_chunks) div n_chunks"))
    )


def source_shingle_overlap(df: DataFrame, group_col: str = "source",
                           text_col: str = "text",
                           k: int = 5) -> DataFrame:
    """Pairwise content overlap between corpus slices (sources,
    dumps, snapshots): the Jaccard similarity of each pair's distinct
    character-``k``-shingle sets, in integer basis points — the
    corpus-level contamination/duplication diagnostic ("how much of
    source B is already in source A?") that per-document dedup never
    aggregates.

    Returns ``(source_a, source_b, n_a, n_b, n_common, jaccard_bp)``
    for pairs sharing at least one shingle, ``source_a < source_b``.

    Scale shape: shingles dedupe to the (group, shingle) grain FIRST
    (one shuffle), so the self-join on the shingle key does
    ``#groups-containing-it²`` work per shingle — bounded by the
    number of slices, never by corpus size; sizes attach via two
    equi-joins on the group key.  Union sizes come from
    inclusion-exclusion, all-integer.
    """
    sh = (_shingle_arrays_frame(df, text_col, [group_col], k)
          .select(F.col(group_col).alias("__g__"),
                  F.explode("__sh__").alias("__s__"))
          .distinct().persist())
    sizes = sh.groupBy("__g__").agg(
        F.count(F.lit(1)).cast("long").alias("__n__"))
    inter = (
        sh.join(sh.select(F.col("__g__").alias("__g2__"),
                          F.col("__s__")), "__s__")
        .filter(F.col("__g__") < F.col("__g2__"))
        .groupBy(F.col("__g__").alias("ga"),
                 F.col("__g2__").alias("gb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    out = (
        inter
        .join(sizes.select(F.col("__g__").alias("ga"),
                           F.col("__n__").alias("n_a")), "ga")
        .join(sizes.select(F.col("__g__").alias("gb"),
                           F.col("__n__").alias("n_b")), "gb")
        .withColumn(
            "jaccard_bp",
            F.expr("(10000 * n_common)"
                   " div (n_a + n_b - n_common)"))
    )
    return out.select(
        F.col("ga").alias("source_a"), F.col("gb").alias("source_b"),
        "n_a", "n_b", "n_common", "jaccard_bp")


def minhash_recall(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", num_hashes: int = 16,
                   bands: int = 4, shingle_k: int = 5,
                   jaccard_num: int = 1,
                   jaccard_den: int = 2) -> DataFrame:
    """Measured recall/precision of the MinHash-LSH candidate
    generator against EXACT ground truth — the text-side counterpart
    of the emb_*_recall integer-arithmetic quality bridges: LSH is
    probabilistic, so "is the banding good enough at this shingle
    size" needs a number, not a hope.

    Ground truth is every pair with shingle-set Jaccard ≥ num/den,
    found WITHOUT an all-pairs scan: any pair above a positive
    threshold shares a shingle, so candidates come from a shingle
    inverted-index self-join and the threshold test is the exact
    integer cross-multiplication

        (den + num)·|A∩B|  ≥  num·(|A| + |B|)

    (⟺ |A∩B|/|A∪B| ≥ num/den — no float Jaccard is ever computed).

    Returns one row: ``n_true, n_cand, n_hit, recall_bp,
    precision_bp`` (truncating basis points, NULL when the
    denominator is empty).

    Scale shape: the inverted index is the posting-grain shuffle
    every search entry already pays; the pair grain is bounded by
    co-occurrence (never |N|²).  Skewed stop-shingles bound the pair
    count — cap the input (the entry evaluates a fixed subset) or
    pre-drop top-df shingles for corpus-scale audits.
    """
    sh = (_shingle_arrays_frame(df, text_col, [id_col], shingle_k)
          .select(F.col(id_col).alias("__id__"), F.col("__sh__")))
    sizes = sh.select("__id__", F.size("__sh__").alias("__n__"))
    posting = sh.select("__id__", F.explode("__sh__").alias("__s__"))
    pa = posting.select(F.col("__s__").alias("__sa__"),
                        F.col("__id__").alias("id_a"))
    pb = posting.select(F.col("__s__").alias("__sb__"),
                        F.col("__id__").alias("id_b"))
    common = (pa.join(pb, (F.col("__sa__") == F.col("__sb__"))
                      & (F.col("id_a") < F.col("id_b")))
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).cast("long").alias("__c__")))
    na = sizes.select(F.col("__id__").alias("id_a"),
                      F.col("__n__").alias("__na__"))
    nb = sizes.select(F.col("__id__").alias("id_b"),
                      F.col("__n__").alias("__nb__"))
    truth = (common.join(na, "id_a").join(nb, "id_b")
             .filter((jaccard_den + jaccard_num) * F.col("__c__")
                     >= jaccard_num * (F.col("__na__")
                                       + F.col("__nb__")))
             .select("id_a", "id_b"))
    cand = minhash_candidate_pairs(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        bands=bands, shingle_k=shingle_k).select("id_a", "id_b")
    hit = truth.join(cand, ["id_a", "id_b"])
    agg = (truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
           .crossJoin(cand.agg(F.count(F.lit(1)).cast("long")
                               .alias("n_cand")))
           .crossJoin(hit.agg(F.count(F.lit(1)).cast("long")
                              .alias("n_hit"))))
    return agg.select(
        "n_true", "n_cand", "n_hit",
        F.expr("CAST(CASE WHEN n_true > 0 THEN"
               " (10000 * n_hit) div n_true END AS BIGINT)")
        .alias("recall_bp"),
        F.expr("CAST(CASE WHEN n_cand > 0 THEN"
               " (10000 * n_hit) div n_cand END AS BIGINT)")
        .alias("precision_bp"))


def dedup_keep_best(df: DataFrame, pairs: DataFrame, score_col: str,
                    id_col: str = "doc_id",
                    id_a: str = "id_a", id_b: str = "id_b",
                    ascending: bool = False) -> DataFrame:
    """Quality-aware cluster dedup: cluster the near-duplicate PAIRS
    (:func:`connected_components`) and keep per cluster the member
    with the BEST score — highest ``score_col`` (or lowest with
    ``ascending``), ties by lowest id.  The representative-selection
    policy RefinedWeb/FineWeb-style pipelines use instead of
    :func:`duplicate_clusters`' arbitrary min-id canonical: when a
    page was crawled five times, keep the longest / highest-quality
    capture, not the one with the smallest id.

    Emits every document with its ``component``, ``score_col`` and
    the ``keep`` verdict (downstream dedup = ``filter('keep')``).
    Scale shape: CC is the bounded iterative min-label propagation;
    the selection window runs ONLY over cluster members (the nodes
    that appear in ``pairs``) — unpaired documents are trivially
    their own representative and rejoin via a cheap anti-join, so the
    shuffle+sort is pair-graph-sized, never corpus-sized.  At 100 TB
    with a few-percent duplicate rate that is the difference between
    sorting the whole corpus by a near-unique key and sorting a small
    fraction of it.
    """
    from pyspark.sql.window import Window

    comps = connected_components(pairs, id_a, id_b)
    scored = df.select(F.col(id_col), F.col(score_col))
    clustered = scored.join(
        comps.withColumnRenamed("node", id_col), id_col, "inner")
    # NULLs last in BOTH directions: plain asc() sorts NULLs first
    # in Spark, which would crown a NULL-scored document as the
    # cluster representative on the ascending path.
    order = (F.col(score_col).asc_nulls_last() if ascending
             else F.col(score_col).desc_nulls_last())
    w = Window.partitionBy("component").orderBy(
        order, F.col(id_col).asc())
    clustered = clustered.select(
        F.col(id_col), F.col("component"), F.col(score_col),
        (F.row_number().over(w) == 1).alias("keep"))
    singles = scored.join(
        comps.select(F.col("node").alias(id_col)), id_col, "left_anti"
    ).select(
        F.col(id_col), F.col(id_col).alias("component"),
        F.col(score_col), F.lit(True).alias("keep"))
    return clustered.unionByName(singles)
