"""Text analysis operators: token counting, quality signals,
language ID, document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions (JVM-side).
Every definition here is deliberately reproducible in ANSI-ish SQL so a
DuckDB oracle can verify it; the DuckDB equivalent is noted per
function.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cubes_spark.llm.util import spread

__all__ = [
    "hash64",
    "token_array",
    "c4_line_filter",
    "gopher_quality_filter",
    "dedup_lines_within_doc",
    "pack_shards_by_bytes",
    "GOPHER_STOPWORDS",
    "bpe_token_count",
    "text_stats",
    "language_id",
    "fingerprint",
    "winnow_fingerprints",
    "repetition_stats",
    "redact_pii",
    "trigram_logprob",
    "chunk_documents",
    "deterministic_split",
    "deterministic_sample",
    "stratified_sample",
    "mixture_sample",
    "pmi_collocations",
    "token_diversity",
    "readability_scores",
    "normalize_unicode",
    "pack_sequences",
    "PII_PATTERNS",
    "inverted_index",
    "textrank_keywords",
    "vocab_growth",
    "source_concentration",
    "rrf_fuse",
    "distinctive_terms",
    "heaps_curve",
    "STOPWORDS",
    "zipf_fit",
]

#: Whitespace tokenizer pattern (identical semantics in Spark / DuckDB /
#: RE2 / Java regex).
WS = r"\s+"

#: Punctuation class used for quality ratios — an explicit set so both
#: regex dialects agree (no [[:punct:]] portability trap).
PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}<>/@#$%^&*_+=~`|\\-]"

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic.  Deliberately small and fixed: the oracle SQL inlines them.
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "es"],
}


def hash64(col: Column, nhex: int = 15) -> Column:
    """Portable 4*nhex-bit non-negative hash of a string column.

    First ``nhex`` hex digits of md5, parsed as an integer.  DuckDB
    equivalent::

        CAST(concat('0x', substr(md5(x), 1, nhex)) AS BIGINT)

    md5 is available everywhere and byte-stable, unlike engine-native
    hashes (Spark xxhash64 vs DuckDB hash are incompatible).  15 hex
    digits = 60 bits, always positive in an int64.
    """
    return F.conv(F.substring(F.md5(col), 1, nhex), 16, 10).cast("long")


def token_array(text: Column) -> Column:
    """Whitespace tokens of trimmed text; empty array for blank text.

    DuckDB: ``CASE WHEN trim(x)='' THEN [] ELSE
    string_split_regex(trim(x), '\\s+') END``.
    """
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, WS))


#: BPE-ish pre-tokenization pattern (GPT-2-family shape): contraction
#: suffixes, letter runs, digit runs capped at 3 (cl100k-style), then
#: punctuation runs.  ASCII classes only so Java regex (Spark) and RE2
#: (DuckDB) agree on every match.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Approximate LLM token count: number of BPE-ish pre-token matches.

    Counts matches of :data:`BPE_PATTERN` — the split a byte-pair
    tokenizer's pre-tokenizer makes before merges, so this upper-bounds
    the real token count with the right shape (digit runs split every
    3, punctuation separate from words).  Pure ``regexp_count``, fully
    codegen'd.  DuckDB: ``len(regexp_extract_all(x, pattern))``.
    """
    return F.regexp_count(text, F.lit(BPE_PATTERN))


def _ratio(part: Column, whole: Column) -> Column:
    return F.when(whole > 0, part.cast("double") / whole.cast("double")) \
        .otherwise(F.lit(0.0))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality/statistics columns.

    Adds: ``n_chars_c, n_tokens, n_alpha_tokens, avg_token_len,
    punct_ratio, digit_ratio, space_ratio, stopword_ratio_en,
    quality_score``.  The quality score is a simple bounded heuristic
    (length + stopword signal - punctuation/digit noise), the shape a
    pretraining-data filter uses (cf. C4/Gopher-style rules).
    """
    df = spread(df)
    text = F.col(text_col)
    tokens = token_array(text)
    n_chars = F.length(text)
    n_tokens = F.size(tokens)
    no_space = F.regexp_replace(text, WS, "")
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    n_space = n_chars - F.length(no_space)
    sw = STOPWORDS["en"]
    n_stop = F.aggregate(
        tokens,
        F.lit(0),
        lambda acc, t: acc + F.when(F.lower(t).isin(*sw), 1).otherwise(0),
    )
    avg_token_len = _ratio(F.length(no_space), n_tokens)
    punct_ratio = _ratio(n_punct, n_chars)
    digit_ratio = _ratio(n_digit, n_chars)
    space_ratio = _ratio(n_space, n_chars)
    stop_ratio = _ratio(n_stop, n_tokens)
    quality = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(4.0), F.lit(1.0))) * 0.1
    )
    return df.withColumns({
        "n_chars_c": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(avg_token_len, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "digit_ratio": F.round(digit_ratio, 4),
        "space_ratio": F.round(space_ratio, 4),
        "stopword_ratio_en": F.round(stop_ratio, 4),
        "quality_score": F.round(quality, 4),
    })


def language_id(df: DataFrame, text_col: str = "text",
                languages: Optional[Sequence[str]] = None) -> DataFrame:
    """Stopword-overlap language ID: per-language hit counts over
    whitespace tokens, argmax with alphabetical tie-break, 'und'
    (undetermined) when no stopword hits at all.

    Adds ``lang_pred`` plus ``score_<lang>`` columns.
    """
    df = spread(df)
    languages = sorted(languages or STOPWORDS.keys())
    tokens = token_array(F.col(text_col))
    scores: Dict[str, Column] = {}
    def stopword_merge(sw):
        return lambda acc, t: acc + F.when(F.lower(t).isin(*sw), 1).otherwise(0)

    for lang in languages:
        scores[f"score_{lang}"] = F.aggregate(
            tokens, F.lit(0), stopword_merge(STOPWORDS[lang])
        ).cast("long")
    out = df.withColumns(scores)
    best = F.greatest(*[F.col(f"score_{l}") for l in languages])
    pred = F.lit("und")
    # alphabetical order: the first language reaching the max wins
    for lang in reversed(languages):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)) \
            .otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return out.withColumn("lang_pred", pred)


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        k: int = 8, window: int = 16) -> DataFrame:
    """MOSS-style winnowing fingerprints: ``(id, fingerprint)`` rows.

    The normalized text's ORDERED character k-gram rolling hashes are
    windowed (``window`` consecutive grams) and each window contributes
    its minimum — the winnowing guarantee: any shared substring of at
    least ``window + k - 1`` characters yields at least one shared
    fingerprint, while the selected set is ~``2/(window+1)`` of all
    gram hashes.  The per-document signature is the DISTINCT set of
    selected minima.

    All array intrinsics (transform/slice/array_min/array_distinct) —
    one md5 per gram, plan size O(1) in document length, no Python.
    Hashes are md5-derived (:func:`hash64`), so a SQL oracle
    reproduces the selection bit-for-bit.
    """
    # MATERIALIZE the normalized text before the per-gram lambda:
    # referencing the regexp_replace expression inside `transform`
    # would re-run the regex once per gram position (no
    # common-subexpression elimination inside higher-order-function
    # lambdas) — O(n^2) in document length, the same trap as the gram
    # array below.
    normed = spread(df).select(
        F.col(id_col),
        F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                         WS, " ").alias("__winnow_norm__"),
    )
    normalized = F.col("__winnow_norm__")
    n_grams = F.greatest(F.length(normalized) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: hash64(normalized.substr(i, F.lit(k))),
    )
    # MATERIALIZE the gram array in its own projection: referencing
    # `grams` inside the per-window lambda would inline the whole
    # hash chain into every window evaluation (no common-subexpression
    # elimination across higher-order-function lambdas), turning an
    # O(n) hash pass into O(n·window) re-hashing — measured 10x on
    # 300-char documents, worse the longer the document.
    grammed = normed.select(F.col(id_col),
                            grams.alias("__winnow_grams__"))
    garr = F.col("__winnow_grams__")
    n_windows = F.greatest(F.size(garr) - (window - 1), F.lit(1))
    minima = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(garr, j, window)),
    )
    return grammed.select(
        F.col(id_col),
        F.explode(F.array_distinct(minima)).alias("fingerprint"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: 60-bit portable hash of the
    case-folded, whitespace-collapsed text.  Two documents differing
    only in spacing/case share a fingerprint.

    DuckDB: ``CAST(concat('0x', substr(md5(regexp_replace(lower(trim(x)),
    '\\s+', ' ', 'g')), 1, 15)) AS BIGINT)``.
    """
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS, " ")
    return spread(df).withColumn(out_col, hash64(normalized))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     ngram_sizes: Sequence[int] = (2, 3)) -> DataFrame:
    """Within-document repetition signals (Gopher-style filter rule):
    for each n in ``ngram_sizes``, the fraction of duplicated word
    n-grams — ``1 - distinct/total`` — as ``dup_ngram_frac_<n>``.
    Boilerplate and degenerate repetition score high; clean prose
    scores near 0.  Array intrinsics only.

    DuckDB mirror: ``1 - len(list_distinct(grams))/len(grams)`` with
    grams built by ``list_transform(generate_series(...), i ->
    array_to_string(tokens[i:i+n-1], ' '))``.
    """
    # materialize the token array in its own projection first: an
    # inline `token_array(...)` expression referenced from the
    # per-gram lambda would re-split the text once per window
    # position (no CSE across higher-order-function lambdas) —
    # the same O(n·window) trap winnow_fingerprints had
    df = spread(df).withColumn("__rep_toks__",
                               token_array(F.col(text_col)))
    tokens = F.col("__rep_toks__")
    cols: Dict[str, Column] = {}

    def gram_builder(n):
        # single-parameter lambda: a 2-arg lambda would make
        # F.transform pass the array INDEX as the second argument
        return lambda i: F.concat_ws(" ", F.slice(tokens, i, n))

    for n in ngram_sizes:
        n_grams = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            gram_builder(n),
        )
        frac = F.when(
            n_grams > 0,
            F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double")
            / n_grams.cast("double"),
        ).otherwise(F.lit(0.0))
        cols[f"dup_ngram_frac_{n}"] = F.round(frac, 4)
    return df.withColumns(cols).drop("__rep_toks__")


#: PII patterns — deliberately dialect-portable (no lookaround, ASCII
#: classes only) so Java regex (Spark) and RE2 (DuckDB) match
#: identically.
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Scrub common PII shapes from a text column: per-kind match
    counts (``n_email``/``n_ipv4``/``n_phone``) plus the redacted text
    with ``[KIND]`` placeholders — the pre-training scrub step, pure
    ``regexp_count``/``regexp_replace`` (codegen'd, no Python).

    Order matters (emails contain dots that could half-match the ipv4
    pattern): counts are measured on the ORIGINAL text, replacements
    apply email → ipv4 → phone.
    """
    df = spread(df)
    text = F.col(text_col)
    counts = {
        f"n_{kind}": F.regexp_count(text, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }
    redacted = text
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"[{kind.upper()}]")
    return df.withColumns({**counts, out_col: redacted})


def trigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    top_k: int = 50000,
                    floor_count: float = 0.5,
                    quantized: bool = False) -> DataFrame:
    """Self-supervised fluency score: mean log2 probability of each
    document's character trigrams under the CORPUS's own trigram
    distribution — the KenLM-perplexity-proxy shape of a pretraining
    quality filter, with the corpus itself as the model (gibberish and
    non-linguistic content score far below fluent text).

    Two passes, both scalable: (1) explode trigrams → count → keep the
    ``top_k`` most frequent (ties broken by trigram for determinism) —
    the model is BOUNDED regardless of corpus size, and small enough
    to broadcast; (2) re-explode and broadcast-join each document's
    trigrams against the model, unseen trigrams get a ``floor_count``
    pseudo-count.  Adds ``trigram_logprob`` (mean log2 prob) and
    ``n_trigrams``.

    Deterministic (no sampling, total tie-break) → exact SQL oracle.
    """
    # normalization materialized once per row — referenced from the
    # per-position lambda it would re-run per trigram (O(n²))
    df = spread(df).withColumn(
        "__tri_norm__",
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS, " "))
    normalized = F.col("__tri_norm__")
    n_tri = F.greatest(F.length(normalized) - 2, F.lit(0))

    def tri_at(i: Column) -> Column:
        return normalized.substr(i, F.lit(3))

    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_tri, F.lit(1))), tri_at
    )
    exploded = df.select(
        F.col(id_col),
        F.explode(F.when(n_tri > 0, grams)
                  .otherwise(F.array().cast("array<string>")))
        .alias("__tri__"),
    )
    counts = (
        exploded.groupBy("__tri__")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    w_total = counts.agg(
        F.sum("__n__").alias("__total__")).collect()[0]["__total__"]
    model = (
        counts.orderBy(F.col("__n__").desc(), F.col("__tri__"))
        .limit(top_k)
    )
    scored = exploded.join(F.broadcast(model), "__tri__", "left")
    logp = F.log2(
        F.coalesce(F.col("__n__").cast("double"), F.lit(floor_count))
        / F.lit(float(w_total))
    )
    if quantized:
        # integer 1e-4 units per trigram BEFORE summation: int64 sums
        # are exact and merge-order independent, so the result is
        # bit-identical at any parallelism (and SQL-verifiable) —
        # unlike a float mean, whose partial-sum order varies
        logq = F.round(logp * 10000).cast("long")
        return (
            scored.groupBy(id_col)
            .agg(
                F.sum(logq).alias("sum_logq"),
                F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            )
        )
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(F.avg(logp), 4).alias("trigram_logprob"),
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        )
    )


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_chars: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Fixed-size overlapping character chunks — the standard
    context-window shaping step of a pretraining pipeline.

    Chunk ``k`` covers characters ``[k·step, k·step + max_chars)`` with
    ``step = max_chars − overlap``; every document yields at least one
    chunk (empty documents produce one empty chunk, preserving row
    lineage).  A pure narrow explode — no shuffle, no Python — so at
    100 TB it scales with input partitions and the output is written
    straight back out.  Returns ``(id, chunk_id, chunk_text)``.
    """
    if overlap >= max_chars:
        raise ValueError("overlap must be smaller than max_chars")
    step = max_chars - overlap
    text = F.col(text_col)
    numer = F.greatest(F.length(text) - F.lit(overlap), F.lit(0)) \
        + F.lit(step - 1)
    n_chunks = F.greatest(F.lit(1),
                          (numer / F.lit(step)).cast("long"))
    chunked = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
        .alias("chunk_id"),
        text.alias("__text__"),
    )
    return chunked.select(
        F.col(id_col), F.col("chunk_id"),
        F.substring(F.col("__text__"),
                    (F.col("chunk_id") * step + 1).cast("int"),
                    max_chars).alias("chunk_text"),
    )


def deterministic_split(df, id_col: str = "doc_id",
                        val_permille: int = 100,
                        seed: str = "split") -> DataFrame:
    """Deterministic, engine-portable train/validation assignment:
    ``val`` iff ``hash64(seed ‖ id) mod 1000 < val_permille``.

    Hash-based splitting is the only assignment that survives at scale
    — it is reproducible across runs, engines and partitionings (the
    md5-derived hash is bit-identical in Spark and any SQL oracle),
    needs no state, and new data lands in the same split forever.
    Adds a ``split`` column."""
    h = hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")),
        nhex=8,
    ) % 1000
    return df.withColumn(
        "split", F.when(h < val_permille, "val").otherwise("train"))


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   tokens_col: Optional[str] = None,
                   window: int = 2048,
                   num_partitions: Optional[int] = None) -> DataFrame:
    """GPT-style sequence packing (concatenate-and-chunk).

    Documents are laid end-to-end in deterministic `id_col` order and
    the token stream is sliced into fixed context windows of `window`
    tokens; a document may span window boundaries.  Returns one row per
    (window, document) overlap: ``(bin_id, id, offset_in_bin,
    tokens_in_bin, n_tokens)`` — the exact shard map a training loader
    needs.  Token counts come from `tokens_col` if given, else the
    whitespace token count of `text_col`.

    Scale: the naive global cumulative sum is a one-partition window
    function — the classic scale killer.  This uses the two-phase
    prefix sum instead: ids bucketed into contiguous VALUE ranges
    (never ``repartitionByRange`` + ``spark_partition_id`` — a range
    partitioner re-SAMPLES its boundaries per job, so the totals pass
    and the placement pass could disagree on assignment; value-derived
    buckets are deterministic by construction), per-bucket token
    totals (ONE bounded collect: one row per bucket), exclusive
    offsets broadcast back, then a bucket-LOCAL window cumsum.  Every
    stage is as wide as the cluster; the result is invariant to the
    bucket count and partitioning (tested).  All arithmetic is integer
    (exact at any scale); the bin explode is narrow.
    """
    from pyspark.sql.window import Window

    n_tok = (F.col(tokens_col) if tokens_col
             else F.size(token_array(F.col(text_col)))).cast("long")
    base = df.select(F.col(id_col), n_tok.alias("n_tokens"))
    nparts = num_partitions or 256
    bounds = base.agg(F.min(id_col).alias("lo"),
                      F.max(id_col).alias("hi")).first()
    lo = bounds["lo"] if bounds["lo"] is not None else 0
    hi = bounds["hi"] if bounds["hi"] is not None else 0
    bucket_width = max(1, -(-(hi - lo + 1) // nparts))
    base = base.withColumn(
        "_pid",
        F.floor((F.col(id_col) - F.lit(lo)) / F.lit(bucket_width))
        .cast("int"))
    # bounded collect: one row per bucket (thousands at 100 TB)
    totals = base.groupBy("_pid").agg(
        F.sum("n_tokens").alias("_tot")).collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r._pid):
        offsets.append((row._pid, acc))
        acc += row._tot or 0
    spark = df.sparkSession
    off_df = F.broadcast(spark.createDataFrame(
        offsets or [(0, 0)], "_pid int, _poff long"))
    local = Window.partitionBy("_pid").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    placed = (
        base.join(off_df, "_pid")
        .withColumn("_start", F.col("_poff")
                    + F.coalesce(F.sum("n_tokens").over(local),
                                 F.lit(0).cast("long")))
        .withColumn("_end", F.col("_start") + F.col("n_tokens"))
    )
    win = F.lit(window).cast("long")
    bins = F.sequence(F.floor(F.col("_start") / win),
                      F.floor((F.col("_end") - 1) / win))
    exploded = placed.filter(F.col("n_tokens") > 0).select(
        F.col(id_col), F.col("n_tokens"),
        F.col("_start"), F.col("_end"),
        F.explode(bins).alias("bin_id"),
    )
    bin_lo = F.col("bin_id") * win
    bin_hi = bin_lo + win
    return exploded.select(
        F.col("bin_id").cast("long").alias("bin_id"),
        F.col(id_col),
        (F.greatest(F.col("_start"), bin_lo) - bin_lo)
            .alias("offset_in_bin"),
        (F.least(F.col("_end"), bin_hi)
         - F.greatest(F.col("_start"), bin_lo)).alias("tokens_in_bin"),
        F.col("n_tokens"),
    )


def deterministic_sample(df: DataFrame, id_col: str = "doc_id",
                         keep_permille: int = 100,
                         seed: str = "sample") -> DataFrame:
    """Deterministic hash-Bernoulli sampling: keep iff
    ``hash64(seed ‖ id) mod 1000 < keep_permille``.

    The sampling analog of :func:`deterministic_split` — reproducible
    across runs, engines and partitionings (no RNG state), stable
    under data growth (a row's fate never changes), and a pure narrow
    filter at any scale."""
    h = hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")),
        nhex=8,
    ) % 1000
    return df.filter(h < keep_permille)


def stratified_sample(df: DataFrame, strata_col: str,
                      n_per_stratum: int, id_col: str = "doc_id",
                      seed: str = "strata") -> DataFrame:
    """Deterministic stratified sampling: the `n_per_stratum` rows of
    each stratum with the smallest portable hash (ties by id).

    One shuffle keyed by the stratum; within a stratum the selection
    is a rank window.  With few huge strata the window concentrates —
    for that shape pre-filter with :func:`deterministic_sample` to cut
    each stratum to ~n before ranking (two narrow passes instead of
    one skewed shuffle)."""
    from pyspark.sql.window import Window

    h = hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")),
        nhex=8,
    )
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rank__", F.row_number().over(w))
        .filter(F.col("__rank__") <= n_per_stratum)
        .drop("__rank__")
    )


def mixture_sample(df: DataFrame, strata_col: str,
                   rates_permille: Dict[str, int],
                   default_permille: int = 0,
                   id_col: str = "doc_id",
                   seed: str = "mixture") -> DataFrame:
    """Deterministic data-mixture sampling: per-stratum keep rates
    (the up/down-weighting step that turns raw source proportions into
    a training mixture).  Keep iff ``hash64(seed ‖ id) mod 1000 <
    rate(stratum)``; strata without a configured rate use
    `default_permille`.

    Same guarantees as :func:`deterministic_sample` — engine-portable,
    partition-invariant, stable under data growth — and the rate map
    is a small in-plan CASE chain, so the whole thing is one narrow
    filter (no join, no shuffle)."""
    h = hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")),
        nhex=8,
    ) % 1000
    rate = F.lit(default_permille)
    for value, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(permille)) \
            .otherwise(rate)
    return df.filter(h < rate)


def normalize_unicode(df: DataFrame, text_col: str = "text",
                      out_col: str = "normalized",
                      form: str = "NFC") -> DataFrame:
    """Unicode normalization of a text column (NFC/NFKC/NFD/NFKD) —
    the canonical-form step of real-world ingest: the same visible
    string arrives precomposed from one source and decomposed from
    another, and every hash/dedup/tokenize operator downstream would
    treat them as different documents.

    The JVM exposes no normalizer to SQL, so this is an Arrow-
    vectorized scalar stage (one of the documented Python escape
    hatches); everything around it stays codegen'd."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf(StringType())
    def _norm(s):
        return s.map(lambda v: None if v is None
                     else unicodedata.normalize(form, v))

    return df.withColumn(out_col, _norm(F.col(text_col)))


# -- corpus-level curation ---------------------------------------------------


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               line_tokens: int = 20) -> DataFrame:
    """C4-style corpus-global line deduplication: segment every
    document into fixed ``line_tokens``-token lines, keep each
    distinct line's FIRST occurrence (corpus order: document id, then
    line position), drop every later repetition, and reassemble the
    surviving lines into cleaned text.

    This is the curation step that removes boilerplate (headers,
    navigation, license blocks) repeated across millions of pages
    while keeping one copy — document-level dedup cannot touch it
    because the surrounding documents differ.  C4 used newline lines;
    token windows are the tokenizer-robust equivalent for text
    without layout.

    Shuffle shape: the narrow line explode is followed by exactly two
    exchanges — one keyed by line hash (the first-occurrence window),
    one keyed by document (reassembly) — both map-side combinable,
    both on bounded rows (a line row is ~line_tokens tokens, never the
    whole document).  The first-occurrence rule is a window ``min``
    over an integral order key, deterministic at any parallelism.
    Returns ``(id, cleaned_text, n_lines, n_lines_kept)``.
    """
    from pyspark.sql.window import Window

    if line_tokens < 1:
        raise ValueError("line_tokens must be >= 1")
    toks = token_array(F.col(text_col))
    n_lines = F.greatest(
        F.lit(1),
        ((F.size(toks) + F.lit(line_tokens - 1))
         / F.lit(line_tokens)).cast("long"))
    lines = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n_lines - 1))
        .alias("line_idx"),
        toks.alias("__toks__"),
    ).select(
        F.col(id_col), F.col("line_idx"),
        F.array_join(
            F.slice(F.col("__toks__"),
                    (F.col("line_idx") * line_tokens + 1).cast("int"),
                    line_tokens),
            " ").alias("line_text"),
    )
    # first occurrence by (doc, position) without packing both into
    # one integer (a doc_id*K + line_idx key collides across documents
    # once a document exceeds K lines, and raising K overflows long
    # for large ids): two mins over the SAME partition — first the
    # earliest document, then the earliest position within it — one
    # shuffle, portable to any SQL oracle
    w = Window.partitionBy(F.col("line_text"))
    kept = (
        lines
        .withColumn("__min_doc__", F.min(id_col).over(w))
        .withColumn(
            "__min_idx__",
            F.min(F.when(F.col(id_col) == F.col("__min_doc__"),
                         F.col("line_idx"))).over(w))
        .withColumn(
            "__keep__",
            (F.col(id_col) == F.col("__min_doc__"))
            & (F.col("line_idx") == F.col("__min_idx__")))
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("__keep__").cast("long")).alias("n_lines_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("__keep__"),
                        F.struct(F.col("line_idx").alias("i"),
                                 F.col("line_text").alias("t"))))),
                    lambda x: x["t"]),
                " ").alias("cleaned_text"),
        )
    )


def shuffle_shards(df: DataFrame, num_shards: int = 32,
                   id_col: str = "doc_id",
                   seed: str = "shuffle") -> DataFrame:
    """Deterministic global training-data shuffle + shard assignment:
    ``shard = hash64(seed ‖ id) mod num_shards``, ``position`` = rank
    of the hash within the shard.

    The finalization step of a data pipeline — training wants
    documents in pseudo-random order, decorrelated from crawl/source
    order, yet bit-reproducible run-to-run (hash order, no RNG state)
    so a restarted job reads the identical byte stream.  One shuffle
    keyed by shard; within-shard ranking reuses that partitioning.
    Downstream: ``.write.partitionBy('shard')`` with a sort on
    ``position`` streams shards out without further exchanges.
    Returns the input columns plus ``(shard, position)``.
    """
    from pyspark.sql.window import Window

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    h = hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    with_shard = df.withColumn("__h__", h) \
        .withColumn("shard", (F.col("__h__") % num_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy(
        F.col("__h__").asc(), F.col(id_col).asc())
    return (
        with_shard.withColumn(
            "position", F.row_number().over(w).cast("long"))
        .drop("__h__")
    )


def cap_per_domain(df: DataFrame, domain_col: str = "source",
                   max_per_domain: int = 100,
                   quality_col: str = "n_chars",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-domain document cap: keep at most ``max_per_domain``
    documents per domain, preferring the highest ``quality_col``
    (deterministic ties by id).

    The anti-concentration step of web curation: a handful of hosts
    (link farms, mirrors, mass-generated boilerplate) can dominate a
    crawl; capping per registered domain is the standard counter
    (C4/Gopher-style corpus composition).  One shuffle keyed by
    domain; selection is a rank window inside it.  Heavy-tailed
    domain sizes are exactly what AQE skew handling is for — and the
    rank window only needs the top ``max_per_domain`` rows per
    partition to survive, so a pre-filter with
    :func:`stratified_sample`'s hash trick applies when one domain is
    pathological."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc())
    return (
        df.withColumn("__rank__", F.row_number().over(w))
        .filter(F.col("__rank__") <= max_per_domain)
        .drop("__rank__")
    )


def tfidf_keywords(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   top_k: int = 5) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: the ``top_k`` terms
    with the highest ``tf × ln((N + 1) / (df + 1))`` (smoothed IDF,
    never negative or divide-by-zero), deterministic ties by term.

    The classic corpus-statistics pass of document analytics and of
    quality/topicality features for training-data curation.  Shuffle
    shape: one exchange keyed by term builds document frequencies
    (map-side combinable count-distinct by (term, doc) pre-group),
    one broadcast of the scalar corpus size, one exchange back to
    (doc, term) scoring + a rank window keyed by the document.  No
    driver-side loops: N is the only collected scalar.

    Returns ``(id, term, tf, score, rank)`` with ``rank`` 1..top_k.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.explode(token_array(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("__df__"))
    n_docs = df.count()
    scored = (
        tf.join(docfreq, "term")
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.log((F.lit(float(n_docs + 1)))
                    / (F.col("__df__") + F.lit(1)).cast("double")))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "tf",
                F.round("score", 6).alias("score"), "rank")
    )


def bm25_search(df: DataFrame, query_terms: Sequence[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75,
                top_k: int = 10) -> DataFrame:
    """BM25 keyword retrieval (Robertson/Spärck Jones): rank documents
    for a bag of query terms with the classic
    ``idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` score and
    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``.

    Scale shape: the explode is filtered to the query terms BEFORE the
    (doc, term) group — only matching postings ever shuffle, the rest
    of the corpus contributes via two collected scalars (N, avgdl).
    Per-term contributions are quantized to integer 1e-9 units before
    the per-document sum, so the score is an int64 SUM — exact and
    merge-order independent at any parallelism, replayable by a SQL
    oracle verbatim.

    Returns ``(id, score_q, n_hit_terms, rank)`` for the ``top_k``
    documents (score desc, id asc — total order).
    """
    from pyspark.sql.window import Window

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks_arr = token_array(F.col(text_col))
    lengths = df.select(F.col(id_col),
                        F.size(toks_arr).alias("__dl__"))
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__dl__").alias("total")).head()
    n_docs, total_tokens = int(stats["n"]), int(stats["total"] or 0)
    # all-empty corpus: avgdl 0 would put 0/0 NaN into every length
    # normalization (no postings exist then, but keep the expression
    # total); 1.0 is the conventional degenerate value
    avgdl = (total_tokens / n_docs) if n_docs and total_tokens else 1.0

    postings = (
        df.select(F.col(id_col),
                  F.explode(toks_arr).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("__df__"))
    import math

    idf_map = {
        r["term"]: math.log(
            (n_docs - r["__df__"] + 0.5) / (r["__df__"] + 0.5) + 1.0)
        for r in docfreq.collect()
    }
    idf_expr = F.create_map(*[
        x for t in terms if t in idf_map
        for x in (F.lit(t), F.lit(float(idf_map[t])))])
    contrib = (
        idf_expr[F.col("term")]
        * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (F.col("tf").cast("double")
           + F.lit(k1) * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("__dl__").cast("double")
                          / F.lit(float(avgdl))))
    )
    scored = (
        postings.join(lengths, id_col)
        .withColumn("__c_q__",
                    F.round(contrib * 1e9).cast("long"))
        .groupBy(id_col).agg(
            F.sum("__c_q__").alias("score_q"),
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"))
    )
    # TakeOrdered top-k first (distributed, no global sort); the rank
    # window then runs over top_k rows only — never a one-partition
    # window across the matching corpus
    top = scored.orderBy(F.col("score_q").desc(),
                         F.col(id_col).asc()).limit(top_k)
    w = Window.orderBy(F.col("score_q").desc(), F.col(id_col).asc())
    return top.withColumn("rank",
                          F.row_number().over(w).cast("long"))


def feature_hash_embed(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       dim: int = 64,
                       out_col: str = "embedding",
                       seed: str = "feat") -> DataFrame:
    """Feature-hashing document embeddings (the hashing trick,
    Weinberger et al. 2009): each token adds ±1 to component
    ``hash(token) mod dim``, sign from a second hash bit, then the
    vector is L2-normalized.  Closes the text→vector loop inside the
    engine: the output column feeds :mod:`cubes_spark.llm.similarity`
    (cosine top-k, LSH/IVF ANN, k-means, SemDeDup) with no external
    embedding model.

    Deterministic and engine-portable (md5-derived hashes).  Since
    the r15 opt round the fold runs as ONE Arrow stage (§4.2): the
    old JVM ``transform``/``aggregate`` shape rebuilt the dim-array
    accumulator per token (O(tokens·dim) interpreted CodegenFallback
    steps per row) plus two md5+conv per token; the kernel below does
    the same arithmetic with C md5 and a numpy scatter-add.
    Bit-identical by construction: the ±1 accumulator sums and the
    Σx² norm argument are exact small INTEGERS in double (far below
    2^53), so they are summation-order independent; the final
    ``x / sqrt(...)`` divides happen in the same IEEE doubles.  The
    token set, hash bytes and ``% dim`` / sign-bit derivations are
    the exact SQL formulas (parity-tested in
    tests/test_minhash_arrow.py).  Empty documents yield the zero
    vector, null text a NULL vector (the fold's null algebra).
    Returns the input plus ``out_col: array<double>``.
    """
    import math
    import re

    from pyspark.sql.types import (ArrayType, DoubleType, StructField,
                                   StructType)

    from cubes_spark.llm.dedup import _JAVA_WS_PATTERN
    from cubes_spark.llm.util import spread

    if dim < 1:
        raise ValueError("dim must be >= 1")

    base = df if df.isStreaming else spread(df)
    out_schema = StructType(
        list(base.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()), True)])
    comp_seed = (seed + ":").encode("utf-8")
    sign_seed = (seed + "#:").encode("utf-8")

    def fn(batches):
        import hashlib

        from cubes_spark.llm.dedup import _MD5_MEMO_CAP

        ws = re.compile(_JAVA_WS_PATTERN)
        # token → (component, ±1.0) memo, once per task: both md5
        # derivations are pure functions of the token bytes, so the
        # memo is bit-identical; admission-capped like the dedup
        # kernels' memos
        memo: dict = {}
        for pdf in batches:
            vecs = []
            for s in pdf[text_col]:
                if s is None:
                    vecs.append(None)
                    continue
                t = s.strip(" ")
                raw = [0.0] * dim
                if t != "":
                    for tok in ws.split(t):
                        cd = memo.get(tok)
                        if cd is None:
                            tb = tok.encode("utf-8")
                            c = (int.from_bytes(
                                hashlib.md5(comp_seed + tb)
                                .digest()[:8], "big") >> 4) % dim
                            sbit = int.from_bytes(
                                hashlib.md5(sign_seed + tb)
                                .digest()[:4], "big") % 2
                            cd = (c, 1.0 if sbit == 0 else -1.0)
                            if len(memo) < _MD5_MEMO_CAP:
                                memo[tok] = cd
                        raw[cd[0]] += cd[1]
                norm = math.sqrt(math.fsum(v * v for v in raw))
                vecs.append([v / norm for v in raw] if norm > 0
                            else raw)
            out = pdf.copy()
            out[out_col] = vecs
            yield out

    return base.mapInPandas(fn, out_schema)


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     min_count: int = 5) -> DataFrame:
    """Adjacent-bigram collocation mining scored by the PMI
    association ratio ("new york", "machine learning" — the
    multi-word-expression detector of corpus curation; Church &
    Hanks 1990).

    For adjacent token pair (a, b): ``lift_ppm = floor(10^6 ·
    c_ab·N / (c_a·c_b))`` with N the corpus unigram count — the
    exponential of PMI in integer parts-per-million, so the score is
    exact, partition-invariant and SQL-replayable (no logs of
    doubles).  Pairs seen < ``min_count`` times are dropped (the
    classic sparse-PMI noise guard).

    Returns ``(word_a, word_b, n_pair, n_a, n_b, lift_ppm)``.

    Scale shape: tokenization is a JVM column expression
    (:func:`token_array`); bigram explode is narrow; ONE groupBy per
    count table; unigram counts attach via two equi-joins on the word
    key (skew on stopword pairs is bounded by the pair-count grain —
    each pair row exists once).  The only driver value is the scalar
    N.  Products run in decimal(38,0); good past 10^13 tokens.
    """
    toks = df.select(token_array(F.col(text_col)).alias("__t__"))
    toks = toks.persist()
    uni = (toks.select(F.explode("__t__").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("__c__")))
    uni = uni.persist()
    n_total = uni.agg(F.sum("__c__")).first()[0] or 0
    pairs = (
        toks.filter(F.size("__t__") >= 2)
        .select(F.explode(F.expr(
            "zip_with(slice(__t__, 1, size(__t__) - 1),"
            "         slice(__t__, 2, size(__t__) - 1),"
            "         (a, b) -> struct(a, b))")).alias("__p__"))
        .select(F.col("__p__.a").alias("word_a"),
                F.col("__p__.b").alias("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    out = (
        pairs
        .join(uni.select(F.col("w").alias("word_a"),
                         F.col("__c__").cast("long").alias("n_a")),
              "word_a")
        .join(uni.select(F.col("w").alias("word_b"),
                         F.col("__c__").cast("long").alias("n_b")),
              "word_b")
        .withColumn(
            "lift_ppm",
            F.expr(f"CAST((CAST(1000000 AS DECIMAL(38,0)) * n_pair"
                   f" * CAST({int(n_total)} AS DECIMAL(38,0)))"
                   f" div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
                   f" AS BIGINT)"))
    )
    return out.select("word_a", "word_b", "n_pair", "n_a", "n_b",
                      "lift_ppm")


def token_diversity(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document lexical diversity as the Gini–Simpson index in
    exact parts-per-million: ``1 − Σ(c_i/n)² = (n² − Σc_i²)/n²`` over
    the document's token counts — the repetition/templating signal
    (low diversity = boilerplate, keyword stuffing, generated spam)
    that stays fully rational: no logs, no doubles, bit-identical at
    any parallelism.

    Returns ``(doc_id, n_tokens, n_distinct, diversity_ppm)``; empty
    documents produce no row (a 0-token diversity is undefined).

    Scale shape: explode is narrow; two keyed aggregations, both at
    the (doc, token) / doc grain.  Sums run in decimal(38,0) — safe
    past 10^9-token documents.
    """
    toks = df.select(F.col(id_col),
                     F.explode(token_array(F.col(text_col)))
                     .alias("__w__"))
    per = toks.groupBy(id_col, "__w__").agg(
        F.count(F.lit(1)).alias("__c__"))
    dec = "decimal(38,0)"
    agg = per.groupBy(id_col).agg(
        F.sum("__c__").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("__c__").cast(dec) * F.col("__c__").cast(dec))
        .alias("__s2__"),
    )
    return agg.select(
        F.col(id_col), F.col("n_tokens"), F.col("n_distinct"),
        F.expr(f"CAST((CAST(1000000 AS {dec})"
               f" * (CAST(n_tokens AS {dec}) * n_tokens - __s2__))"
               f" div (CAST(n_tokens AS {dec}) * n_tokens)"
               f" AS BIGINT)").alias("diversity_ppm"),
    )


def readability_scores(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document readability in integer milli-points — the
    Flesch-reading-ease shape (206.835 − 1.015·words/sentences −
    84.6·syllables/words) with floor-division semantics so the score
    is exact, engine-portable and SQL-replayable:

    ``score_milli = 206835 − (1015·n_words) div n_sentences
    − (84600·n_syllables) div n_words``

    Sentences are terminal-punctuation runs (``[.!?]+``, min 1);
    syllables per word are vowel-group counts (``[aeiouyAEIOUY]+``,
    min 1 per word) — the standard dictionary-free approximation.
    Returns ``(doc_id, n_words, n_sentences, n_syllables,
    score_milli)``; empty documents produce no row.

    Scale shape: pure JVM column expressions (regexp counts), no
    explode, no shuffle beyond the source scan.
    """
    text = F.col(text_col)
    tokens = token_array(text)
    n_words = F.size(tokens)
    n_sentences = F.greatest(
        F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1))
    syl = F.aggregate(
        tokens, F.lit(0),
        lambda acc, w: acc + F.greatest(
            F.regexp_count(w, F.lit("[aeiouyAEIOUY]+")), F.lit(1)))
    out = (df.select(F.col(id_col),
                     n_words.cast("long").alias("n_words"),
                     n_sentences.cast("long").alias("n_sentences"),
                     syl.cast("long").alias("n_syllables"))
           .filter(F.col("n_words") > 0))
    return out.withColumn(
        "score_milli",
        F.expr("206835 - (1015 * n_words) div n_sentences"
               " - (84600 * n_syllables) div n_words").cast("long"))


def rake_keyphrases(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", max_len: int = 4,
                    min_count: int = 2) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) in exact integer
    ppm: candidate phrases are maximal runs of content tokens
    (lowercased whitespace tokens that are not in the ``en``
    stopword list and contain no non-alphanumeric character — the
    deterministic stand-in for RAKE's punctuation/stopword
    delimiters), capped at ``max_len`` words; each word is scored
    ``degree/frequency`` over all kept phrases (degree = sum of the
    lengths of the phrases it appears in) as ``10^6·deg div freq``,
    and a phrase scores the sum of its word scores — no double
    ratios anywhere, so a SQL oracle replays bit-for-bit.

    Returns ``(phrase, n_words, n_occurrences, score_ppm)`` for
    phrases occurring at least ``min_count`` times corpus-wide.

    Scale shape: phrase assembly is the gaps-and-islands pattern
    over a per-document window (position − row_number — never a
    cross-document window); word stats and phrase scores are two
    token-grain aggregations plus a broadcastable join of the small
    word-score table back to phrase occurrences.
    """
    from pyspark.sql.window import Window as W

    stop = [s for s in STOPWORDS["en"]]
    toks = token_array(F.lower(F.col(text_col)))
    pos = (df.select(F.col(id_col).alias("__id__"),
                     F.posexplode(toks).alias("__p__", "__t__")))
    words = pos.filter((F.col("__t__") != "")
                       & ~F.col("__t__").isin(stop)
                       & ~F.col("__t__").rlike("[^a-z0-9]"))
    w = W.partitionBy("__id__").orderBy("__p__")
    phr = (words
           .withColumn("__isl__",
                       F.col("__p__") - F.row_number().over(w))
           .groupBy("__id__", "__isl__")
           .agg(F.transform(
               F.array_sort(F.collect_list(
                   F.struct(F.col("__p__"), F.col("__t__")))),
               lambda s: s.getField("__t__")).alias("__ws__"),
               F.count(F.lit(1)).cast("long").alias("plen"))
           .filter(F.col("plen") <= max_len))
    occ_words = phr.select("__id__", "__isl__", "plen",
                           F.explode("__ws__").alias("w"))
    dec = "decimal(38,0)"
    wstats = (occ_words.groupBy("w")
              .agg(F.count(F.lit(1)).cast("long").alias("__f__"),
                   F.sum("plen").cast("long").alias("__d__"))
              .withColumn("__score__", F.expr(
                  f"CAST((1000000 * CAST(__d__ AS {dec}))"
                  f" div __f__ AS BIGINT)")))
    occ = (occ_words.join(F.broadcast(wstats.select("w", "__score__")),
                          "w")
           .groupBy("__id__", "__isl__")
           .agg(F.max("plen").alias("plen"),
                F.sum("__score__").cast("long").alias("__s__")))
    phrases = (phr.select("__id__", "__isl__",
                          F.concat_ws(" ", F.col("__ws__"))
                          .alias("phrase"))
               .join(occ, ["__id__", "__isl__"]))
    return (phrases.groupBy("phrase")
            .agg(F.max("plen").cast("long").alias("n_words"),
                 F.count(F.lit(1)).cast("long")
                 .alias("n_occurrences"),
                 F.max("__s__").cast("long").alias("score_ppm"))
            .filter(F.col("n_occurrences") >= min_count))


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 5,
                   postings_k: int = 10) -> DataFrame:
    """Inverted index over whitespace tokens: per term, document
    frequency, collection frequency, and the top-``postings_k``
    posting list ``"doc:tf,..."`` ranked by tf desc / doc asc — the
    search-index build step BM25 retrieval (``bm25_search``) assumes,
    materialized as a table instead of recomputed per query.

    The posting list is emitted as a STRING (concat of ``doc:tf``)
    so the exact oracle comparison stays scalar; order inside the
    string is total (tf desc, doc asc) and replayable by SQL
    ``string_agg(... ORDER BY ...)``.

    Scale shape: one shuffle to the (term, doc) grain; df/cf and the
    posting cut run on THAT grain (vocabulary-sized, not corpus-
    sized); the per-term window is bounded by a term's document
    count, and ``min_df`` prunes the hapax tail before the window.
    """
    from pyspark.sql.window import Window as W

    td = (df.select(F.col(id_col).alias("__doc__"),
                    F.explode(token_array(F.lower(F.col(text_col))))
                    .alias("__t__"))
          .filter(F.col("__t__") != "")
          .groupBy("__t__", "__doc__")
          .agg(F.count(F.lit(1)).alias("__tf__")))
    stats = (td.groupBy("__t__")
             .agg(F.count(F.lit(1)).cast("long").alias("df"),
                  F.sum("__tf__").cast("long").alias("cf"))
             .filter(F.col("df") >= min_df))
    pruned = td.join(stats.select("__t__"), "__t__")
    w = W.partitionBy("__t__").orderBy(F.col("__tf__").desc(),
                                       F.col("__doc__"))
    top = (pruned.withColumn("__rn__", F.row_number().over(w))
           .filter(F.col("__rn__") <= postings_k))
    posted = (top.groupBy("__t__")
              .agg(F.concat_ws(",", F.transform(
                  F.array_sort(F.collect_list(F.struct(
                      (-F.col("__tf__")).alias("ntf"),
                      F.col("__doc__").alias("d")))),
                  lambda s: F.concat(s["d"].cast("string"),
                                     F.lit(":"),
                                     (-s["ntf"]).cast("string"))))
              .alias("postings")))
    return (stats.join(posted, "__t__")
            .select(F.col("__t__").alias("term"),
                    "df", "cf", "postings"))


def textrank_keywords(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", iterations: int = 2,
                      top_k: int = 20) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): content
    tokens (``^[a-z]{3,}$`` after lowercasing) are graph nodes, each
    adjacent pair in the FILTERED per-document sequence contributes
    one undirected co-occurrence edge (multiplicity = weight), and
    the corpus-level graph is ranked with the same fixed-point
    integer PageRank as ``link_pagerank`` — bit-identical at any
    parallelism, SQL-replayable (multi-edges make the weighted
    contribution an exact integer multiple of the per-edge
    truncated share).

    Complements RAKE (within-phrase degree/frequency) and tf-idf
    (corpus contrast) with a global graph-centrality signal.

    Scale shape: tokenization + adjacency are one per-document
    window over token positions; the rank loop joins on the
    VOCABULARY grain.  Returns the global top-``top_k`` by
    (rank desc, token asc) — a TakeOrdered, never a full sort.
    """
    from pyspark.sql.window import Window as W

    from cubes_spark.llm.web import link_pagerank

    toks = df.select(
        F.col(id_col).alias("__doc__"),
        F.posexplode(token_array(F.lower(F.col(text_col))))
        .alias("__pos__", "__t__"))
    kept = toks.filter(F.col("__t__").rlike("^[a-z]{3,}$"))
    w = W.partitionBy("__doc__").orderBy("__pos__")
    # checkpoint the adjacent-pair frame: the symmetric union reads
    # it twice and would re-run the token window per branch (r15)
    pairs = (kept.withColumn("__nxt__", F.lead("__t__").over(w))
             .filter(F.col("__nxt__").isNotNull()
                     & (F.col("__nxt__") != F.col("__t__")))
             .select("__t__", "__nxt__")
             .localCheckpoint(eager=True))
    edges = (pairs.select(F.col("__t__").alias("src"),
                          F.col("__nxt__").alias("dst"))
             .union(pairs.select(F.col("__nxt__").alias("src"),
                                 F.col("__t__").alias("dst"))))
    ranks = link_pagerank(edges, iterations=iterations)
    return (ranks.orderBy(F.col("rank_units").desc(), F.col("node"))
            .limit(top_k)
            .select(F.col("node").alias("token"), "rank_units"))


_DEC38 = "decimal(38,0)"


def vocab_growth(df: DataFrame, text_col: str = "text",
                 strata_col: str = "source") -> DataFrame:
    """Per-stratum vocabulary statistics (the Heaps-law / lexical-
    richness corpus signal): total tokens, distinct types, hapax
    count (frequency-1 types), and the type-token + hapax-type
    ratios in exact ppm — a falling type-token ratio across a
    crawl's snapshots is the classic saturation/duplication smell.

    Scale shape: one shuffle to the (stratum, token) grain, then one
    algebraic aggregation per stratum; ratios are truncating integer
    divs on the counts.
    """
    toks = (df.select(F.col(strata_col).alias("stratum"),
                      F.explode(token_array(F.lower(F.col(text_col))))
                      .alias("__t__"))
            .filter(F.col("__t__") != ""))
    grain = (toks.groupBy("stratum", "__t__")
             .agg(F.count(F.lit(1)).alias("__c__")))
    return (grain.groupBy("stratum")
            .agg(F.sum("__c__").cast("long").alias("n_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_types"),
                 F.sum((F.col("__c__") == 1).cast("long"))
                 .cast("long").alias("n_hapax"))
            .withColumn("ttr_ppm",
                        F.expr("(1000000 * n_types) div n_tokens"))
            .withColumn("hapax_ppm",
                        F.expr("(1000000 * n_hapax) div n_types")))


def source_concentration(df: DataFrame, group_col: str = "lang",
                         source_col: str = "source") -> DataFrame:
    """Herfindahl–Hirschman concentration of each group's rows over
    sources, exact ppm: HHI = Σ share² = (Σ c²) / N² — emitted as
    ``(10^6 · Σc²) div N²`` (the monopoly smell of a training mix:
    10^6 = one source; 10^6/k = k equal sources).

    Scale shape: (group, source) grain then one algebraic
    aggregation; the squares run in decimal(38,0).
    """
    grain = (df.groupBy(F.col(group_col).alias("grp"),
                        F.col(source_col).alias("__s__"))
             .agg(F.count(F.lit(1)).alias("__c__")))
    c = F.col("__c__").cast(_DEC38)
    return (grain.groupBy("grp")
            .agg(F.sum("__c__").cast(_DEC38).alias("__n__"),
                 F.sum(c * c).alias("__sq__"),
                 F.count(F.lit(1)).cast("long").alias("n_sources"))
            .select(F.col("grp").alias(group_col),
                    F.col("__n__").cast("long").alias("n_rows"),
                    "n_sources",
                    F.expr("CAST((CAST(1000000 AS decimal(38,0))"
                           " * __sq__) div (__n__ * __n__) AS BIGINT)")
                    .alias("hhi_ppm")))


def rrf_fuse(rankings: Sequence[DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", k: int = 60,
             top_k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) —
    the standard hybrid-retrieval combiner (BM25 ⊕ dense ⊕ priors):
    each input ranking contributes ``1/(k + rank)`` per document,
    quantized to the exact integer ``10^6 div (k + rank)`` so the
    fused score is an int64 SUM a SQL oracle replays; ties break on
    the id.  Documents appearing in more lists naturally float up.

    Scale shape: inputs are already top-N lists (bounded), so the
    union/groupBy/TakeOrdered all run on list-sized data — fusion
    cost is independent of corpus size by construction.
    """
    from functools import reduce

    from pyspark.sql.window import Window as W

    contribs = [
        r.select(F.col(id_col),
                 F.expr(f"CAST(1000000 div ({int(k)} + {rank_col})"
                        f" AS BIGINT)").alias("__c__"))
        for r in rankings]
    u = reduce(lambda a, b: a.unionAll(b), contribs)
    fused = (u.groupBy(id_col)
             .agg(F.sum("__c__").cast("long").alias("rrf_micro"),
                  F.count(F.lit(1)).cast("long").alias("n_lists")))
    top = fused.orderBy(F.col("rrf_micro").desc(),
                        F.col(id_col)).limit(int(top_k))
    w = W.orderBy(F.col("rrf_micro").desc(), F.col(id_col))
    return top.withColumn("fused_rank",
                          F.row_number().over(w).cast("long"))


def distinctive_terms(df: DataFrame, text_col: str = "text",
                      strata_col: str = "source", top_k: int = 5,
                      min_count: int = 10) -> DataFrame:
    """Most over-represented tokens per stratum by chi-square
    contribution — 'what vocabulary makes this source different'
    (the corpus-drift / contamination smell test).  Per observed
    (stratum, token) cell with count O, margins R (stratum tokens)
    and C (token total) and corpus total N, the signed deviation
    O·N − R·C > 0 marks over-representation and the exact truncated
    ``contrib_ppm = 10^6·(O·N − R·C)² div (R·C·N)`` ranks it; top-k
    per stratum with (contrib desc, token asc) determinism.

    Scale shape: one shuffle to the (stratum, token) grain; margins
    on the stratum/token grains; the rank window runs on the
    ``min_count``-pruned positive cells only.
    """
    from pyspark.sql.window import Window as W

    toks = (df.select(F.col(strata_col).alias("stratum"),
                      F.explode(token_array(F.lower(F.col(text_col))))
                      .alias("__t__"))
            .filter(F.col("__t__") != ""))
    obs = (toks.groupBy("stratum", "__t__")
           .agg(F.count(F.lit(1)).alias("__o__")))
    rm = obs.groupBy("stratum").agg(F.sum("__o__").alias("__rm__"))
    cm = obs.groupBy("__t__").agg(F.sum("__o__").alias("__cm__"))
    tot = obs.agg(F.sum("__o__").alias("__n__"))
    dec = "decimal(38,0)"
    cells = (obs.filter(F.col("__o__") >= int(min_count))
             .join(F.broadcast(rm), "stratum").join(cm, "__t__")
             .crossJoin(F.broadcast(tot))
             .withColumn("__dev__",
                         F.col("__o__").cast(dec) * F.col("__n__")
                         - F.col("__rm__").cast(dec)
                         * F.col("__cm__"))
             .filter(F.col("__dev__") > 0)
             .withColumn(
                 "contrib_ppm",
                 F.expr(f"CAST((__dev__ * __dev__ * 1000000)"
                        f" div (CAST(__rm__ AS {dec}) * __cm__"
                        f" * __n__) AS BIGINT)")))
    w = W.partitionBy("stratum").orderBy(
        F.col("contrib_ppm").desc(), F.col("__t__"))
    return (cells.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= int(top_k))
            .select("stratum", F.col("__t__").alias("term"),
                    F.col("__o__").cast("long").alias("n"),
                    "contrib_ppm",
                    F.col("__rn__").cast("long").alias("rank")))


def heaps_curve(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                fractions: int = 10) -> DataFrame:
    """Vocabulary saturation curve (Heaps' law, measured): distinct
    type count at nested deterministic corpus fractions 1/k … k/k —
    the 'is more data still buying new vocabulary' curve.  Documents
    land in fraction buckets by portable hash, so fraction p is a
    true random p/k sample AND the samples nest; a type's first
    appearance is its MINIMUM document bucket, so one (token →
    min-bucket) reduction plus a k-row cumulative sum yields every
    point — the corpus is scanned once.

    Returns ``(fraction, n_docs_cum, n_tokens_cum, n_types_cum)``,
    all exact counts.
    """
    from pyspark.sql.window import Window as W

    bucket = (hash64(F.col(id_col).cast("string")) % fractions) + 1
    toks = (df.select(bucket.alias("__b__"), F.col(id_col),
                      F.explode(token_array(
                          F.lower(F.col(text_col)))).alias("__t__"))
            .filter(F.col("__t__") != ""))
    per_bucket = (df.select(bucket.alias("__b__"), F.col(id_col))
                  .groupBy("__b__")
                  .agg(F.count(F.lit(1)).alias("__docs__")))
    tok_counts = (toks.groupBy("__b__")
                  .agg(F.count(F.lit(1)).alias("__toks__")))
    first_seen = (toks.groupBy("__t__")
                  .agg(F.min("__b__").alias("__fb__"))
                  .groupBy("__fb__")
                  .agg(F.count(F.lit(1)).alias("__new__")))
    spine = df.sparkSession.createDataFrame(
        [(i,) for i in range(1, fractions + 1)], "__b__ long")
    joined = (spine
              .join(per_bucket, "__b__", "left")
              .join(tok_counts, "__b__", "left")
              .join(first_seen.withColumnRenamed("__fb__", "__b__"),
                    "__b__", "left")
              .fillna({"__docs__": 0, "__toks__": 0, "__new__": 0}))
    w = W.orderBy("__b__").rowsBetween(W.unboundedPreceding, 0)
    return joined.select(
        F.col("__b__").cast("long").alias("fraction"),
        F.sum("__docs__").over(w).cast("long").alias("n_docs_cum"),
        F.sum("__toks__").over(w).cast("long").alias("n_tokens_cum"),
        F.sum("__new__").over(w).cast("long").alias("n_types_cum"))


def zipf_fit(df, text_col: str = "text", top_k: int = 100):
    """Zipf's-law fit over the corpus term-frequency distribution:
    OLS of ln(count) on ln(rank) for the ``top_k`` most frequent
    terms — slope ≈ −1 is the classic natural-language signature;
    the fit (and its r²) is the standard corpus-health check in a
    training-data pipeline (a slope near 0 means synthetic/uniform
    text, a cliff means boilerplate domination).

    Determinism: ranks are fully tie-broken (count desc, term asc);
    the five OLS sums of ``ln`` terms run as SEQUENTIAL folds over
    rank-ordered arrays (``aggregate`` over ``array_sort`` — the
    shannon_entropy pattern), and the ln values themselves come from
    :func:`~cubes_spark.llm.util.libm_ln` because the JVM's Math.log
    disagrees with the C library's (= DuckDB's) by 1 ulp on ~2% of
    integer inputs.  A running window sum is also not enough: DuckDB
    evaluates window aggregates with a segment tree, so its addition
    order differs from Spark's cumulative fold at the last bit; a
    list fold is left-to-right in both engines.

    Scale shape: one shuffle to the term grain; the rank window runs
    on the vocabulary grain and the folds on the bounded top-k array.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    terms = (df.select(F.explode(token_array(F.col(text_col)))
                       .alias("__t__"))
             .groupBy("__t__")
             .agg(F.count(F.lit(1)).cast("long").alias("__c__")))
    wr = W.orderBy(F.col("__c__").desc(), F.col("__t__").asc())
    top = (terms.withColumn("__r__", F.row_number().over(wr))
           .filter(F.col("__r__") <= top_k))
    from cubes_spark.llm.util import libm_ln

    # ln through the C library (libm_ln), NOT F.expr("ln"): the JVM
    # and glibc disagree by 1 ulp on ~2% of integer inputs, and the
    # oracle's ln is glibc — the top-k frame is bounded so the
    # Python hop costs nothing
    lned = top.select(
        "__r__",
        libm_ln(F.col("__r__").cast("double")).alias("__x__"),
        libm_ln(F.col("__c__").cast("double")).alias("__y__"))
    arr = lned.agg(
        F.count(F.lit(1)).cast("long").alias("k_terms"),
        F.array_sort(
            F.collect_list(F.struct("__r__", "__x__", "__y__")))
        .alias("__a__"))
    fold = ("aggregate(transform(__a__, e -> {term}),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    sums = arr.select(
        "k_terms",
        F.expr(fold.format(term="e.__x__")).alias("sx"),
        F.expr(fold.format(term="e.__y__")).alias("sy"),
        F.expr(fold.format(term="e.__x__ * e.__x__")).alias("sxx"),
        F.expr(fold.format(term="e.__x__ * e.__y__")).alias("sxy"),
        F.expr(fold.format(term="e.__y__ * e.__y__")).alias("syy"))
    return sums.select(
        "k_terms",
        F.expr("(k_terms*sxy - sx*sy)/(k_terms*sxx - sx*sx)")
        .alias("slope"),
        F.expr("((k_terms*sxy - sx*sy)*(k_terms*sxy - sx*sy))"
               "/((k_terms*sxx - sx*sx)*(k_terms*syy - sy*sy))")
        .alias("r2"))


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_words: int = 5,
                   min_kept_lines: int = 3) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020, §2.2 of the
    T5 paper): line-level rules keep only lines that (a) end in a
    terminal punctuation mark (``. ! ? "``), (b) have at least
    ``min_words`` whitespace words, and (c) do not mention
    "javascript"; document-level rules then mark a page dropped when
    fewer than ``min_kept_lines`` lines survive, when it contains a
    curly brace (code), or when the phrase "lorem ipsum" appears —
    the exact published recipe minus the external bad-words list.

    Emits every document with its audit trail (``n_lines``,
    ``n_kept``, the ``kept`` verdict, cleaned text + its md5) rather
    than silently dropping rows, so acceptance rates per source are
    one groupBy away.

    Scale shape: one narrow projection — the line split, the filter
    lambda and the rejoin are all JVM higher-order array functions
    evaluated per row inside whole-stage codegen; no explode, no
    shuffle, no Python.
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep(line):
        t = F.trim(line)
        last = F.substring(t, -1, 1)
        return ((F.length(t) > 0)
                & ((last == ".") | (last == "!") | (last == "?")
                   | (last == '"'))
                & (F.size(F.split(t, r"\s+")) >= min_words)
                & (~F.contains(F.lower(t), F.lit("javascript"))))

    kept = F.filter(lines, _keep)
    clean = F.array_join(kept, "\n")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        ((F.size(kept) >= min_kept_lines)
         & (~F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum")))
         & (~F.contains(F.col(text_col), F.lit("{")))).alias("kept"),
        clean.alias("clean_text"),
        F.md5(clean).alias("clean_md5"))


#: the Gopher stop-word list (Rae et al. 2021, table A1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and",
                    "that", "have", "with")


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          min_words: int = 50,
                          max_words: int = 100_000) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, appendix A1.1 — the
    MassiveWeb repetition-free quality heuristics, also the base of
    RefinedWeb's and Dolma's filters): a page is kept when

    * ``min_words <= word count <= max_words``,
    * mean word length is in [3, 10] characters,
    * the symbol-to-word ratio (``#`` and ``...``) is <= 0.1,
    * fewer than 90% of lines start with a bullet (``•`` / ``- ``),
    * at most 30% of lines end with an ellipsis,
    * at least 80% of words contain an alphabetic character, and
    * at least two distinct Gopher stop words occur as word tokens.

    Every ratio is evaluated by INTEGER cross-multiplication
    (``symbols*10 <= words``), so the verdict is exact and an ANSI
    oracle replays it bit-for-bit.  Emits the raw counters plus the
    ``kept`` verdict — acceptance dashboards per source/lang are one
    groupBy away, and any single rule can be recomputed downstream.

    Scale shape: one narrow projection — token/line arrays and the
    rule folds are JVM higher-order functions inside whole-stage
    codegen; no explode, no shuffle, no Python.
    """
    t = F.col(text_col)
    toks = token_array(t)
    lower_toks = F.transform(toks, F.lower)
    lines = F.split(t, "\n")
    n_words = F.size(toks).cast("long")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x)).alias("word_chars")
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = F.floor(
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
        / 3).cast("long")
    n_symbols = (n_hash.cast("long") + n_ell)
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).startswith("•")
        | F.trim(l).startswith("- "))).cast("long")
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).endswith("..."))).cast("long")
    alpha_words = F.size(F.filter(
        toks, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(lower_toks),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))).cast("long")

    out = df.select(
        F.col(id_col), n_words.alias("n_words"),
        word_chars.cast("long").alias("word_chars"),
        n_symbols.alias("n_symbols"), n_lines.alias("n_lines"),
        bullet_lines.alias("bullet_lines"),
        ellipsis_lines.alias("ellipsis_lines"),
        alpha_words.alias("alpha_words"),
        stop_hits.alias("stop_hits"))
    kept = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("word_chars") >= 3 * F.col("n_words"))
            & (F.col("word_chars") <= 10 * F.col("n_words"))
            & (F.col("n_symbols") * 10 <= F.col("n_words"))
            & (F.col("bullet_lines") * 10 < F.col("n_lines") * 9)
            & (F.col("ellipsis_lines") * 10 <= F.col("n_lines") * 3)
            & (F.col("alpha_words") * 10 >= F.col("n_words") * 8)
            & (F.col("stop_hits") >= 2))
    return out.withColumn("kept", kept)


def dedup_lines_within_doc(df: DataFrame, text_col: str = "text",
                           out_col: str = "clean_text") -> DataFrame:
    """Intra-document line dedup: drop REPEATED lines within each
    page, keeping the first occurrence — the within-page half of
    boilerplate removal (nav menus, cookie banners and footers repeat
    inside a page as well as across pages; :func:`line_dedup` handles
    the across-pages half globally).

    Keeps a line iff its index equals the index of the line's first
    occurrence (``array_position``), preserving order.  Adds
    ``out_col`` plus ``n_lines``/``n_unique_lines``.

    Scale shape: one narrow projection of JVM array functions — per
    row O(lines²) string comparisons, fine at the page grain (tens of
    lines); no explode, no shuffle, no Python.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines,
                    lambda l, i: F.array_position(lines, l) == i + 1)
    return (df
            .withColumn(out_col, F.array_join(kept, "\n"))
            .withColumn("n_lines", F.size(lines).cast("long"))
            .withColumn("n_unique_lines", F.size(kept).cast("long")))


def pack_shards_by_bytes(df: DataFrame, size_col: str = "n_chars",
                         id_col: str = "doc_id",
                         target_bytes: int = 1 << 20,
                         num_partitions: Optional[int] = None
                         ) -> DataFrame:
    """Bytes-balanced export sharding: lay documents end-to-end in
    deterministic id order and assign each to the shard containing
    its START offset — every shard holds ~``target_bytes`` (one doc
    of overshoot), documents are never split, and the assignment is
    a pure function of the data (re-running on a re-partitioned
    corpus yields identical shards).  The size-aware counterpart of
    :func:`shuffle_shards` (count-balanced) for WebDataset/tar
    export where shard SIZE, not document count, is the contract.

    Same two-phase prefix sum as :func:`pack_sequences` (value-range
    buckets, one bounded per-bucket-totals collect, broadcast
    offsets, bucket-local window) — never a one-partition global
    cumsum.  Returns ``(id, size, start_byte, shard_id)``.
    """
    from pyspark.sql.window import Window

    base = df.select(F.col(id_col),
                     F.col(size_col).cast("long").alias("__sz__"))
    nparts = num_partitions or 256
    bounds = base.agg(F.min(id_col).alias("lo"),
                      F.max(id_col).alias("hi")).first()
    lo = bounds["lo"] if bounds["lo"] is not None else 0
    hi = bounds["hi"] if bounds["hi"] is not None else 0
    bucket_width = max(1, -(-(hi - lo + 1) // nparts))
    base = base.withColumn(
        "_pid",
        F.floor((F.col(id_col) - F.lit(lo)) / F.lit(bucket_width))
        .cast("int"))
    totals = base.groupBy("_pid").agg(
        F.sum("__sz__").alias("_tot")).collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r._pid):
        offsets.append((row._pid, acc))
        acc += row._tot or 0
    spark = df.sparkSession
    off_df = F.broadcast(spark.createDataFrame(
        offsets or [(0, 0)], "_pid int, _poff long"))
    local = Window.partitionBy("_pid").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (base.join(off_df, "_pid")
            .withColumn("start_byte", F.col("_poff")
                        + F.coalesce(F.sum("__sz__").over(local),
                                     F.lit(0).cast("long")))
            .select(F.col(id_col),
                    F.col("__sz__").alias(size_col),
                    F.col("start_byte"),
                    F.expr(f"start_byte div {int(target_bytes)}")
                    .cast("long").alias("shard_id")))
