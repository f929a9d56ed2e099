"""Learned document-quality classifier — the DCLM/fastText-filter
shape of modern pretraining pipelines (Li et al. 2024, arXiv:
2406.11794; the production successor of C4/Gopher rule filters).

A logistic-regression quality model over the engine's own text
statistics: TRAINING is driver-side on a bounded deterministic sample
(IRLS in numpy — the FAISS-centroid pattern already used for IVF/
k-means: O(sample) work, weights ride the plan as literals), SCORING
is a pure-JVM dot product + sigmoid over every document — no Python
in the corpus path, no shuffle, scales with input partitions.

Weak supervision comes free: the existing rule-based
``quality_score`` labels the sample (score >= threshold -> positive),
and the learned model generalizes those rules into a smooth ranking —
exactly how production quality filters are bootstrapped before human
or LLM labels exist.

Determinism: features are the ROUNDED text_stats columns (4 decimals,
oracle-exact on any engine), the sample is the first ``sample_size``
documents by id, and IRLS is plain double-precision numpy — the same
weights every run.  The logit (dot product over rounded features and
weight literals) is bit-identical across engines; ``sigmoid`` of it
is exposed for users but correctness entries compare the logit (exp()
is the one op SQL engines may round differently).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cubes_spark.llm.text import text_stats

__all__ = [
    "QUALITY_FEATURES",
    "quality_feature_columns",
    "train_quality_classifier",
    "score_quality_classifier",
]

#: model features, all present in (or derived 1:1 from) text_stats
#: output; every one rounded to 4 decimals before use
QUALITY_FEATURES = [
    "len_score",            # min(n_tokens / 100, 1)
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio_en",
]


def quality_feature_columns(stats: DataFrame) -> DataFrame:
    """Add the model's feature columns to a text_stats frame."""
    return stats.withColumn(
        "len_score",
        F.round(F.least(F.col("n_tokens").cast("double") / 100.0,
                        F.lit(1.0)), 4))


def _irls(X, y, iters: int, l2: float):
    """Logistic regression via iteratively reweighted least squares —
    deterministic, no RNG, converges in a handful of iterations on
    well-scaled features."""
    import numpy as np

    n, d = X.shape
    w = np.zeros(d)
    eye = np.eye(d) * l2
    for _ in range(iters):
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        s = np.maximum(p * (1.0 - p), 1e-9)
        # Newton step: (X'SX + l2 I) dw = X'(y - p)
        H = (X * s[:, None]).T @ X + eye
        g = X.T @ (y - p)
        try:
            step = np.linalg.solve(H, g)
        except np.linalg.LinAlgError:
            break
        w = w + step
        if float(np.max(np.abs(step))) < 1e-10:
            break
    return [float(v) for v in w]


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: Optional[str] = None,
    teacher_threshold: float = 0.5,
    sample_size: int = 2048,
    iters: int = 25,
    l2: float = 1e-3,
) -> List[float]:
    """Train the quality model; returns ``[bias, w_1, ..., w_k]``
    aligned with :data:`QUALITY_FEATURES`.

    ``label_col`` supplies real labels when you have them; without
    one, the rule-based ``quality_score`` weak-labels the sample at
    ``teacher_threshold`` (rule distillation).  The sample is the
    first ``sample_size`` rows by id — bounded, deterministic,
    engine-portable.
    """
    import numpy as np

    stats = quality_feature_columns(text_stats(df, text_col))
    cols = [id_col] + QUALITY_FEATURES
    if label_col:
        cols.append(label_col)
    else:
        stats = stats.withColumn(
            "__label__",
            (F.col("quality_score") >= teacher_threshold).cast("int"))
        cols.append("__label__")
    rows = (stats.select(*cols).orderBy(id_col)
            .limit(sample_size).collect())
    if not rows:
        raise ValueError("empty training frame")
    X = np.array([[1.0] + [float(r[f]) for f in QUALITY_FEATURES]
                  for r in rows])
    y = np.array([float(r[-1]) for r in rows])
    return _irls(X, y, iters, l2)


def score_quality_classifier(
    df: DataFrame,
    weights: Sequence[float],
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the trained model: adds ``logit``
    (bit-exact across engines: a dot product over rounded features
    and weight literals) and ``model_score`` (its sigmoid).  One
    narrow pass, pure JVM expressions."""
    if len(weights) != len(QUALITY_FEATURES) + 1:
        raise ValueError(
            f"expected {len(QUALITY_FEATURES) + 1} weights "
            f"(bias + features), got {len(weights)}")
    stats = quality_feature_columns(text_stats(df, text_col))
    logit: Column = F.lit(float(weights[0]))
    for w, feat in zip(weights[1:], QUALITY_FEATURES):
        logit = logit + F.lit(float(w)) * F.col(feat)
    return (
        stats.withColumn("logit", logit)
        .withColumn("model_score",
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))
    )


# -- DSIR: data selection via importance resampling -------------------------

def _dsir_buckets(text_col: str, dim: int, ngram_max: int,
                  seed: str) -> Column:
    """Hashed n-gram bucket ids for one document: unigrams (and word
    bigrams for ``ngram_max>=2``) of the whitespace tokens, each
    hashed into ``[0, dim)`` with the portable md5 hash — the hashed
    bag-of-ngrams feature space of Xie et al. 2023 (DSIR,
    arXiv:2302.03169)."""
    from cubes_spark.llm.text import hash64, token_array
    from cubes_spark.llm.util import let_

    def body(toks: Column) -> Column:
        # toks is LET-BOUND: referencing the raw token_array
        # expression from the per-position bigram lambda would
        # re-split the text once per bigram (O(n²) in tokens)
        grams = toks
        if ngram_max >= 2:
            bigrams = F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat(F.element_at(toks, i),
                                       F.lit(" "),
                                       F.element_at(toks, i + 1))),
            ).otherwise(F.array().cast("array<string>"))
            grams = F.concat(toks, bigrams)
        return F.transform(
            grams,
            lambda g: (hash64(F.concat(F.lit(seed + ":"), g))
                       % dim).cast("int"))

    return let_(token_array(F.col(text_col)), body)


def _dsir_buckets_py(s, dim: int, ngram_max: int, seed: str,
                     memo=None):
    """Python replica of :func:`_dsir_buckets` for the r15 Arrow
    stages — same token split (``token_array``: trim U+0020, Java
    ``\\s+``), same bigram strings, same ``hash64 % dim`` (first 15
    md5 hex digits).  None for null text (the fold's null algebra);
    parity-tested in tests/test_minhash_arrow.py.  ``memo`` (optional,
    per task) caches the gram→bucket map — md5 is a pure function of
    the gram bytes, so the memo is bit-identical; admission stops at
    the dedup kernels' ``_MD5_MEMO_CAP``."""
    import hashlib
    import re

    from cubes_spark.llm.dedup import _JAVA_WS_PATTERN, _MD5_MEMO_CAP

    if s is None:
        return None
    t = s.strip(" ")
    if t == "":
        toks = []
    else:
        toks = re.split(_JAVA_WS_PATTERN, t)
    grams = list(toks)
    if ngram_max >= 2 and len(toks) >= 2:
        grams += [toks[i] + " " + toks[i + 1]
                  for i in range(len(toks) - 1)]
    pre = (seed + ":").encode("utf-8")
    if memo is None:
        return [
            (int.from_bytes(
                hashlib.md5(pre + g.encode("utf-8")).digest()[:8],
                "big") >> 4) % dim
            for g in grams
        ]
    out = []
    for g in grams:
        bk = memo.get(g)
        if bk is None:
            bk = (int.from_bytes(
                hashlib.md5(pre + g.encode("utf-8")).digest()[:8],
                "big") >> 4) % dim
            if len(memo) < _MD5_MEMO_CAP:
                memo[g] = bk
        out.append(bk)
    return out


def dsir_bucket_counts(df: DataFrame, text_col: str = "text",
                       dim: int = 256, ngram_max: int = 2,
                       seed: str = "dsir") -> List[int]:
    """Per-bucket hashed n-gram occurrence counts over a corpus.

    Fully distributed — explode + groupBy(bucket) — and the collect is
    bounded by ``dim`` rows regardless of corpus size, so "training"
    the DSIR language models never funnels data through the driver.
    """
    rows = (
        df.select(F.explode(
            _dsir_buckets(text_col, dim, ngram_max, seed))
            .alias("__b__"))
        .groupBy("__b__").agg(F.count(F.lit(1)).alias("__n__"))
        .collect()
    )
    counts = [0] * dim
    for r in rows:
        counts[r["__b__"]] = int(r["__n__"])
    return counts


def dsir_bucket_counts_pair(df: DataFrame, target_cond: Column,
                            text_col: str = "text",
                            dim: int = 256, ngram_max: int = 2,
                            seed: str = "dsir"):
    """Target and raw bucket counts in ONE corpus pass: the explode
    carries the target predicate, the groupBy aggregates both a
    conditional and an unconditional count — identical values to two
    :func:`dsir_bucket_counts` calls at half the scan/hash cost.
    Returns ``(target_counts, raw_counts)``."""
    # r15: per-batch dim-bounded count arrays in one Arrow stage (C
    # md5 via _dsir_buckets_py) instead of exploding one row per gram
    # through the interpreted bucket HOF; the groupBy merges integer
    # partials — identical counts
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)

    from cubes_spark.llm.util import spread

    src = spread(df).select(target_cond.cast("int").alias("__t__"),
                            F.col(text_col))
    schema = StructType([StructField("__b__", IntegerType()),
                         StructField("__tn__", LongType()),
                         StructField("__n__", LongType())])

    def fn(batches):
        import numpy as np
        import pandas as pd

        tn = np.zeros(dim, dtype=np.int64)
        nn = np.zeros(dim, dtype=np.int64)
        memo: dict = {}  # gram → bucket, per task (md5 is pure)
        for pdf in batches:
            flags = pdf["__t__"]
            for i, s in enumerate(pdf[text_col]):
                bks = _dsir_buckets_py(s, dim, ngram_max, seed, memo)
                if not bks:
                    continue
                arr = np.asarray(bks, dtype=np.int64)
                np.add.at(nn, arr, 1)
                # == 1, not truthiness: a NULL predicate arrives as
                # NaN and F.sum would have skipped it
                if flags.iloc[i] == 1:
                    np.add.at(tn, arr, 1)
        nz = np.nonzero(nn)[0]
        if len(nz):
            yield pd.DataFrame({"__b__": nz.astype("int32"),
                                "__tn__": tn[nz], "__n__": nn[nz]})

    rows = (src.mapInPandas(fn, schema)
            .groupBy("__b__").agg(
                F.sum("__tn__").alias("__tn__"),
                F.sum("__n__").alias("__n__"))
            .collect())
    target, raw = [0] * dim, [0] * dim
    for r in rows:
        target[r["__b__"]] = int(r["__tn__"] or 0)
        raw[r["__b__"]] = int(r["__n__"])
    return target, raw


def dsir_log_ratios(target_counts: Sequence[int],
                    raw_counts: Sequence[int],
                    alpha: float = 0.5,
                    quant: float = 1e-6) -> List[int]:
    """Quantized per-bucket log importance ratios
    ``log p_target(b) - log p_raw(b)`` with add-``alpha`` smoothing.

    Quantization to integer ``quant`` units makes the per-document
    score an int64 SUM — exact and merge-order independent at any
    parallelism (the same trick as the trigram LM), and replayable
    verbatim by a SQL oracle."""
    import math

    dim = len(target_counts)
    if len(raw_counts) != dim:
        raise ValueError("count vectors must share the feature dim")
    t_total = sum(target_counts) + alpha * dim
    r_total = sum(raw_counts) + alpha * dim
    out = []
    for tc, rc in zip(target_counts, raw_counts):
        ratio = (math.log((tc + alpha) / t_total)
                 - math.log((rc + alpha) / r_total))
        out.append(int(round(ratio / quant)))
    return out


def dsir_score(df: DataFrame, log_ratios_q: Sequence[int],
               text_col: str = "text",
               dim: Optional[int] = None,
               ngram_max: int = 2,
               seed: str = "dsir") -> DataFrame:
    """Score every document with the DSIR importance weight: adds
    ``dsir_score_q`` (int64, quantized-units sum of its hashed
    n-grams' log ratios — documents that look like the target
    distribution score high) and ``n_grams``.

    One narrow JVM pass per document: a single fold over the bucket
    array indexing a ``dim``-sized literal array — no shuffle, no
    Python, no join; scales with input partitions.  Selection is a
    downstream ``orderBy``/``filter`` on the score (top-k or Gumbel
    resampling per the paper).
    """
    dim = dim or len(log_ratios_q)
    if len(log_ratios_q) != dim:
        raise ValueError("log_ratios_q length must equal dim")
    # r15: one Arrow stage (C md5 + an int64 table lookup sum) in
    # place of the interpreted bucket HOF + per-gram fold over a
    # dim-literal array.  The score is an integer SUM — exact and
    # order-independent — so bit-identity is structural; null text
    # keeps the fold's null algebra (NULL score, NULL n_grams).
    from pyspark.sql.types import LongType, StructField, StructType

    from cubes_spark.llm.util import spread

    ratios = [int(v) for v in log_ratios_q]
    base = df if df.isStreaming else spread(df)
    out_schema = StructType(
        list(base.schema.fields)
        + [StructField("dsir_score_q", LongType(), True),
           StructField("n_grams", LongType(), True)])

    def fn(batches):
        import numpy as np

        rt = np.asarray(ratios, dtype=np.int64)
        memo: dict = {}  # gram → bucket, per task (md5 is pure)
        for pdf in batches:
            scores, ngrams = [], []
            for s in pdf[text_col]:
                bks = _dsir_buckets_py(s, dim, ngram_max, seed, memo)
                if bks is None:
                    scores.append(None)
                    ngrams.append(None)
                elif not bks:
                    scores.append(0)
                    ngrams.append(0)
                else:
                    arr = np.asarray(bks, dtype=np.int64)
                    scores.append(int(rt[arr].sum()))
                    ngrams.append(len(bks))
            out = pdf.copy()
            out["dsir_score_q"] = scores
            out["n_grams"] = ngrams
            yield out

    return base.mapInPandas(fn, out_schema)


def dsir_resample(scored: DataFrame, k: int,
                  id_col: str = "doc_id",
                  score_col: str = "dsir_score_q",
                  quant: float = 1e-6,
                  seed: str = "gumbel") -> DataFrame:
    """DSIR's selection step: sample ``k`` documents WITHOUT
    replacement with probability proportional to the importance
    weight, via the Gumbel-top-k trick — ``key = log w + g`` with
    i.i.d. Gumbel noise ``g``, the top-k keys are an exact
    w-proportional sample (Vieira 2014; the DSIR paper's resampling).

    The noise is SEEDED PER DOCUMENT from the portable md5 hash of
    ``seed:id`` (u in (0,1) from 60 hash bits, ``g = -ln(-ln u)``), so
    the "random" sample is deterministic, partition-invariant and
    replayable by a SQL oracle.  ``log w`` is the quantized DSIR score
    times ``quant`` — the already-computed log importance ratio.

    One narrow pass + a distributed TakeOrdered top-k; adds
    ``gumbel_key`` (rounded to 6 decimals) and ``rank``.
    """
    from pyspark.sql.window import Window

    from cubes_spark.llm.text import hash64

    u = ((hash64(F.concat(F.lit(seed + ":"),
                          F.col(id_col).cast("string")))
          .cast("double") + F.lit(1.0))
         / F.lit(float(2 ** 60 + 1)))
    g = -F.log(-F.log(u))
    key = F.col(score_col).cast("double") * F.lit(float(quant)) + g
    with_key = scored.withColumn("gumbel_key", F.round(key, 6))
    top = with_key.orderBy(F.col("gumbel_key").desc(),
                           F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("gumbel_key").desc(),
                       F.col(id_col).asc())
    return top.withColumn("rank",
                          F.row_number().over(w).cast("long"))
