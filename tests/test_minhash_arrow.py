"""Bit-parity of the r15 Arrow-native shingle/MinHash/SimHash kernels
against the JVM-expression pipeline they replaced.

The critical risk is the text NORMALIZATION (the r14 round deferred
this rewrite precisely over JVM-vs-Python divergence): Java's ``\\s``
is ASCII-only, Spark's ``trim`` strips U+0020 only, and ``lower`` must
agree character-for-character.  These tests fuzz the Python replica
against the live Spark expressions over adversarial Unicode, then pin
the end-to-end signatures/bands/fingerprints to the pre-r15 SQL
pipeline (reconstructed verbatim) on edge-case corpora.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cubes_spark.llm.dedup import (
    MINHASH_P,
    _band_digests_py,
    _normalize_text_py,
    _shingle_array,
    _shingle_hashes_py,
    _shingle_list_py,
    minhash_params,
    minhash_signatures,
    row_minhash_bands,
    simhash,
)
from cubes_spark.llm.text import hash64, token_array

# whitespace & confusables Java and Python regexes disagree on:
# U+00A0 NBSP, U+1680 OGHAM, U+2000-200A spaces, U+2028/29 separators,
# U+205F, U+3000 — Unicode \s in Python, NOT \s in Java; plus ASCII
# controls that ARE Java \s, plus case-mapping specials.
_ADVERSARIAL = [
    None, "", " ", "  ", "\t", " ", "a b", " x ",
    "　wide　", "line sep", "para sep",
    " mixed\t\n\x0b\x0c\rws ", "\x0bvtab\x0c", "UPPER lower MiXeD",
    "straße", "İstanbul", "ı dotless", "FI ﬁ lig",
    "ΑΣΣ greek σς", "café  CAFÉ",
    "a" * 3, "ab cd ef", "  leading", "trailing   ", "\tleadtab",
    "trail\t", "in  ner   runs", "ⅠⅡ roman",
    "𝐀 math bold", "emoji \U0001f600 x",
    "cyr АБВ абв",
]


@pytest.fixture(scope="module")
def fuzz_texts():
    rng = np.random.RandomState(99)
    pool = (" abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
            "\t\n\x0b\x0c\r  　ßİı"
            "ΣςéÉ.,!?0123456789")
    texts = list(_ADVERSARIAL)
    for n in (1, 3, 7, 20, 80, 300):
        for _ in range(12):
            texts.append("".join(
                pool[i] for i in rng.randint(0, len(pool), size=n)))
    return texts


class TestNormalizerParity:
    def test_normalize_matches_spark_expression(self, spark,
                                                fuzz_texts):
        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "i long, text string")
        want = {
            r["i"]: r["n"] for r in df.select(
                "i",
                F.regexp_replace(F.lower(F.trim(F.col("text"))),
                                 r"\s+", " ").alias("n")).collect()
        }
        for i, t in enumerate(fuzz_texts):
            assert _normalize_text_py(t) == want[i], repr(t)

    def test_shingle_list_matches_shingle_array(self, spark,
                                                fuzz_texts):
        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "i long, text string")
        for k in (2, 5):
            want = {
                r["i"]: r["sh"] for r in df.select(
                    "i", _shingle_array(F.col("text"), k).alias("sh")
                ).collect()
            }
            for i, t in enumerate(fuzz_texts):
                assert _shingle_list_py(t, k) == want[i], (k, repr(t))

    def test_token_split_matches_spark(self, spark, fuzz_texts):
        """simhash's token_array(lower(text)) replica: split keeps
        leading/trailing empty fields exactly like Spark's limit=-1."""
        import re

        from cubes_spark.llm.dedup import _JAVA_WS_PATTERN

        ws = re.compile(_JAVA_WS_PATTERN)
        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "i long, text string")
        want = {
            r["i"]: r["toks"] for r in df.select(
                "i",
                token_array(F.lower(F.col("text"))).alias("toks")
            ).collect()
        }
        for i, t in enumerate(fuzz_texts):
            if t is None:
                got = None
            else:
                low = t.lower().strip(" ")
                got = [] if low == "" else ws.split(low)
            assert got == want[i], repr(t)


def _sql_minhash_signatures(spark, df, num_hashes=16, shingle_k=5):
    """The pre-r15 JVM pipeline, verbatim: explode shingles, one md5
    per (doc, shingle), groupBy with num_hashes min-aggregates."""
    from cubes_spark.llm.util import spread

    a, b = minhash_params(num_hashes)
    shingles = spread(df).select(
        F.col("doc_id"),
        F.explode_outer(
            _shingle_array(F.col("text"), shingle_k)
        ).alias("__shingle__"),
    )
    base = hash64(F.col("__shingle__"), nhex=8) % F.lit(MINHASH_P)
    hashed = shingles.select(F.col("doc_id"), base.alias("__h__"))
    aggs = [
        F.min((F.lit(a[i]) * F.col("__h__") + F.lit(b[i]))
              % F.lit(MINHASH_P)).alias(f"__m{i}__")
        for i in range(num_hashes)
    ]
    sig = hashed.groupBy("doc_id").agg(*aggs)
    return sig.select(
        F.col("doc_id"),
        F.array(*[F.col(f"__m{i}__")
                  for i in range(num_hashes)]).alias("sig"))


class TestSignatureParity:
    def test_signatures_bit_identical(self, spark, fuzz_texts):
        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        want = {r["doc_id"]: r["sig"] for r in
                _sql_minhash_signatures(spark, df).collect()}
        got = {r["doc_id"]: r["sig"] for r in
               minhash_signatures(df).collect()}
        assert got == want

    def test_duplicate_ids_merge_like_groupby(self, spark):
        rows = [(1, "aaaa bbbb cccc"), (1, "dddd eeee ffff"),
                (2, "gggg"), (2, None), (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        want = {r["doc_id"]: r["sig"] for r in
                _sql_minhash_signatures(spark, df).collect()}
        got = {r["doc_id"]: r["sig"] for r in
               minhash_signatures(df).collect()}
        assert got == want

    def test_row_bands_match_sql_banding(self, spark, fuzz_texts):
        """row_minhash_bands digests == banding the SQL signatures."""
        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        num_hashes, bands = 16, 4
        rws = num_hashes // bands
        sigs = _sql_minhash_signatures(spark, df)
        band_arr = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bb: F.md5(
                F.concat_ws(
                    ",", bb.cast("string"),
                    F.slice(F.col("sig"), bb * rws + 1, rws)
                    .cast("array<string>"))),
        )
        want = {
            (r["doc_id"], r["band_id"]): r["band_hash"]
            for r in sigs.select(
                "doc_id",
                F.posexplode(band_arr).alias("band_id", "band_hash")
            ).collect()
        }
        got = {
            (r["doc_id"], r["band_id"]): r["band_hash"]
            for r in row_minhash_bands(df).collect()
        }
        assert got == want


def _sql_simhash(spark, df, nbits=48):
    """The pre-r15 simhash: explode tokens, JVM md5, vote groupBy."""
    from cubes_spark.llm.util import spread

    toks = spread(df).select(
        F.col("doc_id"),
        F.explode_outer(
            token_array(F.lower(F.col("text")))).alias("__token__"),
    )
    hashed = toks.select(F.col("doc_id"),
                         hash64(F.col("__token__")).alias("__h__"))
    votes = hashed.groupBy("doc_id").agg(*[
        F.sum(
            F.shiftright(F.col("__h__"), b).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"__v{b}__")
        for b in range(nbits)
    ])
    fingerprint = F.lit(0).cast("long")
    for b in range(nbits):
        fingerprint = fingerprint + F.when(
            F.col(f"__v{b}__") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col("doc_id"), fingerprint.alias("simhash"))


class TestSimhashParity:
    def test_fingerprints_bit_identical(self, spark, fuzz_texts):
        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        want = {r["doc_id"]: r["simhash"] for r in
                _sql_simhash(spark, df).collect()}
        got = {r["doc_id"]: r["simhash"] for r in
               simhash(df).collect()}
        assert got == want

    def test_duplicate_ids_merge_votes(self, spark):
        rows = [(1, "x y z"), (1, "x x x x x"), (2, ""), (3, None),
                (3, "k")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        want = {r["doc_id"]: r["simhash"] for r in
                _sql_simhash(spark, df).collect()}
        got = {r["doc_id"]: r["simhash"] for r in
               simhash(df).collect()}
        assert got == want


class TestBandDigestHelper:
    def test_null_sig_digests_band_id_only(self):
        import hashlib

        got = _band_digests_py(None, 4, 4)
        want = [hashlib.md5(str(b).encode()).hexdigest()
                for b in range(4)]
        assert got == want


class TestShingleHashes:
    def test_hash_matches_sql_hash64_mod_p(self, spark):
        sh = ["abcde", "  x  ", "", "café!", "ßß"]
        df = spark.createDataFrame([(s,) for s in sh], "s string")
        want = [r["h"] for r in df.select(
            (hash64(F.col("s"), nhex=8) % F.lit(MINHASH_P)).alias("h")
        ).collect()]
        import hashlib
        got = [int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[:4], "big")
            % MINHASH_P for s in sh]
        assert got == want


def _sql_feature_hash_embed(spark, df, dim=16, seed="feat"):
    """The pre-r15 JVM fold, verbatim (transform/aggregate over the
    token array with a dim-array accumulator)."""
    from pyspark.sql import functions as F

    toks = token_array(F.col("text"))
    contribs = F.transform(
        toks,
        lambda t: F.struct(
            (hash64(F.concat(F.lit(seed + ":"), t), nhex=15)
             % dim).cast("int").alias("c"),
            F.when(
                hash64(F.concat(F.lit(seed + "#:"), t), nhex=8) % 2
                == 0,
                F.lit(1.0)).otherwise(F.lit(-1.0)).alias("s"),
        ))
    base_cols = [F.col(c) for c in df.columns]
    staged = df.select(*base_cols, contribs.alias("__cs__"))
    zero = F.array_repeat(F.lit(0.0), dim)
    raw = F.aggregate(
        F.col("__cs__"), zero,
        lambda acc, x: F.transform(
            acc,
            lambda v, i: v + F.when(x["c"] == i, x["s"])
            .otherwise(F.lit(0.0))),
    )
    staged = staged.select(*base_cols, raw.alias("__raw__"))
    norm = F.sqrt(F.aggregate(
        F.col("__raw__"), F.lit(0.0), lambda acc, x: acc + x * x))
    staged = staged.select(*base_cols, F.col("__raw__"),
                           norm.alias("__norm__"))
    unit = F.when(
        F.col("__norm__") > 0,
        F.transform(F.col("__raw__"),
                    lambda x: x / F.col("__norm__"))) \
        .otherwise(F.col("__raw__"))
    return staged.select(*base_cols, unit.alias("embedding"))


class TestFeatureHashEmbedParity:
    def test_embeddings_bit_identical(self, spark, fuzz_texts):
        import struct

        from cubes_spark.llm.text import feature_hash_embed

        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        def packed(rows_):
            out = {}
            for r in rows_:
                v = r["embedding"]
                out[r["doc_id"]] = (None if v is None else
                                    struct.pack(f"<{len(v)}d", *v))
            return out

        want = packed(_sql_feature_hash_embed(spark, df).collect())
        got = packed(feature_hash_embed(df, dim=16).collect())
        assert got == want


class TestDsirParity:
    def test_buckets_and_score_match_sql(self, spark, fuzz_texts):
        from cubes_spark.llm.quality import (_dsir_buckets,
                                             _dsir_buckets_py,
                                             dsir_score)

        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        dim = 64
        want_bk = {
            r["doc_id"]: r["bk"] for r in df.select(
                "doc_id",
                _dsir_buckets("text", dim, 2, "dsir").alias("bk")
            ).collect()
        }
        for i, t in enumerate(fuzz_texts):
            assert _dsir_buckets_py(t, dim, 2, "dsir") == want_bk[i], \
                repr(t)

        # end-to-end score vs the pre-r15 fold, reconstructed
        ratios = [((7 * i + 3) % 101) - 50 for i in range(dim)]
        lit_ratios = F.array(*[F.lit(int(v)) for v in ratios])
        staged = df.select(
            "doc_id",
            _dsir_buckets("text", dim, 2, "dsir").alias("__bk__"))
        score = F.aggregate(
            F.col("__bk__"), F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(lit_ratios, b + 1))
        want = {
            r["doc_id"]: (r["s"], r["n"]) for r in staged.select(
                "doc_id", score.alias("s"),
                F.size(F.col("__bk__")).cast("long").alias("n")
            ).collect()
        }
        got = {
            r["doc_id"]: (r["dsir_score_q"], r["n_grams"])
            for r in dsir_score(df, ratios, dim=dim).collect()
        }
        assert got == want

    def test_bucket_counts_pair_match(self, spark, fuzz_texts):
        from cubes_spark.llm.quality import (_dsir_buckets,
                                             dsir_bucket_counts_pair)

        rows = [(i, t) for i, t in enumerate(fuzz_texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        dim = 64
        # pre-r15 explode pipeline, verbatim
        rows_sql = (
            df.select(
                (F.col("doc_id") % 3 == 0).cast("int").alias("__t__"),
                F.explode(_dsir_buckets("text", dim, 2, "dsir"))
                .alias("__b__"))
            .groupBy("__b__").agg(
                F.sum("__t__").alias("__tn__"),
                F.count(F.lit(1)).alias("__n__"))
            .collect())
        want_t, want_r = [0] * dim, [0] * dim
        for r in rows_sql:
            want_t[r["__b__"]] = int(r["__tn__"] or 0)
            want_r[r["__b__"]] = int(r["__n__"])
        got_t, got_r = dsir_bucket_counts_pair(
            df, F.col("doc_id") % 3 == 0, dim=dim)
        assert (got_t, got_r) == (want_t, want_r)
