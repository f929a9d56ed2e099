"""Property-based tests (hypothesis) for the ingestion and curation
operators: invariants that must hold for ANY input, not just the
fixtures — the reference's property-testing strategy (SURVEY §5)
applied to the new operator families."""

from __future__ import annotations

import io
import tarfile
import zlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=25, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


class TestTarRoundtripProperty:
    @given(members=st.lists(
        st.tuples(
            st.text(alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=1, max_size=20),
            st.binary(min_size=0, max_size=600),
        ),
        min_size=1, max_size=8, unique_by=lambda t: t[0]))
    @settings(**_SETTINGS)
    def test_member_bytes_roundtrip(self, spark, members):
        from cubes_spark.llm import parse_tar

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, data in members:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))],
            "doc_id long, payload binary")
        rows = sorted(parse_tar(df).collect(),
                      key=lambda r: r.member_idx)
        assert [(r.name, bytes(r.payload)) for r in rows] == \
            [(n, d) for n, d in members]
        assert all(r.size == len(bytes(r.payload)) for r in rows)


class TestInflateProperty:
    @given(data=st.binary(min_size=0, max_size=4000),
           level=st.integers(min_value=0, max_value=9))
    @settings(**_SETTINGS)
    def test_zlib_roundtrip(self, spark, data, level):
        from cubes_spark.llm import inflate_column

        df = spark.createDataFrame(
            [(1, bytearray(zlib.compress(data, level)))],
            "doc_id long, payload binary")
        got = inflate_column(df).head().inflated
        assert bytes(got) == data


class TestPackSequencesProperty:
    @given(counts=st.lists(st.integers(min_value=0, max_value=50),
                           min_size=1, max_size=60),
           window=st.integers(min_value=1, max_value=64),
           nparts=st.integers(min_value=1, max_value=7))
    @settings(**_SETTINGS)
    def test_invariants(self, spark, counts, window, nparts):
        from cubes_spark.llm import pack_sequences

        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate(counts)],
            "doc_id long, n long")
        rows = pack_sequences(df, tokens_col="n", window=window,
                              num_partitions=nparts).collect()
        # token conservation: every token lands in exactly one bin
        per_doc: dict = {}
        per_bin: dict = {}
        for r in rows:
            assert 0 < r.tokens_in_bin <= window
            assert 0 <= r.offset_in_bin < window
            per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.tokens_in_bin
            per_bin[r.bin_id] = per_bin.get(r.bin_id, 0) + r.tokens_in_bin
        assert per_doc == {i: n for i, n in enumerate(counts) if n > 0}
        # every bin except the last is exactly full
        total = sum(counts)
        if total:
            last = max(per_bin)
            for b, filled in per_bin.items():
                assert filled == (window if b != last
                                  else total - window * last)


class TestSamplingProperty:
    @given(permille=st.integers(min_value=0, max_value=1000))
    @settings(max_examples=10, deadline=None)
    def test_monotone_in_rate(self, spark, permille):
        from cubes_spark.llm import deterministic_sample

        df = spark.createDataFrame([(i,) for i in range(300)],
                                   "doc_id long")
        a = {r.doc_id for r in
             deterministic_sample(df, keep_permille=permille).collect()}
        b = {r.doc_id for r in deterministic_sample(
            df, keep_permille=min(1000, permille + 100)).collect()}
        assert a <= b
        if permille == 0:
            assert a == set()
        if permille == 1000:
            assert len(a) == 300


class TestAhashProperty:
    @given(seed=st.integers(min_value=0, max_value=10 ** 6),
           w=st.integers(min_value=8, max_value=24),
           h=st.integers(min_value=8, max_value=24),
           shift=st.integers(min_value=1, max_value=40))
    @settings(**_SETTINGS)
    def test_brightness_invariance(self, seed, w, h, shift):
        """Adding a constant (no wraparound) never changes the hash."""
        import struct

        from cubes_spark.llm.multimodal import ahash_bytes

        def bmp(offset):
            palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
            stride = (w + 3) // 4 * 4
            rows = b""
            for y in range(h - 1, -1, -1):
                row = bytes(((seed + x * 7 + y * 11) % 200) + offset
                            for x in range(w))
                rows += row + b"\x00" * (stride - w)
            off = 54 + len(palette)
            return (b"BM" + struct.pack("<IHHI", off + len(rows),
                                        0, 0, off)
                    + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                                  len(rows), 0, 0, 256, 0)
                    + palette + rows)

        assert ahash_bytes(bmp(0)) == ahash_bytes(bmp(shift))


class TestLineDedupProperty:
    @given(docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=9)
        .map(lambda ws: " ".join(f"w{c}" for c in ws)),
        min_size=1, max_size=12))
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_invariants(self, spark, docs):
        from cubes_spark.llm import line_dedup

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string")
        rows = line_dedup(df, line_tokens=3).collect()
        assert len(rows) == len(docs)
        # invariant 1: kept <= total per doc; totals = ceil(len/3)
        for r in rows:
            toks = docs[r.doc_id].split()
            expect_lines = max(1, -(-len(toks) // 3))
            assert r.n_lines == expect_lines
            assert 0 <= r.n_lines_kept <= r.n_lines
        # invariant 2: across the corpus every kept line text is
        # globally unique, and equals the set of all distinct lines
        def lines_of(text):
            toks = text.split()
            n = max(1, -(-len(toks) // 3))
            return [" ".join(toks[i * 3:(i + 1) * 3])
                    for i in range(n)]

        kept_lines = []
        for r in rows:
            if r.cleaned_text:
                kept_lines += lines_of(" ".join(
                    r.cleaned_text.split()))
        all_lines = {ln for d in docs for ln in lines_of(d)}
        # kept empty-string lines vanish in reassembly; compare
        # non-empty distinct lines
        assert sorted(x for x in kept_lines if x) \
            == sorted(x for x in all_lines if x)


class TestShuffleShardsProperty:
    @given(n=st.integers(min_value=0, max_value=300),
           shards=st.integers(min_value=1, max_value=9),
           seed=st.text(alphabet="xyz", min_size=1, max_size=3))
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_permutation(self, spark, n, shards, seed):
        from cubes_spark.llm import shuffle_shards

        df = spark.range(n).withColumnRenamed("id", "doc_id")
        out = shuffle_shards(df, num_shards=shards,
                             seed=seed).collect()
        # a permutation: every input id exactly once
        assert sorted(r.doc_id for r in out) == list(range(n))
        # dense positions per shard
        by_shard: dict = {}
        for r in out:
            assert 0 <= r.shard < shards
            by_shard.setdefault(r.shard, []).append(r.position)
        for positions in by_shard.values():
            assert sorted(positions) == list(
                range(1, len(positions) + 1))


class TestFeatureHashEmbedProperty:
    @given(texts=st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta",
                                  "epsilon"]),
                 min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=8),
        dim=st.sampled_from([4, 16, 33]))
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_norm_and_stability(self, spark, texts, dim):
        import math

        from cubes_spark.llm import feature_hash_embed

        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string")
        rows = {r.doc_id: list(r.embedding) for r in
                feature_hash_embed(df, dim=dim).collect()}
        for i, text in enumerate(texts):
            v = rows[i]
            assert len(v) == dim
            n2 = sum(x * x for x in v)
            if text.strip():
                # unit norm unless all contributions cancel exactly
                assert (math.isclose(n2, 1.0, rel_tol=1e-9)
                        or n2 == 0.0)
            else:
                assert n2 == 0.0
        # identical text -> identical vector across rows
        seen: dict = {}
        for i, text in enumerate(texts):
            if text in seen:
                assert rows[i] == seen[text]
            seen[text] = rows[i]
        # partition invariance
        again = {r.doc_id: list(r.embedding) for r in
                 feature_hash_embed(df.repartition(3),
                                    dim=dim).collect()}
        assert again == rows


class TestHistogramQuantileProperty:
    @given(values=st.lists(st.integers(min_value=-1000, max_value=1000),
                           min_size=1, max_size=120),
           width=st.integers(min_value=1, max_value=50),
           q_bp=st.integers(min_value=1, max_value=10000))
    @settings(**_SETTINGS)
    def test_true_rank_value_in_bucket(self, spark, values, width,
                                       q_bp):
        """For ANY integer multiset, width and quantile, the true
        rank-⌈q·N⌉ value lies inside the reported bucket bounds."""
        import math

        from cubes_spark.functions.sketches import histogram_quantiles

        df = spark.createDataFrame([(v,) for v in values], "v long")
        rows = histogram_quantiles(df, "v", [q_bp],
                                   width=width).collect()
        assert len(rows) == 1
        row = rows[0]
        truth = sorted(values)[
            max(math.ceil(q_bp / 10000 * len(values)), 1) - 1]
        assert row.est_lo <= truth <= row.est_hi
        assert row.total == len(values)


class TestTriangleProperty:
    @given(edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9),
                  st.integers(min_value=0, max_value=9)),
        min_size=0, max_size=25))
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_matches_brute_force(self, spark, edges):
        """Degree-oriented counting equals the brute-force triangle
        enumeration on ANY small graph (self-loops / duplicates /
        reversed edges included)."""
        from itertools import combinations

        from cubes_spark.llm.web import triangle_counts

        simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        nodes = {n for e in simple for n in e}
        want: dict = {}
        for tri in combinations(sorted(nodes), 3):
            a, b, c = tri
            if {(a, b), (a, c), (b, c)} <= simple:
                for n in tri:
                    want[n] = want.get(n, 0) + 1
        if not edges:
            return
        df = spark.createDataFrame(
            list(edges), "id_a long, id_b long")
        got = {r.node: r.n_triangles
               for r in triangle_counts(df).collect()}
        assert got == want


class TestLetBinding:
    def test_let_value_and_composition(self, spark):
        """let_ returns body(value) unchanged (the binding is purely
        an evaluation-count optimization — see llm/util.let_ and the
        NOTES_r12 microbenchmark for the 10x recompute it prevents),
        and nests/composes like any Column."""
        from pyspark.sql import functions as F

        from cubes_spark.llm.util import let_

        df = spark.range(50)
        text = F.concat(F.lit("abcdef"), F.col("id").cast("string"))
        shingles = let_(text, lambda t: F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2))))
        got = df.select(F.size(shingles).alias("n")).agg(
            F.sum("n")).first()[0]
        # |text| in {7,8}: ids 0-9 -> 6 shingles, 10-49 -> 7
        assert got == 10 * 6 + 40 * 7

        # nested let_: inner binding visible inside outer body
        nested = let_(F.col("id") * 2, lambda a: let_(
            a + 1, lambda b: a + b))          # 2id + 2id+1 = 4id+1
        total = df.select(nested.alias("v")).agg(F.sum("v")).first()[0]
        assert total == sum(4 * i + 1 for i in range(50))

        # NULL value flows through (array element NULL, body sees it)
        nul = let_(F.lit(None).cast("long"), lambda x: x + 1)
        assert df.select(nul.alias("v")).first()["v"] is None
