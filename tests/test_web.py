"""WARC parsing + HTML text extraction (cubes_spark.llm.web)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from cubes_spark.llm import extract_links, html_to_text, parse_warc


def _warc_record(wtype: str, payload: bytes, uri: str = None) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes, ctype: str = "text/html") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)


class TestParseWarc:
    def test_multi_record_file(self, spark):
        body = "<html><body>hello é</body></html>".encode()
        warc = (_warc_record("warcinfo", b"software: test")
                + _warc_record("request", b"GET / HTTP/1.1\r\n\r\n",
                               uri="http://x.test/")
                + _warc_record("response", _http_response(body),
                               uri="http://x.test/"))
        df = spark.createDataFrame([(1, bytearray(warc))],
                                   "doc_id long, payload binary")
        rows = {r.record_idx: r for r in parse_warc(df).collect()}
        assert len(rows) == 3
        assert rows[0].warc_type == "warcinfo"
        assert bytes(rows[0].body) == b"software: test"
        assert rows[1].warc_type == "request"
        assert rows[2].warc_type == "response"
        assert rows[2].http_status == 200
        assert rows[2].content_type == "text/html"
        assert bytes(rows[2].body) == body
        assert rows[2].body_len == len(body)
        assert rows[2].target_uri == "http://x.test/"

    def test_binary_body_with_fake_separators(self, spark):
        # Content-Length framing: body containing CRLFCRLF + WARC/1.0
        # must NOT split the record
        body = b"\r\n\r\nWARC/1.0\r\n\x00\xff binary"
        warc = _warc_record("resource", body)
        df = spark.createDataFrame([(7, bytearray(warc))],
                                   "doc_id long, payload binary")
        rows = parse_warc(df).collect()
        assert len(rows) == 1
        assert bytes(rows[0].body) == body

    def test_truncated_shard_stops_clean(self, spark):
        good = _warc_record("resource", b"abc")
        bad = b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 100" \
              b"\r\n\r\nonly a few bytes"
        df = spark.createDataFrame([(1, bytearray(good + bad))],
                                   "doc_id long, payload binary")
        rows = parse_warc(df).collect()
        assert len(rows) == 1          # truncated record dropped
        assert bytes(rows[0].body) == b"abc"


class TestHtmlToText:
    def _one(self, spark, html: str) -> str:
        df = spark.createDataFrame([(html,)], "html string")
        return html_to_text(df).head().text

    def test_script_style_comment_removed(self, spark):
        html = ("<html><head><style>p {color: red;}</style></head>"
                "<body><!-- note --><script>if (1 < 2) { x(); }</script>"
                "<p>Hello   world</p></body></html>")
        assert self._one(spark, html) == "Hello world"

    def test_entities_and_double_escape(self, spark):
        # literal &lt; escaped as &amp;lt; must decode to "&lt;" not "<"
        html = "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &amp;lt;</p>"
        assert self._one(spark, html) == 'a & b <tag> "q" &lt;'

    def test_multiline_tags_and_whitespace(self, spark):
        html = "<div\n class='x'>one</div>\n\n<p>two\nthree</p>"
        assert self._one(spark, html) == "one two three"

    def test_links(self, spark):
        html = ('<a href="http://a.test/1">x</a> '
                '<A HREF="http://a.test/2">y</A>')
        df = spark.createDataFrame([(html,)], "html string")
        assert extract_links(df).head().links == [
            "http://a.test/1", "http://a.test/2"]


class TestWarcHtmlPipeline:
    def test_end_to_end(self, spark):
        body = ("<html><body><h1>Title</h1><script>var a=1;</script>"
                "<p>Body &amp; text</p></body></html>").encode()
        warc = _warc_record("response", _http_response(body),
                            uri="http://x.test/page")
        df = spark.createDataFrame([(1, bytearray(warc))],
                                   "doc_id long, payload binary")
        recs = parse_warc(df).filter(F.col("warc_type") == "response")
        text = html_to_text(
            recs.withColumn("html", F.col("body").cast("string")))
        row = text.head()
        assert row.text == "Title Body & text"
        assert hashlib.md5(bytes(row.body)).hexdigest() == \
            hashlib.md5(body).hexdigest()


class TestParseTar:
    def _tar_bytes(self, members):
        import io
        import tarfile

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, data in members:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        return buf.getvalue()

    def test_members_roundtrip(self, spark):
        from cubes_spark.llm import parse_tar

        tar = self._tar_bytes([
            ("s0.txt", "héllo".encode()),
            ("s0.cls", b"en"),
            ("s1.txt", b"\x00\xffbinary"),
        ])
        df = spark.createDataFrame([(3, bytearray(tar))],
                                   "doc_id long, payload binary")
        rows = {r.member_idx: r for r in parse_tar(df).collect()}
        assert len(rows) == 3
        assert rows[0].name == "s0.txt"
        assert bytes(rows[0].payload) == "héllo".encode()
        assert rows[0].size == len("héllo".encode())
        assert bytes(rows[2].payload) == b"\x00\xffbinary"

    def test_webdataset_samples(self, spark):
        from cubes_spark.llm import webdataset_samples

        tar = self._tar_bytes([
            ("a.img", b"IMG-A"), ("a.cls", b"7"),
            ("b.img", b"IMG-B"), ("b.cls", b"9"),
        ])
        df = spark.createDataFrame([(1, bytearray(tar))],
                                   "doc_id long, payload binary")
        rows = {r.key: r.parts for r in
                webdataset_samples(df).collect()}
        assert set(rows) == {"a", "b"}
        assert bytes(rows["a"]["img"]) == b"IMG-A"
        assert bytes(rows["a"]["cls"]) == b"7"
        assert bytes(rows["b"]["cls"]) == b"9"

    def test_directories_skipped(self, spark):
        import io
        import tarfile

        from cubes_spark.llm import parse_tar

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            d = tarfile.TarInfo("dir/")
            d.type = tarfile.DIRTYPE
            tf.addfile(d)
            info = tarfile.TarInfo("dir/f.bin")
            info.size = 2
            tf.addfile(info, io.BytesIO(b"ab"))
        df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                                   "doc_id long, payload binary")
        rows = parse_tar(df).collect()
        assert len(rows) == 1 and rows[0].name == "dir/f.bin"


class TestInflateJsonl:
    def test_inflate_zlib_gzip_raw(self, spark):
        import gzip as gz
        import zlib

        from cubes_spark.llm import inflate_column

        raw = "héllo compressed wörld".encode() * 10
        rows = [(1, zlib.compress(raw)),
                (2, gz.compress(raw)),
                (3, b"definitely not compressed")]
        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in rows],
            "doc_id long, payload binary")
        out = {r.doc_id: r.inflated
               for r in inflate_column(df).collect()}
        assert bytes(out[1]) == raw
        assert bytes(out[2]) == raw
        assert out[3] is None           # corrupt -> NULL, not error

        rawdef = zlib.compressobj(wbits=-15)
        stream = rawdef.compress(raw) + rawdef.flush()
        df2 = spark.createDataFrame([(1, bytearray(stream))],
                                    "doc_id long, payload binary")
        got = inflate_column(df2, format="raw").head().inflated
        assert bytes(got) == raw

    def test_parse_jsonl(self, spark):
        from cubes_spark.llm import parse_jsonl

        blob = ('{"id": 1, "lang": "en"}\n'
                '\n'
                'THIS IS NOT JSON\n'
                '{"id": 2, "lang": "de"}\n')
        df = spark.createDataFrame([(9, blob)],
                                   "doc_id long, payload string")
        rows = {r.line_no: r for r in parse_jsonl(
            df, schema="id long, lang string").collect()}
        assert set(rows) == {0, 2, 3}   # blank line skipped
        assert rows[0].rec.id == 1 and rows[0].rec.lang == "en"
        assert rows[3].rec.lang == "de"
        # corrupt line: NULL struct, raw line kept for quarantine
        assert rows[2].rec is None or rows[2].rec.id is None
        assert rows[2].line == "THIS IS NOT JSON"

    def test_gzip_tar_pipeline(self, spark):
        import gzip as gz
        import io
        import tarfile

        from cubes_spark.llm import inflate_column, parse_tar

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            info = tarfile.TarInfo("x.txt")
            info.size = 5
            tf.addfile(info, io.BytesIO(b"12345"))
        shard = gz.compress(buf.getvalue())
        df = spark.createDataFrame([(1, bytearray(shard))],
                                   "doc_id long, payload binary")
        members = parse_tar(
            inflate_column(df), tar_col="inflated")
        row = members.head()
        assert row.name == "x.txt" and bytes(row.payload) == b"12345"


class TestSampling:
    def test_deterministic_sample_stability(self, spark):
        from cubes_spark.llm import deterministic_sample

        df = spark.createDataFrame([(i,) for i in range(1000)],
                                   "doc_id long")
        a = sorted(r.doc_id for r in
                   deterministic_sample(df, keep_permille=200).collect())
        b = sorted(r.doc_id for r in deterministic_sample(
            df.repartition(13), keep_permille=200).collect())
        assert a == b                   # partitioning-invariant
        assert 130 < len(a) < 270       # ~20%
        # monotone: raising the rate only ADDS rows
        c = sorted(r.doc_id for r in
                   deterministic_sample(df, keep_permille=500).collect())
        assert set(a) <= set(c)

    def test_stratified_sample(self, spark):
        from cubes_spark.llm import stratified_sample

        rows = [(i, "ab"[i % 2]) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = stratified_sample(df, "lang", 7).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r.doc_id)
        assert sorted(len(v) for v in by_lang.values()) == [7, 7]
        again = stratified_sample(df.repartition(9), "lang", 7).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


class TestMixtureAndIncremental:
    def test_mixture_sample(self, spark):
        from cubes_spark.llm import mixture_sample

        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        kept = mixture_sample(df, "lang",
                              {"en": 800, "de": 100}).collect()
        en = sum(1 for r in kept if r.lang == "en")
        de = sum(1 for r in kept if r.lang == "de")
        assert 350 < en < 450          # ~80% of 500
        assert 20 < de < 90            # ~10% of 500
        # unconfigured stratum with default 0 -> dropped entirely
        df2 = spark.createDataFrame([(1, "fr")],
                                    "doc_id long, lang string")
        assert mixture_sample(df2, "lang", {"en": 800}).count() == 0
        # deterministic across partitionings
        again = mixture_sample(df.repartition(7), "lang",
                               {"en": 800, "de": 100}).collect()
        assert sorted(map(tuple, kept)) == sorted(map(tuple, again))

    def test_dedup_against(self, spark):
        from cubes_spark.llm import dedup_against

        new = spark.createDataFrame([
            (1, "brand new document"),
            (2, "Already  Ingested text"),    # normalizes to ref
            (3, "another fresh one"),
        ], "doc_id long, text string")
        ref = spark.createDataFrame([
            (100, "already ingested text"),
        ], "doc_id long, text string")
        kept = sorted(r.doc_id for r in dedup_against(new, ref).collect())
        assert kept == [1, 3]
        # broadcast path gives the identical answer
        kept_b = sorted(r.doc_id for r in
                        dedup_against(new, ref, broadcast=True).collect())
        assert kept_b == [1, 3]


class TestPackWebdataset:
    def test_roundtrip_and_determinism(self, spark):
        from cubes_spark.llm import (
            pack_webdataset, parse_tar, webdataset_samples,
        )
        from pyspark.sql import functions as SF

        rows = [(i, i // 3, f"text-{i}", "en" if i % 2 else "de")
                for i in range(9)]
        df = spark.createDataFrame(
            rows, "doc_id long, shard long, text string, lang string")
        shards = pack_webdataset(
            df, "shard", part_cols={"txt": "text", "cls": "lang"})
        got = {r.shard: r for r in shards.collect()}
        assert set(got) == {0, 1, 2}
        assert all(r.n_samples == 3 for r in got.values())

        # round-trip through the ingest side
        samples = webdataset_samples(
            shards.withColumnRenamed("shard", "doc_id"))
        by_key = {(r.id, r.key): r.parts for r in samples.collect()}
        for i in range(9):
            parts = by_key[(i // 3, str(i))]
            assert bytes(parts["txt"]) == f"text-{i}".encode()

        # byte determinism across partitionings
        again = {r.shard: bytes(r.payload) for r in pack_webdataset(
            df.repartition(5), "shard",
            part_cols={"txt": "text", "cls": "lang"}).collect()}
        assert {s: bytes(r.payload) for s, r in got.items()} == again

        # members are key-sorted inside the shard
        members = parse_tar(
            shards.filter(SF.col("shard") == 1)
            .withColumnRenamed("shard", "doc_id"))
        names = [r.name for r in
                 sorted(members.collect(), key=lambda r: r.member_idx)]
        assert names == ["3.cls", "3.txt", "4.cls", "4.txt",
                         "5.cls", "5.txt"]


    def test_webdataset_duplicate_ext_and_dotless(self, spark):
        """A malformed shard repeating an extension within one sample
        (or carrying dotless members, which all land on ext '') must
        not kill the job under mapKeyDedupPolicy=EXCEPTION — first
        member by tar order wins."""
        import io
        import tarfile

        from cubes_spark.llm import webdataset_samples

        def _tar_bytes(members):
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for name, data in members:
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
            return buf.getvalue()

        tar = _tar_bytes([
            ("a.img", b"FIRST"), ("a.img", b"SECOND"),
            ("a.cls", b"7"),
            ("noext1", b"N1"), ("noext2", b"N2"),
        ])
        df = spark.createDataFrame([(1, bytearray(tar))],
                                   "doc_id long, payload binary")
        rows = {r.key: r.parts for r in
                webdataset_samples(df).collect()}
        assert bytes(rows["a"]["img"]) == b"FIRST"
        assert bytes(rows["a"]["cls"]) == b"7"
        # dotless members: one sample per key, ext '' each
        assert bytes(rows["noext1"][""]) == b"N1"
        assert bytes(rows["noext2"][""]) == b"N2"


class TestPagerank:
    def test_matches_reference_and_deterministic(self, spark):
        from cubes_spark.llm import link_pagerank

        # small graph: 0->1, 0->2, 1->2, 2->0, 3->2 (3 dangling-free)
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank_units for r in
               link_pagerank(df, iterations=3).collect()}

        # independent integer reference
        SCALE, D = 10 ** 12, 850
        nodes = {0, 1, 2, 3}
        out = {0: [1, 2], 1: [2], 2: [0], 3: [2]}
        n = len(nodes)
        base = (SCALE * (1000 - D) // 1000) // n
        r = {v: SCALE // n for v in nodes}
        for _ in range(3):
            nxt = {v: base for v in nodes}
            for s, dsts in out.items():
                for d2 in dsts:
                    nxt[d2] += r[s] * D // (1000 * len(dsts))
            r = nxt
        assert got == r
        # the sink-heavy node ranks highest
        assert max(got, key=got.get) == 2
        # partition-invariant
        again = {row.node: row.rank_units for row in
                 link_pagerank(df.repartition(5), iterations=3).collect()}
        assert got == again


    def test_empty_graph_and_scale_validation(self, spark):
        import pytest as _pytest

        from cubes_spark.llm import link_pagerank

        empty = spark.createDataFrame([], "src long, dst long")
        assert link_pagerank(empty, iterations=2).count() == 0

        df = spark.createDataFrame([(0, 1)], "src long, dst long")
        with _pytest.raises(ValueError, match="scale"):
            link_pagerank(df, scale=2 ** 62)

    def test_large_scale_stays_integral(self, spark):
        """scale beyond 2^53: double-division floor would lose ulps —
        the integral `div` must match the pure-int reference exactly."""
        from cubes_spark.llm import link_pagerank

        # rank*permille ~ 3.4e18: far past 2^53 as a double, still
        # within long — and within the validated scale cap 2^62/1000
        SCALE, D = 4 * 10 ** 15, 850
        edges = [(0, 1), (1, 0), (1, 2), (2, 0)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank_units for r in
               link_pagerank(df, iterations=4, scale=SCALE).collect()}
        nodes, out = {0, 1, 2}, {0: [1], 1: [0, 2], 2: [0]}
        n = len(nodes)
        base = (SCALE * (1000 - D) // 1000) // n
        r = {v: SCALE // n for v in nodes}
        for _ in range(4):
            nxt = {v: base for v in nodes}
            for s, dsts in out.items():
                for d2 in dsts:
                    nxt[d2] += r[s] * D // (1000 * len(dsts))
            r = nxt
        assert got == r


class TestLabelPropagation:
    def test_two_cliques_converge(self, spark):
        """Two disjoint triangles: 3 rounds collapse each onto its
        minimum label; no cross-community leakage."""
        from cubes_spark.llm import label_propagation

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
            "src long, dst long")
        got = {r.node: r.label
               for r in label_propagation(edges, rounds=3).collect()}
        assert got[1] == got[2] == got[3]
        assert got[10] == got[11] == got[12]
        assert got[1] != got[10]

    def test_deterministic_and_partition_invariant(self, spark):
        from cubes_spark.llm import label_propagation

        rows = [(i, (i + 1) % 40 + (i // 40) * 40) for i in range(120)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        a = sorted((r.node, r.label) for r in
                   label_propagation(edges, rounds=3).collect())
        b = sorted((r.node, r.label) for r in
                   label_propagation(edges.repartition(7),
                                     rounds=3).collect())
        assert a == b


class TestJaccardLinkPrediction:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, b) for a, b in pairs], "id_a long, id_b long")

    def test_matches_brute_force(self, spark):
        from itertools import combinations

        from cubes_spark.llm.web import jaccard_link_prediction

        pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (0, 4),
                 (4, 5), (5, 0)]
        simple = {(min(a, b), max(a, b)) for a, b in pairs}
        nbr: dict = {}
        for a, b in simple:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        want = {}
        for a, b in combinations(sorted(nbr), 2):
            if (a, b) in simple:
                continue
            c = len(nbr[a] & nbr[b])
            if c >= 1:
                u = len(nbr[a] | nbr[b])
                want[(a, b)] = (c, u, 10000 * c // u)
        got = {(r.node_a, r.node_b): (r.n_common, r.n_union,
                                      r.jaccard_bp)
               for r in jaccard_link_prediction(
                   self._edges(spark, pairs)).collect()}
        assert got == want

    def test_hub_cap_drops_hub_centers(self, spark):
        from cubes_spark.llm.web import jaccard_link_prediction

        # star: hub 0 adjacent to 1..6; leaves share ONLY the hub
        star = [(0, i) for i in range(1, 7)]
        full = jaccard_link_prediction(self._edges(spark, star))
        assert full.count() == 15          # all leaf pairs via hub
        capped = jaccard_link_prediction(
            self._edges(spark, star), max_wedge_degree=3)
        assert capped.count() == 0         # hub center excluded

    def test_adjacent_pairs_excluded(self, spark):
        from cubes_spark.llm.web import jaccard_link_prediction

        tri = [(1, 2), (2, 3), (1, 3)]
        assert jaccard_link_prediction(
            self._edges(spark, tri)).count() == 0


class TestKCore:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "id_a long, id_b long")

    def test_peels_tail_keeps_clique(self, spark):
        """Triangle 1-2-3 with a pendant chain 3-4-5: 2-core keeps the
        triangle, peels the chain (4 first, then 5 would follow)."""
        from cubes_spark.llm.web import kcore_subgraph

        e = self._edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
        out = {r["node"]: r["degree"] for r in
               kcore_subgraph(e, k=2, until_converged=True).collect()}
        assert out == {1: 2, 2: 2, 3: 2}

    def test_fixed_rounds_intermediate_state(self, spark):
        """One synchronous round on a path 1-2-3-4-5 at k=2 drops only
        the endpoints; convergence empties the graph entirely."""
        from cubes_spark.llm.web import kcore_subgraph

        e = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        one = {r["node"] for r in
               kcore_subgraph(e, k=2, rounds=1).collect()}
        assert one == {2, 3, 4}
        conv = kcore_subgraph(e, k=2, until_converged=True).collect()
        assert conv == []

    def test_partition_invariant(self, spark):
        from cubes_spark.llm.web import kcore_subgraph

        pairs = [(a, b) for a in range(8) for b in range(a + 1, 8)
                 if (a + b) % 3 != 0] + [(10, 11)]
        e = self._edges(spark, pairs)
        r1 = sorted(map(tuple, kcore_subgraph(
            e.repartition(1), k=3, until_converged=True).collect()))
        r7 = sorted(map(tuple, kcore_subgraph(
            e.repartition(7), k=3, until_converged=True).collect()))
        assert r1 == r7 and r1


class TestHits:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def test_star_authority(self, spark):
        """Every hub points at node 0: node 0 gets ALL authority,
        hubs split hub mass equally, node 0 has no hub score."""
        from cubes_spark.llm.web import hits_scores

        e = self._edges(spark, [(1, 0), (2, 0), (3, 0)])
        out = {r["node"]: (r["auth_units"], r["hub_units"])
               for r in hits_scores(e, iterations=2,
                                    scale=10 ** 6).collect()}
        assert out[0][0] == 10 ** 6 and out[0][1] == 0
        assert out[1] == out[2] == out[3]
        assert out[1][0] == 0
        # three equal hubs: 10^6 div 3 each (truncated)
        assert out[1][1] == 333333

    def test_partition_invariance(self, spark):
        """Integer arithmetic: same scores at any parallelism."""
        from cubes_spark.llm.web import hits_scores

        pairs = [(i, (i * 3 + 1) % 7) for i in range(7)] + \
                [(i, (i * 5 + 2) % 7) for i in range(7)]
        a = hits_scores(self._edges(spark, pairs).repartition(1),
                        iterations=2).collect()
        b = hits_scores(self._edges(spark, pairs).repartition(13),
                        iterations=2).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestRaLinkPrediction:
    def test_square_cycle(self, spark):
        """4-cycle a-b-c-d: diagonals share both degree-2 corners ->
        ra = 2 * (1e6 div 2); adjacent pairs never predicted."""
        from cubes_spark.llm.web import ra_link_prediction

        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
            "id_a string, id_b string")
        out = {(r["node_a"], r["node_b"]): r for r in
               ra_link_prediction(e).collect()}
        assert set(out) == {("a", "c"), ("b", "d")}
        assert out[("a", "c")]["n_common"] == 2
        assert out[("a", "c")]["ra_ppm"] == 1_000_000

    def test_hub_discounted_and_cap(self, spark):
        """A shared hub contributes ~nothing vs a shared low-degree
        neighbour; max_wedge_degree drops hub-centered wedges."""
        from cubes_spark.llm.web import ra_link_prediction

        # hub h connected to x,y,z,w ; x-y also share private p
        edges = [("h", n) for n in ("x", "y", "z", "w")]
        edges += [("p", "x"), ("p", "y")]
        e = spark.createDataFrame(edges, "id_a string, id_b string")
        out = {(r["node_a"], r["node_b"]): r["ra_ppm"] for r in
               ra_link_prediction(e).collect()}
        # deg(h)=4, deg(p)=2 -> (x,y) = 250000 + 500000
        assert out[("x", "y")] == 750_000
        assert out[("w", "x")] == 250_000  # hub only
        capped = {(r["node_a"], r["node_b"]): r["ra_ppm"] for r in
                  ra_link_prediction(e, max_wedge_degree=3).collect()}
        # hub-CENTERED wedges gone: (w,x) etc. vanish, (x,y) keeps
        # only its p term; (h,p) survives via degree-2 centers x,y
        assert capped == {("x", "y"): 500_000, ("h", "p"): 1_000_000}


class TestAssortativity:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "id_a long, id_b long")

    def test_star_graph_disassortative(self, spark):
        from cubes_spark.llm.web import degree_assortativity
        # star: hub 0 with 4 leaves -> every edge joins deg 4 to
        # deg 1: perfectly disassortative, r == -1
        e = self._edges(spark, [(0, i) for i in range(1, 5)])
        out = degree_assortativity(e).collect()[0]
        assert out["m_directed"] == 8
        assert out["r_ppm"] == -1000000

    def test_regular_graph_degenerate(self, spark):
        from cubes_spark.llm.web import degree_assortativity
        # 4-cycle: every degree 2 -> zero variance -> NULL r
        e = self._edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
        out = degree_assortativity(e).collect()[0]
        assert out["r_ppm"] is None

    def test_two_cliques_assortative_sign(self, spark):
        from cubes_spark.llm.web import degree_assortativity
        # K3 plus a pendant edge: mixed degrees, exact replay check
        e = self._edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
        out = degree_assortativity(e).collect()[0]
        # degrees: 0->2, 1->2, 2->3, 3->1 ; directed edges (x,y):
        # (2,2)x2,(2,3)x2,(3,2)x2,(2,3)->... enumerate:
        xs = {0: 2, 1: 2, 2: 3, 3: 1}
        und = [(0,1),(1,2),(0,2),(2,3)]
        ed = [(xs[a], xs[b]) for a, b in und] + \
             [(xs[b], xs[a]) for a, b in und]
        m = len(ed)
        sx = sum(x for x, _ in ed)
        sxy = sum(x*y for x, y in ed)
        sxx = sum(x*x for x, _ in ed)
        num = m*sxy - sx*sx
        den = m*sxx - sx*sx
        exp = (num*1000000)//den if num >= 0 \
            else -((-num*1000000)//den)
        assert out["r_ppm"] == exp


class TestCanonicalizeUrls:
    def _canon(self, spark, urls):
        from cubes_spark.llm import canonicalize_urls

        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"])
        return [r.canonical_url
                for r in canonicalize_urls(df).orderBy("doc_id").collect()]

    def test_rules(self, spark):
        got = self._canon(spark, [
            "HTTP://WWW.Example.COM:80/Path/x?utm_source=a&id=1#frag",
            "https://example.org:443/",
            "https://example.org:8443/",        # non-default port kept
            "http://a.com/p?gclid=x&fbclid=y&msclkid=z&ref=tw",
            "http://a.com/p?keep=1&utm_medium=m&also=2",
            "http://a.com/p?",                  # empty query dropped
            "not a url at all",
            "ftp://Files.Example.net:80/x",     # :80 kept (not http)
        ])
        assert got == [
            "http://www.example.com/Path/x?id=1",
            "https://example.org",
            "https://example.org:8443",     # root '/' collapses
            "http://a.com/p",
            "http://a.com/p?keep=1&also=2",
            "http://a.com/p",
            None,
            "ftp://files.example.net:80/x",
        ]

    def test_dedup_key_collapses_variants(self, spark):
        variants = [
            "http://Site.com/a?utm_campaign=x",
            "HTTP://site.COM:80/a#top",
            "http://site.com/a",
        ]
        got = set(self._canon(spark, variants))
        assert got == {"http://site.com/a"}


class TestCanonicalizeUrlsFuzz:
    def test_matches_reference(self, spark):
        import random
        import re

        from cubes_spark.llm import canonicalize_urls

        rnd = random.Random(77)
        schemes = ["http", "https", "HTTP", "HtTpS", "ftp"]
        hosts = ["Example.COM", "a.b.ORG", "site.net"]
        ports = ["", ":80", ":443", ":8080"]
        paths = ["", "/", "/a/B", "/p?"]
        params = ["utm_source=1", "gclid", "keep=2", "ref=x",
                  "refer=z", "fbclid=1", "id=9", "utm_x"]
        rows = []
        for i in range(200):
            if rnd.random() < 0.1:
                rows.append((i, "plain text no scheme"))
                continue
            q = "&".join(rnd.sample(params, rnd.randint(0, 4)))
            url = (rnd.choice(schemes) + "://" + rnd.choice(hosts)
                   + rnd.choice(ports) + rnd.choice(paths)
                   + (("?" + q) if q and "?" not in paths else "")
                   + (("#frag") if rnd.random() < 0.3 else ""))
            rows.append((i, url))

        def ref(url):
            url = url.strip()
            m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
            if not m:
                return None
            scheme = m.group(1).lower()
            hm = re.match(r"^[^:/?#]+://([^/?#]*)", url)
            host = hm.group(1).lower()
            if scheme == "http" and host.endswith(":80"):
                host = host[:-3]
            elif scheme == "https" and host.endswith(":443"):
                host = host[:-4]
            rm = re.match(r"^[^:/?#]+://[^/?#]*([^#]*)", url)
            rest = rm.group(1)
            path = rest.split("?", 1)[0]
            if path == "/":
                path = ""
            query = rest.split("?", 1)[1] if "?" in rest else ""
            kept = []
            for p in query.split("&") if query else []:
                bad = (p.startswith("utm_")
                       or any(p == t or p.startswith(t + "=")
                              for t in ("gclid", "fbclid",
                                        "msclkid", "ref")))
                if not bad:
                    kept.append(p)
            out = scheme + "://" + host + path
            if kept:
                out += "?" + "&".join(kept)
            return out

        got = {r.doc_id: r.canonical_url for r in canonicalize_urls(
            spark.createDataFrame(rows, ["doc_id", "url"])).collect()}
        for i, url in rows:
            assert got[i] == ref(url), (i, url, got[i], ref(url))
