"""Web-corpus ingestion: WARC record parsing + HTML text extraction.

The Common-Crawl-shaped front of an LLM training-data pipeline: raw
WARC shards (one binary blob per file, read via ``binaryFile`` or a
documents table) are split into records, the HTTP response bodies are
extracted, and HTML is reduced to clean text.

Scale design:

* :func:`html_to_text` / :func:`extract_links` are pure JVM column
  expression chains (``regexp_replace`` / ``replace`` /
  ``regexp_extract_all``) — whole-stage codegen, zero Python, and
  reproducible in an ANSI-SQL oracle.
* :func:`parse_warc` is a per-row streaming byte walk (Content-Length
  honoured, so bodies may contain anything) in one Arrow
  ``mapInPandas`` stage: no shuffle, records explode locally within
  each input partition.  At 100 TB each WARC shard is one row of a
  ``binaryFile`` scan, so parallelism == number of shards and the
  operator never widens beyond the scan partitioning.

The reference engine has no web ingestion; these are beyond-parity
operators (see STATUS.md "LLM-pipeline operators").
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["triangle_counts", "jaccard_link_prediction",
           "kcore_subgraph",
           "html_to_text", "extract_links", "parse_warc",
           "parse_tar", "webdataset_samples",
           "inflate_column", "parse_jsonl", "pack_webdataset",
           "link_pagerank",
           "WARC_RECORD_SCHEMA", "TAR_MEMBER_SCHEMA",
           "degree_assortativity",
           "canonicalize_urls", "TRACKING_PARAMS",
]


# -- HTML -> text (pure column expressions) ---------------------------------

#: entity decode order matters: named entities BEFORE ``&amp;`` so a
#: literal ``&lt;`` in the source (escaped to ``&amp;lt;``) decodes
#: back to ``&lt;`` and not to ``<`` (double-unescape bug).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_text_column(html) -> F.Column:
    """HTML → plain text as a single JVM expression chain.

    Order is load-bearing: comments and ``<script>``/``<style>``
    blocks go first (their bodies may contain bare ``<``/``>`` that
    would derail naive tag stripping), then all remaining tags, then
    entity decoding, then whitespace collapse.  Every step is plain
    RE2-compatible regex so a SQL oracle can replay it verbatim.
    """
    c = html if isinstance(html, F.Column) else F.col(html)
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for entity, ch in _ENTITIES:
        c = F.replace(c, F.lit(entity), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    """Add `out_col` with the extracted plain text of `html_col`."""
    return df.withColumn(out_col, html_text_column(html_col))


def extract_links(df: DataFrame, html_col: str = "html",
                  out_col: str = "links") -> DataFrame:
    """Add `out_col` = array of href targets (order of appearance)."""
    c = F.col(html_col)
    return df.withColumn(
        out_col,
        F.regexp_extract_all(c, F.lit(r'(?i)href="([^"]*)"'), F.lit(1)),
    )


# -- WARC parsing (Arrow mapInPandas) ---------------------------------------

WARC_RECORD_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("record_idx", LongType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("http_status", LongType()),
    StructField("content_type", StringType()),
    StructField("body", BinaryType()),
    StructField("body_len", LongType()),
])


def _split_warc_records(data: bytes):
    """Yield ``(fields, body)`` per WARC record.

    Header block is CRLF text up to a blank line; the body is exactly
    ``Content-Length`` bytes (never scanned for separators, so binary
    payloads are safe).  Trailing record separators (CRLFCRLF) are
    skipped.  A malformed header terminates the walk rather than
    guessing at resync — at ingest scale a truncated shard must
    surface as fewer records, not garbage ones.
    """
    pos, n = 0, len(data)
    while pos < n:
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        lines = data[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        fields = {}
        for line in lines[1:]:
            key, _, value = line.partition(":")
            fields[key.strip().lower()] = value.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            return
        body = data[head_end + 4:head_end + 4 + clen]
        if len(body) < clen:        # truncated shard
            return
        pos = head_end + 4 + clen
        yield fields, body


def _parse_http_response(payload: bytes):
    """(status, content_type, body) from an HTTP response payload."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, payload
    head = payload[:head_end].decode("utf-8", "replace")
    body = payload[head_end + 4:]
    lines = head.split("\r\n")
    status: Optional[int] = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[0].startswith("HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    content_type = None
    for line in lines[1:]:
        key, _, value = line.partition(":")
        if key.strip().lower() == "content-type":
            content_type = value.strip()
            break
    return status, content_type, body


def parse_warc(df: DataFrame, warc_col: str = "payload",
               id_col: str = "doc_id") -> DataFrame:
    """Explode WARC files into one row per record.

    ``response`` records additionally get the HTTP status line,
    Content-Type and the HTTP body (headers stripped); other record
    types (``warcinfo``, ``request``, ``metadata``…) carry their raw
    payload.  One Arrow stage, no shuffle: records of a shard stay in
    the shard's partition.
    """
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(warc_col).cast("binary").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("id", "record_idx", "warc_type",
                                   "target_uri", "http_status",
                                   "content_type", "body", "body_len")}
            for rid, payload in zip(batch["id"], batch["payload"]):
                if payload is None:
                    continue
                for idx, (fields, body) in enumerate(
                        _split_warc_records(bytes(payload))):
                    wtype = fields.get("warc-type", "unknown")
                    status = ctype = None
                    if wtype == "response":
                        status, ctype, body = _parse_http_response(body)
                    out["id"].append(rid)
                    out["record_idx"].append(idx)
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(fields.get("warc-target-uri"))
                    out["http_status"].append(status)
                    out["content_type"].append(ctype)
                    out["body"].append(body)
                    out["body_len"].append(len(body))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, WARC_RECORD_SCHEMA)


# -- TAR shard (WebDataset-style) ingestion ---------------------------------

TAR_MEMBER_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("member_idx", LongType()),
    StructField("name", StringType()),
    StructField("size", LongType()),
    StructField("payload", BinaryType()),
])


def parse_tar(df: DataFrame, tar_col: str = "payload",
              id_col: str = "doc_id") -> DataFrame:
    """Explode tar archives into one row per regular-file member.

    The WebDataset ingestion shape: training shards are plain ``.tar``
    files of grouped sample files (``sample000.jpg``,
    ``sample000.cls``, …) read as whole blobs (``binaryFile`` source —
    one row per shard), then exploded here.  Uses the stdlib
    ``tarfile`` reader (ustar/GNU/pax all accepted) in one Arrow
    ``mapInPandas`` stage — no shuffle, members stay in their shard's
    partition, parallelism == number of shards (the WebDataset
    contract: shards ARE the unit of work distribution).
    """
    import io
    import tarfile

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(tar_col).cast("binary").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("id", "member_idx", "name", "size",
                                   "payload")}
            for rid, blob in zip(batch["id"], batch["payload"]):
                if blob is None:
                    continue
                with tarfile.open(fileobj=io.BytesIO(bytes(blob)),
                                  mode="r:") as tf:
                    idx = 0
                    for member in tf:
                        if not member.isfile():
                            continue
                        fobj = tf.extractfile(member)
                        data = fobj.read() if fobj is not None else b""
                        out["id"].append(rid)
                        out["member_idx"].append(idx)
                        out["name"].append(member.name)
                        out["size"].append(member.size)
                        out["payload"].append(data)
                        idx += 1
            yield pd.DataFrame(out)

    return src.mapInPandas(run, TAR_MEMBER_SCHEMA)


def webdataset_samples(df: DataFrame, tar_col: str = "payload",
                       id_col: str = "doc_id") -> DataFrame:
    """Group tar members into WebDataset samples.

    Sample key = member name up to the first dot; every extension
    becomes an entry in a ``parts`` map (``{'jpg': bytes, 'cls':
    bytes}``).  Returns ``(id, key, parts)``.  The group-by is keyed by
    (shard, sample) — records of one sample sit adjacently in the
    shard, so AQE-coalesced partition-local aggregation applies.

    A malformed shard can repeat an extension within one sample (or
    hold dotless members, which all map to ext ``''``): the first
    member by tar order wins, matching the quarantine-don't-fail
    ingest stance of :func:`inflate_column` — Spark's default
    ``mapKeyDedupPolicy=EXCEPTION`` would otherwise kill the whole
    job on one bad shard.
    """
    members = parse_tar(df, tar_col, id_col)
    key = F.regexp_extract(F.col("name"), r"^([^.]*)", 1)
    ext = F.regexp_extract(F.col("name"), r"^[^.]*\.(.*)$", 1)
    return (
        members.select(
            F.col("id"), key.alias("key"), ext.alias("ext"),
            F.col("member_idx"), F.col("payload"))
        .groupBy("id", "key")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("ext"), F.col("member_idx"), F.col("payload"))))
            .alias("__m__"))
        .select(
            "id", "key",
            # keep the first member per ext: sorted by (ext,
            # member_idx), so a repeated ext is exactly a run — drop
            # every element whose predecessor shares its ext
            F.expr(
                "map_from_entries(transform("
                "  filter(__m__, (x, i) ->"
                "    i = 0 OR __m__[i - 1].ext != x.ext),"
                "  x -> struct(x.ext AS ext, x.payload AS payload)))"
            ).alias("parts"),
        )
    )


# -- compressed-shard ingestion ---------------------------------------------


def inflate_column(df: DataFrame, binary_col: str = "payload",
                   out_col: str = "inflated",
                   format: str = "auto") -> DataFrame:
    """Decompress a binary column with stdlib zlib.

    ``format='auto'`` accepts both zlib (RFC 1950) and gzip (RFC 1952)
    streams via header autodetect; ``'raw'`` is a bare deflate stream.
    Corrupt input yields NULL instead of failing the job — at ingest
    scale one bad shard must surface as a null row to quarantine, not
    kill a 100 TB pass.  One Arrow-vectorized scalar stage; composes
    with :func:`parse_warc` / :func:`parse_tar` for ``.warc.gz`` /
    ``.tar.gz`` shards (decompress first, then explode)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    wbits = -zlib.MAX_WBITS if format == "raw" else zlib.MAX_WBITS + 32

    @pandas_udf(BinaryType())
    def _inflate(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            try:
                return zlib.decompress(bytes(b), wbits)
            except zlib.error:
                return None
        return s.map(one)

    return df.withColumn(out_col, _inflate(F.col(binary_col)))


# -- JSON-lines ingestion ---------------------------------------------------


def parse_jsonl(df: DataFrame, jsonl_col: str = "payload",
                id_col: str = "doc_id",
                schema: str = None) -> DataFrame:
    """JSON-lines blobs → one row per record.

    Line split + ``from_json`` — all JVM-side (codegen'd JSON parser),
    narrow explode, no shuffle.  Line numbers are preserved, blank
    lines skipped, and a corrupt line yields a NULL ``rec`` struct
    with the raw ``line`` retained for quarantine (permissive-mode
    ingestion).  `schema` is a DDL string, e.g.
    ``"id long, lang string"``."""
    if schema is None:
        raise ValueError("parse_jsonl requires a DDL schema string")
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(jsonl_col).cast("string"), "\n"))
            .alias("line_no", "line"),
    ).filter(F.trim(F.col("line")) != "")
    return lines.select(
        F.col(id_col), F.col("line_no").cast("long").alias("line_no"),
        F.from_json(F.col("line"), schema).alias("rec"),
        F.col("line"),
    )


def pack_webdataset(df: DataFrame, shard_col: str,
                    key_col: str = "doc_id",
                    part_cols: dict = None) -> DataFrame:
    """The export side of WebDataset: pack rows into tar shard blobs.

    One output row per shard: ``(shard, payload, n_samples)`` where
    ``payload`` is a complete tar archive with one ``<key>.<ext>``
    member per configured part column (string parts are UTF-8
    encoded).  Samples are sorted by key and extensions
    alphabetically, so shard bytes are deterministic for a given
    shard assignment regardless of partitioning.

    Scale shape: one shuffle keyed by the shard id (choose the shard
    key so shards are O(100 MB) — e.g. ``id // samples_per_shard`` or
    a hash bucket), then each shard builds in a single Arrow group.
    Round-trips through :func:`parse_tar` /
    :func:`webdataset_samples`.
    """
    import io
    import tarfile

    if not part_cols:
        raise ValueError("pack_webdataset requires part_cols "
                         "{extension: column}")
    exts = sorted(part_cols)
    cols = [F.col(shard_col).cast("long").alias("__shard__"),
            F.col(key_col).cast("string").alias("__key__")]
    cols += [F.col(c).alias(f"__part_{e}__") for e, c in
             sorted(part_cols.items())]
    src = df.select(*cols)
    schema = StructType([
        StructField("shard", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_samples", LongType()),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__key__")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for _, row in pdf.iterrows():
                for ext in exts:
                    data = row[f"__part_{ext}__"]
                    if data is None:
                        continue
                    if isinstance(data, str):
                        data = data.encode("utf-8")
                    else:
                        data = bytes(data)
                    info = tarfile.TarInfo(f"{row['__key__']}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        return pd.DataFrame({
            "shard": [int(pdf["__shard__"].iloc[0])],
            "payload": [buf.getvalue()],
            "n_samples": [len(pdf)],
        })

    return src.groupBy("__shard__").applyInPandas(build, schema)


# -- link-graph ranking -----------------------------------------------------


def link_pagerank(edges: DataFrame, iterations: int = 3,
                  damping_permille: int = 850,
                  scale: int = 10 ** 12,
                  src_col: str = "src",
                  dst_col: str = "dst") -> DataFrame:
    """Fixed-point integer PageRank over an edge list — the link-
    quality signal of web curation (crawl prioritization / quality
    weighting a la Common Crawl's rank exports).

    All arithmetic is INTEGER (ranks in ``1/scale`` units, damping in
    permille, remainders truncated): a floating-point PageRank's sums
    depend on partition merge order, so no two runs are bit-identical
    — this one is, at any parallelism, and an ANSI-SQL oracle can
    replay it exactly.  Fixed `iterations` (no convergence test: a
    data-dependent stopping rule is another nondeterminism source).
    Simple variant: dangling mass is not redistributed.

    Per iteration: one join of ranks to edges (rank key) and one
    map-side-combinable sum keyed by destination.  The plan is
    truncated per round with ``localCheckpoint`` — the standard guard
    against lineage blowup in iterative DataFrame algorithms.
    Returns ``(node, rank_units)``.
    """
    # rank_units * damping_permille must stay within long for the
    # integral division below (ANSI mode would throw on overflow,
    # silently-wrong results are not possible — but fail early anyway)
    if scale <= 0 or scale > (2 ** 62) // 1000:
        raise ValueError(
            f"scale must be in (0, 2^62/1000], got {scale}")
    src, dst = F.col(src_col), F.col(dst_col)
    # materialize the edge list ONCE: nodes (2 reads), degrees and
    # every iteration's join otherwise re-run the caller's whole
    # edge-producing pipeline — ~6 evaluations at 3 iterations, and
    # textrank's symmetric union doubled each of them (r15, §2.4)
    ed = (edges.select(src.alias("__src__"), dst.alias("__dst__"))
          .localCheckpoint(eager=True))
    nodes = (ed.select(F.col("__src__").alias("node"))
             .union(ed.select(F.col("__dst__").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_units", F.lit(0).cast("long"))
    deg = ed.groupBy(F.col("__src__").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg__"))
    base = (scale * (1000 - damping_permille) // 1000) // n
    ranks = nodes.withColumn(
        "rank_units", F.lit(scale // n).cast("long"))
    for _ in range(iterations):
        contribs = (
            ed.join(ranks.withColumnRenamed("node", "__src__"),
                    "__src__")
            .join(deg.withColumnRenamed("node", "__src__"), "__src__")
            .select(
                F.col("__dst__").alias("node"),
                # `div` is integral division on longs: no double in
                # the loop, so bit-exactness holds for ANY valid scale
                # (a floor(double-division) breaks above 2^53)
                F.expr(
                    f"(rank_units * {int(damping_permille)}) div "
                    f"(1000L * __deg__)")
                .cast("long").alias("__c__"),
            )
        )
        summed = contribs.groupBy("node").agg(
            F.sum("__c__").alias("__in__"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(base)
                 + F.coalesce(F.col("__in__"), F.lit(0)))
                .cast("long").alias("rank_units"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def label_propagation(edges: DataFrame, rounds: int = 3,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """Synchronous label-propagation community detection over an
    undirected edge list (Raghavan et al. 2007) — the cheap graph
    clustering of web curation (site/mirror grouping, link-farm
    discovery), complementing :func:`link_pagerank`.

    Deterministic by construction: every node starts labeled with its
    own id; each synchronous round every node adopts the MOST FREQUENT
    label among its neighbors, ties broken by the smallest label, for
    a FIXED number of rounds (asynchronous/randomized variants are not
    reproducible across runs — useless for a verified pipeline).
    Nodes without surviving neighbors keep their label.

    Per round: one join of labels to the undirected edges and one
    (node, label) count — both keyed shuffles; ``localCheckpoint``
    truncates lineage like the other iterative operators.  Returns
    ``(node, label)``; equal labels after the fixed rounds = same
    community.
    """
    # directed list checkpointed before the symmetric union — the
    # union's two branches otherwise re-run the caller's edge
    # pipeline twice (see kcore_subgraph)
    directed = edges.select(F.col(src_col).alias("__s__"),
                            F.col(dst_col).alias("__d__")) \
        .localCheckpoint(eager=True)
    und = directed \
        .unionByName(directed.select(F.col("__d__").alias("__s__"),
                                     F.col("__s__").alias("__d__"))) \
        .distinct().localCheckpoint(eager=True)
    nodes = und.select(F.col("__s__").alias("node")).distinct() \
        .localCheckpoint(eager=True)
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(rounds):
        nbr = und.join(labels.withColumnRenamed("node", "__d__"),
                       "__d__")
        counts = nbr.groupBy(F.col("__s__").alias("node"), "label") \
            .agg(F.count(F.lit(1)).alias("__c__"))
        best = counts.groupBy("node").agg(
            F.min(F.struct((-F.col("__c__")).alias("negc"),
                           F.col("label").alias("l"))).alias("__b__"))
        labels = nodes.join(
            best.select("node", F.col("__b__.l").alias("__new__")),
            "node", "left",
        ).select(
            "node",
            F.coalesce(F.col("__new__"), F.col("node")).alias("label"),
        ).localCheckpoint(eager=True)
    return labels


def triangle_counts(edges: DataFrame, src: str = "id_a",
                    dst: str = "id_b") -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (community density, link-farm detection) the
    pairwise dedup/similarity graphs feed into.

    Uses the standard DEGREE-ORIENTED algorithm (node-iterator++ /
    compact-forward): orient every undirected edge from its
    lower-degree endpoint to its higher-degree endpoint (ties by id),
    join out-edge pairs only at their common LOW-degree source, and
    close each wedge against the oriented edge list.  Wedge count is
    Σ out-degree² where out-degree is bounded by ~sqrt(|E|) for ANY
    graph under this orientation — a hub with a million neighbours
    generates no wedges at all (its edges all point INTO it), which
    is what makes the plain self-join formulation (Σ degree²,
    quadratic on hubs) survivable at scale.  Three equi-joins, all on
    node keys; each triangle is counted exactly once because the
    orientation is acyclic.

    Returns ``(node, n_triangles)`` for every node in at least one
    triangle.
    """
    # checkpoint the normalized edge list: it is read five times
    # (degree count twice, both orientation joins, wedge closing) —
    # localCheckpoint truncates the caller's edge-producing lineage
    # so each read hits the materialized edges instead of re-planning
    # (and re-executing) the upstream pipeline; same pattern as
    # connected_components / label_propagation
    e = edges.select(F.col(src).alias("a"),
                     F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b")) \
        .select(F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b")) \
        .distinct().localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    # orient low-degree -> high-degree (ties by id); acyclic
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = (
        e.join(da, "a").join(db, "b")
        .select(F.when(lt, F.col("a")).otherwise(F.col("b"))
                .alias("u"),
                F.when(lt, F.col("b")).otherwise(F.col("a"))
                .alias("v"))
    ).localCheckpoint(eager=True)
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = (
        w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    )
    # close the wedge: (x, y) must be an oriented edge either way
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select(
        F.col("u").alias("n1"), F.col("x").alias("n2"),
        F.col("y").alias("n3"))
    per_node = (
        tri.select(F.explode(F.array("n1", "n2", "n3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return per_node


def jaccard_link_prediction(edges: DataFrame, src: str = "id_a",
                            dst: str = "id_b",
                            min_common: int = 1,
                            max_wedge_degree: Optional[int] = None
                            ) -> DataFrame:
    """Common-neighbor link prediction over an undirected graph:
    for every NON-adjacent node pair sharing at least ``min_common``
    neighbours, the Jaccard similarity of their neighbour sets —
    ``(node_a, node_b, n_common, n_union, jaccard_bp)`` — the
    classic "who should be connected" score (Liben-Nowell & Kleinberg
    2003) over the co-occurrence / dedup-cluster graphs this module
    builds.

    Scale shape: candidate pairs come from ONE wedge self-join at the
    shared neighbour, so only pairs with ≥1 common neighbour are ever
    materialized (never |V|²).  A hub of degree d contributes d²
    wedges; ``max_wedge_degree`` drops hub CENTERS above the cap
    before the join (standard practice — a node adjacent to everyone
    predicts nothing), bounding wedge work at |V|·cap².  Degrees and
    the adjacency anti-join are plain shuffles on node keys.  Integer
    basis-point scores — SQL-oracle exact.
    """
    e = edges.select(F.col(src).alias("a"),
                     F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b")) \
        .select(F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b")) \
        .distinct().localCheckpoint(eager=True)
    # symmetric adjacency: (center w, endpoint n)
    adj = e.select(F.col("a").alias("w"), F.col("b").alias("n")) \
        .unionAll(e.select(F.col("b").alias("w"),
                           F.col("a").alias("n")))
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    centers = adj
    if max_wedge_degree is not None:
        wdeg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("wd"))
        centers = adj.join(
            wdeg.filter(F.col("wd") <= max_wedge_degree).select("w"),
            "w")
    p1 = centers.select("w", F.col("n").alias("na"))
    p2 = centers.select("w", F.col("n").alias("nb"))
    common = (
        p1.join(p2, "w").filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    # drop already-adjacent pairs (prediction = absent links only)
    candidates = common.join(
        e.select(F.col("a").alias("na"), F.col("b").alias("nb")),
        ["na", "nb"], "left_anti")
    da = deg.select(F.col("n").alias("na"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("nb"), F.col("d").alias("db"))
    out = (
        candidates.join(da, "na").join(db, "nb")
        .select(
            F.col("na").alias("node_a"), F.col("nb").alias("node_b"),
            "n_common",
            (F.col("da") + F.col("db") - F.col("n_common"))
            .cast("long").alias("n_union"))
    )
    return out.withColumn(
        "jaccard_bp",
        F.expr("(10000 * n_common) div n_union"))


def kcore_subgraph(edges: DataFrame, k: int, rounds: int = 3,
                   src: str = "id_a", dst: str = "id_b",
                   until_converged: bool = False) -> DataFrame:
    """k-core peeling (Seidman 1983) over an undirected edge list —
    the density filter of graph curation: nodes that survive the
    k-core participate in a subgraph where EVERYONE keeps >= k
    neighbours (spam-farm cores, tightly-coupled mirror clusters,
    well-connected entity hubs).

    Synchronous rounds: each round recomputes degrees over the
    surviving induced subgraph and drops every node with degree < k
    AT ONCE.  The alive set shrinks monotonically, so with
    ``until_converged`` the loop reaches the true k-core and stops
    (one extra count per round); with fixed ``rounds`` the state
    after exactly R synchronous peels is deterministic and
    SQL-unrollable — the verification strategy shared with
    label_propagation (production converges, the oracle pins R).

    Per round: one degree aggregation plus one double semi-join of
    the edge list against the surviving node set — all keyed
    shuffles; ``localCheckpoint`` truncates lineage each round.
    Returns ``(node, degree)`` over the FINAL surviving edge set
    (nodes whose every neighbour was peeled disappear with their
    edges).
    """
    # materialize the DIRECTED list first: the symmetric union reads
    # its input twice, and un-checkpointed that re-ran the caller's
    # whole edge-producing pipeline (basket_pairs: two ~12 s stages
    # for one) once per branch (r15 opt round, §2.4 — remove repeated
    # work before tuning it)
    und = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .filter(F.col("s") != F.col("d"))
           .localCheckpoint(eager=True))
    und = (und.unionByName(und.select(F.col("d").alias("s"),
                                      F.col("s").alias("d")))
           .distinct().localCheckpoint(eager=True))
    cur = und
    prev_edges = None
    r = 0
    while True:
        r += 1
        deg = cur.groupBy("s").agg(F.count(F.lit(1)).alias("__deg__"))
        keep = deg.filter(F.col("__deg__") >= k).select("s")
        cur = (cur.join(keep, "s")
               .join(keep.withColumnRenamed("s", "d"), "d")
               .select("s", "d").localCheckpoint(eager=True))
        if until_converged:
            n_edges = cur.count()
            if n_edges == prev_edges:
                break
            prev_edges = n_edges
        elif r >= rounds:
            break
    return (cur.groupBy(F.col("s").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("degree")))


def hits_scores(edges: DataFrame, iterations: int = 2,
                scale: int = 10 ** 12,
                src_col: str = "src",
                dst_col: str = "dst") -> DataFrame:
    """Fixed-point integer HITS (Kleinberg 1999) over a directed edge
    list: authorities are pointed at by good hubs, hubs point at good
    authorities.  Like :func:`link_pagerank`, every step is INTEGER —
    scores live in ``1/scale`` units and each half-iteration
    renormalizes by SUM (share-of-total) instead of the classical L2
    norm, because a square root cannot be replayed exactly by integer
    arithmetic; the ranking order is unaffected (both norms are
    monotone rescalings of the same vector).  Fixed ``iterations``,
    deterministic at any parallelism, ANSI-SQL-oracle replayable.

    Per half-iteration: one join of scores to edges and one
    map-side-combinable sum on the opposite endpoint; plans are
    truncated per round with ``localCheckpoint`` against lineage
    blowup.  Normalization totals are single-row aggregates crossed
    back in (decimal(38,0) products — no long overflow for any
    ``scale <= 10^12`` and node counts into the billions).
    Returns ``(node, auth_units, hub_units)``.
    """
    if scale <= 0 or scale > 10 ** 12:
        raise ValueError(f"scale must be in (0, 10^12], got {scale}")
    src, dst = F.col(src_col), F.col(dst_col)
    # nodes derive from the checkpointed edge frame so the caller's
    # edge pipeline runs once, not three times (r15, §2.4)
    ed = (edges.select(src.alias("__src__"), dst.alias("__dst__"))
          .localCheckpoint(eager=False))
    nodes = (ed.select(F.col("__src__").alias("node"))
             .union(ed.select(F.col("__dst__").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    dec = "decimal(38,0)"

    def normalized(raw: DataFrame, col: str) -> DataFrame:
        """scale * v div total, via a broadcast single-row total."""
        tot = raw.agg(F.sum(col).cast(dec).alias("__tot__"))
        return (raw.crossJoin(F.broadcast(tot))
                .select("node", F.expr(
                    f"CAST(CASE WHEN __tot__ = 0 THEN 0 ELSE "
                    f"(CAST({col} AS {dec}) * {scale}) div __tot__ "
                    f"END AS BIGINT)").alias(col)))

    hubs = nodes.withColumn("hub_units", F.lit(scale).cast("long"))
    auths = nodes.withColumn("auth_units", F.lit(scale).cast("long"))
    for _ in range(iterations):
        raw_a = (ed.join(hubs.withColumnRenamed("node", "__src__"),
                         "__src__")
                 .groupBy(F.col("__dst__").alias("node"))
                 .agg(F.sum("hub_units").alias("auth_units")))
        raw_a = (nodes.join(raw_a, "node", "left")
                 .select("node", F.coalesce("auth_units", F.lit(0))
                         .cast("long").alias("auth_units")))
        auths = normalized(raw_a, "auth_units") \
            .localCheckpoint(eager=False)
        raw_h = (ed.join(auths.withColumnRenamed("node", "__dst__"),
                         "__dst__")
                 .groupBy(F.col("__src__").alias("node"))
                 .agg(F.sum("auth_units").alias("hub_units")))
        raw_h = (nodes.join(raw_h, "node", "left")
                 .select("node", F.coalesce("hub_units", F.lit(0))
                         .cast("long").alias("hub_units")))
        hubs = normalized(raw_h, "hub_units") \
            .localCheckpoint(eager=False)
    return auths.join(hubs, "node")


def ra_link_prediction(edges: DataFrame, src: str = "id_a",
                       dst: str = "id_b",
                       min_common: int = 1,
                       max_wedge_degree: Optional[int] = None
                       ) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lü & Zhang 2009)
    — the rational-arithmetic sibling of Adamic–Adar: a non-adjacent
    pair scores the sum over common neighbours z of 1/deg(z), here
    as Σ 10^6 div deg(z) in exact integer ppm (Adamic–Adar's
    1/log deg is irrational, RA's 1/deg replays in SQL bit-for-bit
    and empirically predicts better on dense co-occurrence graphs).
    Low-degree shared neighbours carry the signal; hubs contribute
    ≈ nothing — exactly the weighting a co-purchase or co-citation
    graph wants.

    Same wedge shape as :func:`jaccard_link_prediction`: candidates
    come from ONE self-join at the shared neighbour (never |V|²),
    each wedge carries its center's degree so the score is a plain
    integer sum in the pair aggregation, and ``max_wedge_degree``
    bounds hub centers at |V|·cap² wedges (a dropped hub center of
    degree d would have added ≤ 10^6/d per pair — the term RA
    already discounts to noise).

    Returns ``(node_a, node_b, n_common, ra_ppm)`` for non-adjacent
    pairs with at least ``min_common`` common neighbours.
    """
    e = edges.select(F.col(src).alias("a"),
                     F.col(dst).alias("b")) \
        .filter(F.col("a") != F.col("b")) \
        .select(F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b")) \
        .distinct().localCheckpoint(eager=True)
    adj = e.select(F.col("a").alias("w"), F.col("b").alias("n")) \
        .unionAll(e.select(F.col("b").alias("w"),
                           F.col("a").alias("n")))
    wdeg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("wd"))
    centers = adj.join(wdeg, "w")
    if max_wedge_degree is not None:
        centers = centers.filter(F.col("wd") <= max_wedge_degree)
    p1 = centers.select("w", "wd", F.col("n").alias("na"))
    p2 = centers.select(F.col("w").alias("w2"),
                        F.col("n").alias("nb"))
    pairs = (
        p1.join(p2, F.col("w") == F.col("w2"))
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"),
             F.sum(F.expr("1000000 div wd")).cast("long")
             .alias("ra_ppm"))
        .filter(F.col("n_common") >= min_common)
    )
    out = pairs.join(
        e.select(F.col("a").alias("na"), F.col("b").alias("nb")),
        ["na", "nb"], "left_anti")
    return out.select(F.col("na").alias("node_a"),
                      F.col("nb").alias("node_b"),
                      "n_common", "ra_ppm")


def degree_assortativity(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b") -> DataFrame:
    """Degree assortativity of an undirected graph (Newman 2002):
    the Pearson correlation of endpoint degrees over the directed
    edge list (each undirected edge counted both ways, so Σx = Σy
    and Σx² = Σy² by symmetry and

        r_ppm = sign · (M·Σxy − (Σx)²)·10⁶ fdiv (M·Σx² − (Σx)²)

    with every moment an EXACT integer (degrees are counts) — the
    'do hubs link to hubs' diagnostic that separates social-style
    graphs (r > 0) from web/biology-style ones (r < 0).  The
    division keeps non-negative operands on both sides of the sign
    so Spark's truncation and DuckDB's floor agree.

    Scale shape: one degree aggregation, two hash equi-joins to
    attach endpoint degrees, one map-side-combinable moment reduce —
    the same cost envelope as a single pass over the edges.
    """
    dec = "decimal(38,0)"
    # the edge frame is referenced four times below (union both ways,
    # degree aggregation, the moment join) — persist it so an
    # expensive upstream (e.g. the basket-pairs self-join) computes
    # once, not per reference; the affinity edge list is bounded
    edges = edges.persist()
    und = (edges.select(F.col(src).alias("__u__"),
                        F.col(dst).alias("__v__"))
           .union(edges.select(F.col(dst).alias("__u__"),
                               F.col(src).alias("__v__"))))
    deg = und.groupBy("__u__").agg(
        F.count(F.lit(1)).cast("long").alias("__d__"))
    du = deg.select(F.col("__u__").alias("__su__"),
                    F.col("__d__").alias("__du__"))
    dv = deg.select(F.col("__u__").alias("__sv__"),
                    F.col("__d__").alias("__dv__"))
    ed = (und.join(du, F.col("__u__") == F.col("__su__"))
          .join(dv, F.col("__v__") == F.col("__sv__"))
          .select(F.col("__du__").cast(dec).alias("__x__"),
                  F.col("__dv__").cast(dec).alias("__y__")))
    m = ed.agg(F.count(F.lit(1)).cast(dec).alias("__m__"),
               F.sum("__x__").alias("__sx__"),
               F.sum(F.col("__x__") * F.col("__y__")).alias("__sxy__"),
               F.sum(F.col("__x__") * F.col("__x__")).alias("__sxx__"))
    fd = (lambda a, b:
          f"CAST(((({a}) - (({a}) % ({b}))) / ({b})) AS {dec})")
    num_pos = fd("(__m__*__sxy__ - __sx__*__sx__)*1000000",
                 "__m__*__sxx__ - __sx__*__sx__")
    num_neg = fd("(__sx__*__sx__ - __m__*__sxy__)*1000000",
                 "__m__*__sxx__ - __sx__*__sx__")
    r = F.expr(
        "CAST(CASE WHEN __m__*__sxx__ - __sx__*__sx__ > 0 THEN"
        " CASE WHEN __m__*__sxy__ - __sx__*__sx__ >= 0"
        f" THEN {num_pos} ELSE -{num_neg} END"
        " END AS BIGINT)")
    return m.select(
        F.expr("CAST(__m__ AS BIGINT)").alias("m_directed"),
        r.alias("r_ppm"))


#: query parameters that never change content identity (tracking)
TRACKING_PARAMS = ("utm_", "gclid", "fbclid", "msclkid", "ref")


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url") -> DataFrame:
    """URL canonicalization for web-crawl curation: the dedup key a
    100 TB crawl groups on BEFORE any content hashing (the same page
    is fetched under case-variant hosts, default ports, tracking
    params and fragments — exact content dedup alone re-crawls and
    re-stores every variant).

    Rules (each SQL-replayable): lowercase scheme and host, strip the
    fragment, drop default ports (``:80`` http / ``:443`` https),
    remove tracking query parameters (:data:`TRACKING_PARAMS` —
    ``utm_*``/``gclid``/``fbclid``/``msclkid``/``ref``) while
    preserving the order of the rest, drop an empty ``?``, and
    collapse a bare root path ``/``.  Non-URL rows (no ``://``)
    canonicalize to NULL for quarantine.

    Adds ``out_col``, ``host`` and ``n_params_kept``.  Scale shape:
    one narrow JVM regexp/array projection — no shuffle, no Python;
    the usual consumer is a groupBy on ``out_col`` immediately after.
    """
    u = F.trim(F.col(url_col))
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    host = (F.when(scheme == "http",
                   F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    rest = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    path = F.substring_index(rest, "?", 1)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    raw_query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.when(raw_query == "", F.array().cast("array<string>")) \
        .otherwise(F.split(raw_query, "&"))

    def _tracked(p):
        cond = F.lit(False)
        for t in TRACKING_PARAMS:
            if t.endswith("_"):
                cond = cond | p.startswith(t)
            else:
                cond = cond | p.startswith(t + "=") | (p == t)
        return cond

    kept = F.filter(params, lambda p: ~_tracked(p))
    q = F.array_join(kept, "&")
    canon = F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), q))))
    return (df.withColumn(out_col, canon)
            .withColumn("host", F.when(scheme == "",
                                       F.lit(None).cast("string"))
                        .otherwise(host))
            .withColumn("n_params_kept", F.size(kept).cast("long")))
