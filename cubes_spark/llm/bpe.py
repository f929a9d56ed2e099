"""Learned byte-pair-encoding tokenization.

Real BPE, not just the pre-tokenizer heuristic: merges are *trained*
(greedy highest-count pair, Sennrich-style) driver-side on a bounded
deterministic sample — the FAISS-IVF training recipe already used for
centroids — and *applied* distributed with the GPT-2-style rank-greedy
encoder inside one Arrow ``mapInPandas`` stage.

Determinism end-to-end: the sample is id-sorted and bounded, pair ties
break lexicographically, and the merge list rides to the executors as
a plain broadcast list — so an oracle can retrain the identical merges
and re-encode every document with an independent (in-order, Sennrich)
applier; the two appliers are provably segmentation-equivalent for a
greedily-learned merge list and are cross-checked in tests.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cubes_spark.llm.text import BPE_PATTERN

__all__ = ["train_bpe", "train_bpe_from_texts", "bpe_encode",
           "encode_word_rank_greedy", "BPE_TOKENS_SCHEMA"]

_PRETOKEN_RE = re.compile(BPE_PATTERN)


def _word_freqs(texts) -> Counter:
    freqs: Counter = Counter()
    for text in texts:
        if text:
            freqs.update(_PRETOKEN_RE.findall(text))
    return freqs


def train_bpe(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", num_merges: int = 128,
              sample_size: int = 2048,
              min_pair_count: int = 2) -> List[Tuple[str, str]]:
    """Learn an ordered merge list from a bounded id-sorted sample.

    Classic greedy BPE: count adjacent symbol pairs across the
    pre-token vocabulary (weighted by frequency), merge the most
    frequent pair, repeat.  Ties break lexicographically so the merge
    list is deterministic.  Training is O(sample), driver-side; only
    application is distributed.
    """
    texts = [r[0] for r in
             df.orderBy(id_col).limit(sample_size)
             .select(text_col).collect()]
    return train_bpe_from_texts(texts, num_merges, min_pair_count)


def train_bpe_from_texts(texts, num_merges: int = 128,
                         min_pair_count: int = 2
                         ) -> List[Tuple[str, str]]:
    """The driver-side training loop on plain strings (exposed so an
    oracle can retrain the identical merge list from the identically
    ordered sample)."""
    freqs = _word_freqs(texts)
    words = {w: tuple(w) for w in freqs}
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for w, sym in words.items():
            n = freqs[w]
            for i in range(len(sym) - 1):
                pair_counts[sym[i], sym[i + 1]] += n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_words = {}
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == pair[0]
                        and sym[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def encode_word_rank_greedy(word: str, ranks: dict) -> List[str]:
    """GPT-2-style application: repeatedly merge the lowest-rank
    adjacent pair present.  Segmentation-equivalent to applying the
    merge list in training order (cross-checked in tests)."""
    sym = list(word)
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


BPE_TOKENS_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("tokens", ArrayType(StringType())),
])


def bpe_encode(df: DataFrame, merges: List[Tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Encode every document with a trained merge list: pre-tokenize
    (the same regex as :func:`bpe_token_count`), then rank-greedy
    merge per pre-token with a per-batch cache (real corpora repeat
    words heavily — the cache makes application ~O(distinct words)).
    One Arrow stage, no shuffle; the merge list travels in the task
    closure (kilobytes)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    src = df.select(F.col(id_col).cast("long").alias("id"),
                    F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def word_tokens(word: str) -> List[str]:
            got = cache.get(word)
            if got is None:
                got = encode_word_rank_greedy(word, ranks)
                cache[word] = got
            return got

        for batch in batches:
            ids, toks = [], []
            for rid, text in zip(batch["id"], batch["text"]):
                out: List[str] = []
                if text:
                    for word in _PRETOKEN_RE.findall(text):
                        out.extend(word_tokens(word))
                ids.append(rid)
                toks.append(out)
            yield pd.DataFrame({"id": ids, "tokens": toks})

    return src.mapInPandas(run, BPE_TOKENS_SCHEMA)
