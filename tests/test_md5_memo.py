"""The per-task md5 memos added to the Arrow text kernels (r15) must
be pure caches: memoized and memo-less paths return identical values,
and the admission cap bounds the dict without ever changing results
(a full memo keeps computing, it just stops inserting)."""

import pytest

from cubes_spark.llm import dedup as dd
from cubes_spark.llm import quality as ql

TEXTS = [
    None,
    "",
    "   ",
    "a",
    "hello world hello world",
    "the quick brown fox jumps over the lazy dog the quick",
    "x y z " * 40,
    "repeat repeat repeat unique1 unique2 repeat",
    "tab\tsep and\nnewline  double  space",
]


def test_shingle_hashes_memo_identical():
    memo = {}
    for t in TEXTS:
        assert dd._shingle_hashes_py(t, 5, memo) == \
            dd._shingle_hashes_py(t, 5)
    # second pass over the warm memo must still agree
    for t in TEXTS:
        assert dd._shingle_hashes_py(t, 5, memo) == \
            dd._shingle_hashes_py(t, 5)
    assert len(memo) <= dd._MD5_MEMO_CAP


def test_dsir_buckets_memo_identical():
    memo = {}
    for t in TEXTS:
        assert ql._dsir_buckets_py(t, 256, 2, "dsir", memo) == \
            ql._dsir_buckets_py(t, 256, 2, "dsir")
    for t in TEXTS:
        assert ql._dsir_buckets_py(t, 256, 2, "dsir", memo) == \
            ql._dsir_buckets_py(t, 256, 2, "dsir")


def test_memo_admission_cap_preserves_values(monkeypatch):
    # with a cap of 2 the memo stops admitting after two entries but
    # every hash still computes correctly
    monkeypatch.setattr(dd, "_MD5_MEMO_CAP", 2)
    memo = {}
    want = [dd._shingle_hashes_py(t, 5) for t in TEXTS]
    got = [dd._shingle_hashes_py(t, 5, memo) for t in TEXTS]
    assert got == want
    assert len(memo) <= 2
    # dsir reads the cap from the dedup module at call time
    memo2 = {}
    want2 = [ql._dsir_buckets_py(t, 256, 2, "dsir") for t in TEXTS]
    got2 = [ql._dsir_buckets_py(t, 256, 2, "dsir", memo2)
            for t in TEXTS]
    assert got2 == want2
    assert len(memo2) <= 2


def test_memo_is_actually_used():
    calls = {"n": 0}
    import hashlib
    real = hashlib.md5

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    memo = {}
    t = "hello world hello world hello"
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(hashlib, "md5", counting)
        dd._shingle_hashes_py(t, 5, memo)
        first = calls["n"]
        dd._shingle_hashes_py(t, 5, memo)
        assert calls["n"] == first, "warm memo must not re-hash"
