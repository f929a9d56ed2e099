"""tools/record_baselines.py: machine-readable baseline provenance and
the lucky-baseline guards (ADVICE r13 + VERDICT r13 #3)."""

import json
import sys

import pytest

from tools import record_baselines as rb


def _write(path, doc):
    path.write_text(json.dumps(doc))
    return str(path)


@pytest.fixture()
def baseline(tmp_path):
    path = tmp_path / "bench_baseline.json"
    _write(path, {
        "sf": 0.1,
        "queries": {"emb_mmr": 1.0, "emb_mmr_ann": 2.0,
                    "old_entry": 0.5},
        "components": {"combo": ["emb_mmr", "emb_mmr_ann"]},
    })
    return path


def _run(tmp_path, baseline, logs, queries, extra=()):
    argv = ["record_baselines.py", *extra,
            "--baseline", str(baseline), *logs, "--", *queries]
    old = sys.argv
    sys.argv = argv
    try:
        return rb.main()
    finally:
        sys.argv = old


def _full(tmp_path, name, queries):
    return _write(tmp_path / name, {
        "metric": "total_query_sec", "queries": queries})


def test_records_min_with_provenance(tmp_path, baseline):
    logs = [_full(tmp_path, "a.json", {"new_q": 1.4}),
            _full(tmp_path, "b.json", {"new_q": 1.2})]
    assert _run(tmp_path, baseline, logs, ["new_q"],
                extra=["--tag", "r14"]) == 0
    doc = json.loads(baseline.read_text())
    assert doc["queries"]["new_q"] == 1.2
    prov = doc["provenance"]["new_q"]
    assert prov["min_of"] == 2
    assert prov["logs"] == ["a.json", "b.json"]
    assert prov["tag"] == "r14"


def test_none_timings_filtered(tmp_path, baseline):
    # a failed query lands as null in BENCH_FULL.json — it must not
    # reach min() (TypeError) nor become a baseline
    logs = [_full(tmp_path, "a.json", {"new_q": None}),
            _full(tmp_path, "b.json", {"new_q": 3.0})]
    assert _run(tmp_path, baseline, logs, ["new_q"]) == 0
    assert json.loads(baseline.read_text())["queries"]["new_q"] == 3.0


def test_all_none_skips(tmp_path, baseline):
    logs = [_full(tmp_path, "a.json", {"new_q": None})]
    assert _run(tmp_path, baseline, logs, ["new_q"]) == 0
    assert "new_q" not in json.loads(baseline.read_text())["queries"]


def test_compact_stdout_line_refused(tmp_path, baseline):
    # the bench stdout line carries only the HEADLINE subset — using it
    # as a min-of-N population silently skews baselines
    compact = _write(tmp_path / "line.json", {
        "metric": "total_query_sec",
        "queries": {"new_q": 1.0},
        "queries_n": 321, "full": "BENCH_FULL.json"})
    assert _run(tmp_path, baseline, [compact], ["new_q"]) == 1
    assert "new_q" not in json.loads(baseline.read_text())["queries"]


def test_full_dict_with_pointer_accepted(tmp_path, baseline):
    # BENCH_FULL.json itself may carry queries_n == len(queries)
    doc = {"metric": "x", "queries": {"new_q": 2.0, "other": 1.0},
           "queries_n": 2, "full": "BENCH_FULL.json"}
    log = _write(tmp_path / "full.json", doc)
    assert _run(tmp_path, baseline, [log], ["new_q"]) == 0
    assert json.loads(baseline.read_text())["queries"]["new_q"] == 2.0


def test_update_requires_reason(tmp_path, baseline):
    logs = [_full(tmp_path, "a.json", {"old_entry": 0.8})]
    assert _run(tmp_path, baseline, logs, ["old_entry"],
                extra=["--update"]) == 1
    assert json.loads(baseline.read_text())["queries"]["old_entry"] == 0.5
    assert _run(tmp_path, baseline, logs, ["old_entry"],
                extra=["--update", "--reason", "plan change"]) == 0
    doc = json.loads(baseline.read_text())
    assert doc["queries"]["old_entry"] == 0.8
    assert doc["provenance"]["old_entry"]["was"] == 0.5
    assert doc["provenance"]["old_entry"]["reason"] == "plan change"


def test_existing_kept_without_update(tmp_path, baseline):
    logs = [_full(tmp_path, "a.json", {"old_entry": 0.9})]
    assert _run(tmp_path, baseline, logs, ["old_entry"]) == 0
    assert json.loads(baseline.read_text())["queries"]["old_entry"] == 0.5


def test_component_sum_guard_refuses_lucky_value(tmp_path, baseline):
    # combo declares components summing to 3.0 — recording 2.0 is the
    # exact lucky-baseline shape that burned r12/r13
    logs = [_full(tmp_path, "a.json", {"combo": 2.0})]
    assert _run(tmp_path, baseline, logs, ["combo"]) == 1
    assert "combo" not in json.loads(baseline.read_text())["queries"]
    # an honest value above the component floor records fine
    logs = [_full(tmp_path, "b.json", {"combo": 3.4})]
    assert _run(tmp_path, baseline, logs, ["combo"]) == 0
    assert json.loads(baseline.read_text())["queries"]["combo"] == 3.4


def test_repo_baseline_declares_mmr_recall_components():
    with open(rb.ROOT + "/bench_baseline.json", encoding="utf-8") as f:
        doc = json.load(f)
    assert doc["components"]["emb_mmr_ann_recall"] == [
        "emb_mmr", "emb_mmr_ann"]
    # and the committed values respect the guard they now enforce
    floor = sum(doc["queries"][c]
                for c in doc["components"]["emb_mmr_ann_recall"])
    assert doc["queries"]["emb_mmr_ann_recall"] >= floor
