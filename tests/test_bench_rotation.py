"""bench.py field-rotation bookkeeping (host-only; no device work).

The rotation starved the same tail fields across three separate rounds
(VERDICT r3 #2 and two round-4 regressions), each time through a
bookkeeping hole rather than a measurement problem — so the bookkeeping
itself is pinned here: the least-recently-captured ordering, the
fresh-checkout fallback to committed ``BENCH_r*.json`` artifacts, and the
good-field filter that decides what may overwrite a snapshot.
"""

import importlib.util
import json
import os
import sys

import pytest


@pytest.fixture(scope="module")
def bench(tmp_path_factory):
    # import bench.py in-place: module-level code only wires the compile
    # cache and imports (no device contact; tests run CPU-pinned)
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_good_field_filters_guard_defaults(bench):
    assert bench._good_field("decode_bs256_utt_per_sec", 3400.0)
    assert not bench._good_field("decode_bs256_utt_per_sec", 0.0)
    assert not bench._good_field("x", float("inf"))
    assert not bench._good_field("metric", "name")
    assert not bench._good_field("last_good", {"a": 1})
    assert not bench._good_field("flag", True)  # bools are not readings
    assert bench._good_field("gates", {"beam": {}})
    assert not bench._good_field("gates", {})


def test_recorded_at_prefers_snapshot(bench, tmp_path, monkeypatch):
    snap = tmp_path / "last_bench.json"
    snap.write_text(json.dumps({
        "fields": {"a": 1.0},
        "recorded_at": {"a": "2026-01-01 00:00:00 UTC"},
    }))
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(snap))
    assert bench._last_recorded_at() == {"a": "2026-01-01 00:00:00 UTC"}


def test_recorded_at_falls_back_to_committed_artifacts(
    bench, tmp_path, monkeypatch
):
    """A fresh checkout has no .cache snapshot; ordering must come from
    the committed BENCH_r*.json artifacts (newest stamp wins per field),
    so fields the last rounds' budgets cut sort FIRST, not last."""
    monkeypatch.setattr(
        bench, "_LAST_GOOD_PATH", str(tmp_path / "missing.json")
    )
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    rec = bench._last_recorded_at()
    arts = sorted(
        f for f in os.listdir(repo)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    if not arts:
        pytest.skip("no committed BENCH_r*.json artifacts")
    # a field present in the newest artifact gets the newest stamp
    with open(os.path.join(repo, arts[-1])) as f:
        newest = json.load(f)
    stamped = [
        k for k, v in newest.items() if bench._good_field(k, v)
    ]
    assert stamped, "newest artifact has no good fields?"
    for k in stamped:
        assert rec[k].endswith(arts[-1])
    # a never-recorded field sorts before every recorded one (empty
    # string is the sort key the rotation uses for missing entries)
    assert all(rec.get("never_recorded_field", "") < s for s in rec.values())


def test_rotation_sort_is_stable_on_ties(bench):
    """After a full-capture run every field ties on one timestamp; the
    static list order is the tie-break, so the BASELINE-named configs
    (seq2seq, streaming, train_mfu) must lead the serving extras."""
    order = [
        "specaugment_utt_per_sec",
        "fused_ngram_decode_utt_per_sec",
        "seq2seq_mer_step_per_sec",
        "streaming_rnnt_chunk_ms",
        "train_mfu",
    ]
    recorded = {k: "same-stamp" for k in order}
    pairs = [(k, None) for k in order]
    pairs.sort(key=lambda kv: recorded.get(kv[0], ""))
    assert [k for k, _ in pairs] == order  # stable sort keeps list order
