"""bench.py artifact plumbing: round inference and the delta baseline
must follow the immutable per-round detail files (VERDICT r5 'What's
wrong' #1 / ADVICE r5), never a mutable scratch file from an unknown
run."""

from __future__ import annotations

import json
import os

import bench


def test_current_round_is_newest_bench_file_plus_one(tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
    )
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    assert bench._current_round() is None  # no files, no env
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r05.json").write_text("{}")
    assert bench._current_round() == 6
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "9")
    assert bench._current_round() == 9


def test_prev_bench_prefers_immutable_detail_and_its_own_round_label(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
    )
    detail = {
        "round": 5,
        "sf": 0.1,
        "value": 60.0,
        "queries": {"q1": 1.5},
    }
    (tmp_path / "BENCH_DETAIL_r05.json").write_text(json.dumps(detail))
    # a scratch BENCH_DETAIL.json from some other run must NOT win
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"round": 99, "queries": {"q1": 9.9}})
    )
    n, data = bench._latest_prev_bench(6)
    assert n == 5
    assert data["queries"] == {"q1": 1.5}


def test_prev_bench_falls_back_to_driver_wrapped_bench_file(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
    )
    wrapped = {"parsed": {"sf": 0.1, "value": 50.0, "queries": {"q2": 2.0}}}
    (tmp_path / "BENCH_r05.json").write_text(json.dumps(wrapped))
    n, data = bench._latest_prev_bench(6)
    assert n == 5
    assert data["queries"] == {"q2": 2.0}
    # round 1 (or unknown) has no previous round
    assert bench._latest_prev_bench(1) == (None, None)
    assert bench._latest_prev_bench(None) == (None, None)
