"""The committed COVERAGE_r{N}_window.json for the upcoming round must
equal a fresh mechanical regeneration from the registry + correctness
files — a query registered after the artifact was written makes this
fail, forcing `python correctness_diff.py --write-coverage` to run again
(VERDICT r5 demand #5: the hand-generated r5 artifact silently went
stale at 145/146 registered)."""

from __future__ import annotations

import json
import os

import correctness_diff as cd

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_coverage_artifact_is_fresh():
    rounds = cd.load_rounds(HERE)
    assert rounds, "no CORRECTNESS files — nothing to check"
    n = max(rounds) + 1
    path = os.path.join(HERE, f"COVERAGE_r{n:02d}_window.json")
    assert os.path.exists(path), (
        f"{os.path.basename(path)} missing — run "
        "`python correctness_diff.py --write-coverage`"
    )
    with open(path) as f:
        committed = json.load(f)
    fresh = cd.coverage(HERE)
    assert committed == fresh, (
        "coverage artifact is stale (registry or correctness files "
        "changed since it was written) — regenerate with "
        "`python correctness_diff.py --write-coverage`"
    )


def test_coverage_registered_matches_registry():
    from iot_big_data_engineering_spark import registry

    fresh = cd.coverage(HERE)
    assert fresh["registered"] == len(registry.all_queries())
