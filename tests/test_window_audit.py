"""Bounded-unpartitioned-window audit (round 13; VERDICT r12 Next #4).

A ``Window.orderBy`` with no partition spec executes on ONE task — fine
over a provably bounded input (a top-C TakeOrderedAndProject survivor
set, a global aggregate's single row), fatal over anything corpus-sized
at 100 TB. Until now that discipline lived in per-operator headers and
individual plan tests; this audit converts it into an enforced
repo-wide invariant: it walks every registered query's physical plan
and asserts every ``WindowExec`` with an empty partition spec sits
above one of

- a TakeOrderedAndProject / limit (bounded by the literal constant),
- an ungrouped aggregate (exactly one row),
- a LocalTableScan (driver-built bounded rows),

or appears in the explicit allowlist below, where the bound is a
GROUPED aggregate whose key domain is constant by construction — the
audit still mechanically requires allowlisted plans to carry that
grouped aggregate below the window, so an entry cannot rot into
covering an arbitrary global sort.

The default suite audits every batch query; ``SPARK_GRAFT_WINDOW_AUDIT=1``
adds the st* streaming flows (their registered callables RUN the
micro-batch pipeline to produce the returned frame — minutes of commit
latency that tests/test_oracle_parity.py already pays every round; the
returned surface is audited the same way when the flag is set).
"""

from __future__ import annotations

import os

import pytest

from iot_big_data_engineering_spark.registry import all_queries

from .conftest import SF_SMOKE

# Queries whose unpartitioned window is bounded by a grouped aggregate
# with a constant-domain key (not expressible as a limit node):
_GROUP_BOUNDED = {
    # one row per training source in the mix plan — |sources| is a
    # handful by schema construction
    "dp3_training_mix": "per-source mix aggregate (|distinct source|)",
    # running vocabulary sum over checkpoint buckets — the checkpoint
    # grid is a fixed constant of the query
    "t13_vocab_growth": "per-checkpoint aggregate (fixed checkpoint grid)",
    # ANN certificate frame: one flag row per query id (N_QUERIES = 5)
    "s2_knn_ivf": "per-query certificate flags (N_QUERIES)",
    "s3_knn_lsh": "per-query certificate flags (N_QUERIES)",
    "d9_semantic_dedup": "per-query certificate flags (N_QUERIES)",
}

_BOUNDING = {
    "TakeOrderedAndProjectExec",
    "CollectLimitExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "LocalTableScanExec",
}


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.length()):
        yield from _walk(ch.apply(i))


def _subtree_bounds(window_node):
    """(has mechanical bound, has grouped aggregate) below the window."""
    mech = False
    grouped = False
    ch = window_node.children()
    for i in range(ch.length()):
        for d in _walk(ch.apply(i)):
            cls = d.getClass().getSimpleName()
            if cls in _BOUNDING:
                mech = True
            elif cls.endswith("AggregateExec"):
                try:
                    if d.groupingExpressions().isEmpty():
                        mech = True  # global aggregate: exactly one row
                    else:
                        grouped = True
                except Exception:  # non-BaseAggregate node shape
                    grouped = True
    return mech, grouped


def _audit(name: str, df) -> list[str]:
    plan = df._jdf.queryExecution().sparkPlan()
    problems = []
    saw_allowlisted_shape = False
    for n in _walk(plan):
        if n.getClass().getSimpleName() != "WindowExec":
            continue
        if not n.partitionSpec().isEmpty():
            continue
        mech, grouped = _subtree_bounds(n)
        if mech:
            continue
        if name in _GROUP_BOUNDED and grouped:
            saw_allowlisted_shape = True
            continue
        problems.append(
            f"{name}: unpartitioned WindowExec with no bounding node "
            f"below it: {n.toString().splitlines()[0][:160]}"
        )
    if name in _GROUP_BOUNDED and not saw_allowlisted_shape and not problems:
        # the allowlist entry no longer matches the plan — either the
        # window gained a mechanical bound (drop the entry) or the plan
        # changed shape (re-review the bound)
        problems.append(
            f"{name}: allowlisted as group-bounded "
            f"({_GROUP_BOUNDED[name]}) but the plan no longer shows an "
            "unpartitioned window over a grouped aggregate — stale entry"
        )
    return problems


_ALL = all_queries()
_NAMES = [
    n
    for n in _ALL
    if os.environ.get("SPARK_GRAFT_WINDOW_AUDIT") or not n.startswith("st")
]


@pytest.mark.parametrize("name", _NAMES)
def test_unpartitioned_windows_are_bounded(spark, name):
    spark.catalog.clearCache()
    problems = _audit(name, _ALL[name].fn(spark, SF_SMOKE))
    assert not problems, "\n".join(problems)
