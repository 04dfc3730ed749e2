"""Central query registry backing ``__spark_entry__.py``.

Every named capability of the engine registers here as a pair:
a Spark callable ``(spark, sf_dir) -> DataFrame`` and (when expressible)
an equivalent DuckDB ANSI-SQL oracle string. The driver's correctness gate
runs both sides at sf=0.01 and hash-compares.

Conventions (driver contract):
- alias every computed column identically on both sides;
- round floating aggregates (usually 6 dp; 2 dp for large sums) on BOTH
  sides so cross-engine double summation-order noise cannot flip the hash;
- no ``current_timestamp()`` / randomness in compared output;
- every ORDER BY ... LIMIT query carries a total-order tiebreak key.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def _rewrite_rounds(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in oracle SQL into the shared
    floor-based formula (functions/rounding.py): Spark's round() rounds the
    double's shortest decimal string while DuckDB rounds the binary value,
    so they disagree on boundary values like 0.5183125; floor(x·10ⁿ+0.5)/10ⁿ
    evaluated in double is bit-identical across engines. The Spark side
    uses functions.rounding.fround, the exact same arithmetic."""
    out = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        # skip matches inside identifiers (e.g. "around(") — require a
        # non-word char before
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = low.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth = 0
        k = j + len("round(")
        start = k
        last_comma = -1
        while True:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = k
            k += 1
        if last_comma == -1:
            # round(x) with no scale — leave untouched
            out.append(sql[j : k + 1])
        else:
            expr = sql[start:last_comma]
            n = int(sql[last_comma + 1 : k].strip())
            p = float(10**n)
            out.append(f"(floor(({expr}) * {p} + 0.5) / {p})")
        i = k + 1
    return "".join(out)


# avg(quality_score) over many rows is order-sensitive double summation
# (scores are binary-inexact multiples of 0.2); both sides aggregate the
# exact integer completeness count q_int instead and divide once.
_AVG_QUALITY_SQL = "avg(quality_score)"
_AVG_QUALITY_INT_SQL = "(CAST(sum(q_int) AS DOUBLE) / (5.0 * count(*)))"


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query callable under ``name``.

    The registered form releases caches tracked by PREVIOUS queries on
    entry (caching.release_caches): harnesses that run many queries in one
    session — the driver runs all ~110 — would otherwise accumulate every
    persist()ed intermediate (d4 signatures, ivf corpus) in executor
    storage memory with no release point. Releasing at next-query entry is
    safe because each harness materializes a query before building the
    next; a caller that interleaves construction merely loses the cache
    (recompute), never correctness. Direct imports of the undecorated
    functions (the test modules) are unaffected.
    """
    if oracle is not None:
        oracle = _rewrite_rounds(oracle.replace(_AVG_QUALITY_SQL, _AVG_QUALITY_INT_SQL))

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .caching import release_caches

            release_caches()
            return fn(spark, sf_dir)

        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in all_queries().values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}


_LOADED = False

# The driver's correctness gate checks the FIRST 50 registered queries per
# round; this list pins the queries that must be in the round-3 window —
# every query whose *current form* has no green driver row yet:
# - a5: compared type changed r3 (DECIMAL → rounded DOUBLE) after failing
#   the hash in r1 and r2;
# - a4/a7 approx twins: added r3;
# - j8/j9/j16/j13b/j21: registered late in r2, never driver-checked;
# - j17 (broadcast hint dropped r3) and j22 (oracle changed r2);
# - j20, s3, t8: new in r3;
# - d8 (prefix-filtered exact Jaccard join), st4 (stream-static join),
#   st5 (streaming dedup), st6 (stateful running totals), g3 (grouping
#   sets), j11b (Q11 value-share shape), j12b (Q12 priority-count shape),
#   dp1 (composed corpus-cleaning pipeline), w4 (ntile/percent_rank
#   deciles), s4 (label centroids, exact-decimal sums), mm6 (shard
#   planner), u3 (INTERSECT ALL / EXCEPT ALL): new in r3;
# - st3: never driver-checked + its streaming state was rebuilt r3;
# - mm5: oracle made byte-faithful r3;
# - adv2 (bucket-expansion off-by-one fixed r3) and adv11 (bucket-width
#   knob added r3) — outputs identical on the driver's midnight-anchored
#   testdata, re-checked anyway since the candidate generation changed.
# Everything else keeps its module registration order after these; what
# falls past slot 50 (st1/st2, mm1-mm4, three r1 joins, dedup/similarity/
# textstats/advanced/serving/monitoring) is unchanged since its green
# CORRECTNESS_r01/r02 row. The local strict mirror
# (tests/test_oracle_parity.py) additionally covers every oracled query
# every round.
_WINDOW_FIRST = [
    "a5_quality_histogram",
    "a4_vehicle_analytics_approx",
    "a7_summary_report_approx",
    "j8_market_share",
    "j9_profit_by_nation",
    "j16_supplier_part_counts",
    "j13b_order_count_distribution",
    "j21_lone_late_supplier",
    "j17_small_quantity_revenue",
    "j22_dormant_customers",
    "j20_excess_stock_suppliers",
    "s3_knn_lsh",
    "t8_bpe_token_stats",
    "d8_jaccard_join_prefix",
    "st3_streaming_watermarked_windows",
    "st4_stream_static_join",
    "st5_streaming_dedup",
    "st6_stateful_running_totals",
    "g3_groupingsets_order_stats",
    "j11b_supplier_value_share",
    "j12b_priority_by_returnflag",
    "dp1_corpus_clean",
    "w4_value_deciles",
    "s4_label_centroids",
    "mm6_shard_plan",
    "u3_key_overlap_multiset",
    "mm5_payload_dedup",
    "adv2_asof_join",
    "adv11_range_join",
]


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects,
    then rotate ``_WINDOW_FIRST`` to the front of the registry (see the
    list's comment for the round-3 rationale)."""
    global _LOADED, _REGISTRY
    if _LOADED:
        return
    from .operators import analytics, joins  # noqa: F401
    from .streaming import pipeline  # noqa: F401
    from .operators import (  # noqa: F401
        multimodal,
        dedup,
        similarity,
        textstats,
        advanced,
        serving,
        monitoring,
    )

    missing = [n for n in _WINDOW_FIRST if n not in _REGISTRY]
    assert not missing, f"_WINDOW_FIRST names not registered: {missing}"
    front = set(_WINDOW_FIRST)
    order = _WINDOW_FIRST + [n for n in _REGISTRY if n not in front]
    _REGISTRY = {n: _REGISTRY[n] for n in order}
    _LOADED = True
