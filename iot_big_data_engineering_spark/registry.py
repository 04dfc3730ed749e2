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


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
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


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        analytics,
        serving,
        monitoring,
        joins,
        dedup,
        similarity,
        textstats,
        multimodal,
    )
    from .streaming import pipeline  # noqa: F401

    _LOADED = True
