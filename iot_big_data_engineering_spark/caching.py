"""Session-lifetime cache registry.

A few operators persist() an intermediate that the RETURNED lazy DataFrame
still depends on (d4's minhash signatures, ivf_topk's projected corpus).
Unpersisting inside the operator would defeat the cache before the caller
materializes the result, so ownership of cleanup is the caller's. Operators
register those persisted frames here; callers that run many operators in
one session (bench.py, the test suite) call :func:`release_caches` between
queries to return the executor storage memory.

At real scale the equivalent move is writing the intermediate to a table
once and reading it back — the cache registry is the single-session stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Record a persist()ed DataFrame for later release; returns it."""
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame (blocking=False). Returns count."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
