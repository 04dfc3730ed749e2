"""Physical-plan assertion helpers.

"Would this survive a 100× scale-up?" is checked here, mechanically:
tests assert that filters reach the parquet scan (PushedFilters), scans
prune columns (ReadSchema), dimension joins broadcast, and hot paths stay
inside WholeStageCodegen. A plan regression (e.g. a lost pushdown after a
refactor) fails the suite, not just the benchmark.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame) -> None:
    p = plan_str(df)
    assert "BroadcastHashJoin" in p, f"no broadcast hash join in plan:\n{p}"


def assert_no_cartesian(df: DataFrame) -> None:
    p = plan_str(df)
    assert "CartesianProduct" not in p, f"cartesian product in plan:\n{p}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert some parquet scan reports a pushed filter containing
    ``fragment``."""
    p = plan_str(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: "
        f"{pushed}\nfull plan:\n{p}"
    )


def assert_read_schema_only(df: DataFrame, table_file: str, allowed: set[str]) -> None:
    """Assert the scan of ``table_file`` reads no columns beyond ``allowed``
    (column pruning works)."""
    p = plan_str(df)
    lines = p.splitlines()
    for i, ln in enumerate(lines):
        if table_file in ln and "Location" in ln:
            # ReadSchema appears within the same scan block
            for lookahead in lines[i : i + 6]:
                if "ReadSchema" in lookahead:
                    schema_part = lookahead.split("ReadSchema:", 1)[1].strip()
                    # strip the literal struct<...> wrapper — str.lstrip
                    # is a CHARACTER-set strip and would also eat a
                    # leading column name drawn from {s,t,r,u,c,<}
                    # (e.g. "ts"), silently mangling the parse
                    if schema_part.startswith("struct<"):
                        schema_part = schema_part[len("struct<"):]
                    cols = {
                        c.split(":")[0].strip()
                        for c in schema_part.rstrip(">").split(",")
                        if c.strip()
                    }
                    extra = cols - allowed
                    assert not extra, (
                        f"scan of {table_file} reads unexpected columns "
                        f"{extra}; plan:\n{p}"
                    )
                    return
    raise AssertionError(f"no ReadSchema found for {table_file} in plan:\n{p}")


def assert_whole_stage_codegen(df: DataFrame) -> None:
    p = plan_str(df, mode="simple")
    assert "*(" in p, f"no WholeStageCodegen stages in plan:\n{p}"


def hint_count(df: DataFrame) -> int:
    """Number of ResolvedHint nodes in the analyzed logical plan — the
    mechanical form of the broadcast policy: hints are allowed only on
    tables whose cardinality does NOT scale with data volume (nation/
    region, 1-row scalar aggregates, bounded probe sets), so each query
    asserts its exact allowed count."""
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def assert_hint_count(df: DataFrame, allowed: int) -> None:
    n = hint_count(df)
    assert n == allowed, (
        f"expected exactly {allowed} broadcast hint(s) (fixed-cardinality "
        f"tables only), found {n}:\n"
        + df._jdf.queryExecution().analyzed().toString()
    )


def assert_no_exchange(df: DataFrame) -> None:
    """The co-located-join check: a join of two identically-bucketed tables
    must plan with zero shuffle (Exchange) operators."""
    p = plan_str(df)
    assert "Exchange" not in p, f"unexpected shuffle Exchange in plan:\n{p}"
