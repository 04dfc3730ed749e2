"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and (order-insensitively)
values. Floats are compared with a small tolerance here — the queries
themselves round on both sides, so any residual diff means a real bug.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return v
    return v


def _sortable(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def compare(spark_df, oracle_cols, oracle_rows, float_tol=1e-9):
    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    # align oracle columns to spark order
    idx = [oracle_cols.index(c) for c in spark_cols]
    o_rows = [tuple(_norm(r[i]) for i in idx) for r in oracle_rows]
    s_rows = [tuple(_norm(v) for v in r) for r in spark_df.collect()]
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_sorted = sorted(s_rows, key=_sortable)
    o_sorted = sorted(o_rows, key=_sortable)
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for c, (sv, ov) in zip(spark_cols, zip(sr, orow)):
            if isinstance(sv, float) and isinstance(ov, float):
                if math.isnan(sv) and math.isnan(ov):
                    continue
                assert abs(sv - ov) <= float_tol * max(1.0, abs(sv), abs(ov)), (
                    f"row {i} col {c}: spark={sv!r} oracle={ov!r}"
                )
            else:
                assert sv == ov, f"row {i} col {c}: spark={sv!r} oracle={ov!r}"
