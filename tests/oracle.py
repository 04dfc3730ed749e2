"""Local mirror of the driver's DuckDB-oracle comparison — STRICT mode.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares:
- column names (order-insensitive),
- column TYPES (DuckDB DESCRIBE → Spark dtype mapping; a DECIMAL vs DOUBLE
  or HUGEINT vs BIGINT divergence is a schema break for the driver's hash),
- values, order-insensitively, with EXACT float equality — the queries
  round deterministically on both sides (functions/rounding.py), so any
  residual bit difference is a real cross-engine bug.
"""

from __future__ import annotations

import datetime as dt
import math
import re
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

_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BLOB": "binary",
}


def _map_duck_type(t: str) -> str:
    t = t.strip()
    if t in _DUCK_TO_SPARK:
        return _DUCK_TO_SPARK[t]
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"(\w+)\[\]", t)
    if m:
        return f"array<{_map_duck_type(m.group(1))}>"
    return f"<unmapped:{t}>"


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    types = {
        r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, types, rows


def _norm(v):
    if isinstance(v, Decimal):
        return v  # keep decimals exact; spark returns Decimal too
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    return v


def _sortable(row):
    return tuple((x is None, str(type(x).__name__), str(x)) for x in row)


def compare(spark_df, oracle_cols, oracle_types, oracle_rows, check_types=True):
    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    if check_types:
        sdtypes = dict(spark_df.dtypes)
        mismatches = {
            c: (sdtypes[c], _map_duck_type(oracle_types[c]))
            for c in spark_cols
            if sdtypes[c] != _map_duck_type(oracle_types[c])
        }
        assert not mismatches, f"dtype mismatch (spark, oracle): {mismatches}"
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
                assert sv == ov, (
                    f"row {i} col {c}: spark={sv!r} oracle={ov!r} "
                    f"(diff {sv - ov!r})"
                )
            else:
                assert sv == ov, f"row {i} col {c}: spark={sv!r} oracle={ov!r}"
