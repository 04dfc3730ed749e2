"""Parquet table loaders for the driver testdata (TESTDATA.md).

Parquet is self-describing, so reads use the file schema — but every load
is validated against the declared schema in ``schema.py`` (the reference
inferred JSON schemas on every batch read, SensorDataAnalytics.scala:92-94;
at 100 TB an inference pass over JSON is an extra full scan, so all
non-self-describing reads in this engine take explicit schemas).

Timestamp caveat: the testdata stores TIMESTAMP(NANOS, isAdjustedToUTC=
false), which Spark's parquet reader rejects outright. With
``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py) the column
arrives as int64 nanoseconds; we convert with integer division (``div``,
never ``/`` — float division loses precision above 2^53) to microsecond
TimestampType, matching DuckDB's own nanos→micros truncation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schema import TABLE_NAMES, TESTDATA_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # runtime-settable SQL conf: the caller may hand us a session built
    # elsewhere (e.g. the verify driver's vanilla session) — without this,
    # any TIMESTAMP(NANOS) parquet read throws PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    declared = TESTDATA_SCHEMAS[name]
    actual = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in declared.fields:
        if field.name not in actual:
            raise ValueError(f"{name}: missing column {field.name}")
        if isinstance(field.dataType, T.TimestampType) and isinstance(
            actual[field.name], T.LongType
        ):
            cols.append(
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")).alias(
                    field.name
                )
            )
        elif isinstance(field.dataType, T.TimestampType) and isinstance(
            actual[field.name], T.TimestampNTZType
        ):
            # some testdata files store TIMESTAMP_NTZ micros directly;
            # normalize to TimestampType (UTC session → identical values)
            cols.append(F.col(field.name).cast("timestamp").alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


# Input-size gate threshold for scale-shape plan forms (currently
# j23/j23b's basket-array pair expansion): below this the local
# (broadcast-join) form wins — measured at sf0.1 in r17/r18 — and above
# it the fewer-shuffle form wins (validated r18 by forcing shuffle joins
# via autoBroadcastJoinThreshold=-1, the at-scale join strategy, where
# the basket form measured 12-15% faster; see OPTIMIZATION_r18.md).
# 256 MiB is past any sane broadcast and into multi-split scans, where
# shuffle count is the cost that scales. Tests override the module
# attribute.
SCALE_GATE_MIN_BYTES = 256 * 1024 * 1024


def table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk size of a table's parquet (file or directory of part
    files), or None when it cannot be statted (non-local path such as
    s3://). Used by the input-size gates that pick between a local
    (broadcast-friendly) plan and the 100 TB (shared-scan / fewer-pass)
    plan — a deterministic function of the INPUT, never of results, so
    both branches compute identical values and the gate only chooses the
    physical shape (r17 VERDICT Next #4)."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
                if not f.startswith((".", "_"))
            )
        return os.path.getsize(path)
    except OSError:
        return None


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
