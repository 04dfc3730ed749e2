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


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
