"""Explicit schemas — the single source of truth for every table.

The reference declared a sensor StructType but never applied it (it parsed
JSON per-record with Jackson and relied on ``.toDF()`` inference — reference
``src/spark/streaming/SensorDataProcessor.scala:85-96`` vs ``:100-112``) and
used ``spark.read.json`` schema inference in batch
(``src/spark/batch/SensorDataAnalytics.scala:92-94``). Here every read path
takes one of these explicit schemas; nothing is ever inferred.

Semantic decisions (SURVEY.md §7.4), made once here:
- ``ts`` is a real ``TimestampType`` (the reference kept ISO-8601 strings and
  re-parsed with ``unix_timestamp`` per query).
- ``measurements`` / ``metadata`` are raw JSON **strings** + typed accessors
  (`functions/measurements.py`), because a ``MapType(String,String)`` cannot
  hold the nested imu/camera payloads the reference still dot-accesses
  (``SensorDataAnalytics.scala:144-149``). This matches the Postgres JSONB
  serving store (``docker/init-db.sql:11-13``).
- ``quality_score`` is normalized to [0, 1] (the reference computed 0-5 but
  every consumer — DDL DECIMAL(3,2), alert thresholds, quality bands —
  assumed 0-1; we emit score/5.0).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical sensor reading (reference SensorDataProcessor.scala:85-96,
# flattened per FIXTURES.md §1: location as two doubles, payloads as JSON).
# ---------------------------------------------------------------------------
SENSOR_READING_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("sensor_id", T.StringType(), True),
        T.StructField("vehicle_id", T.StringType(), True),
        T.StructField("sensor_type", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("measurements", T.StringType(), True),  # JSON payload
        T.StructField("metadata", T.StringType(), True),  # JSON payload
    ]
)

# Nested form used on the wire (Kafka JSON value), matching the reference's
# declared StructType with location kept nested.
SENSOR_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), True),  # ISO-8601 string
        T.StructField("sensor_id", T.StringType(), True),
        T.StructField("vehicle_id", T.StringType(), True),
        T.StructField("sensor_type", T.StringType(), True),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("latitude", T.DoubleType(), True),
                    T.StructField("longitude", T.DoubleType(), True),
                ]
            ),
            True,
        ),
        T.StructField("measurements", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
    ]
)

# Output of the quality stage (reference docker/init-db.sql:5-18):
# sensor reading + quality_score + anomaly_score + processing_timestamp.
QUALITY_CHECKED_SCHEMA = T.StructType(
    list(SENSOR_READING_SCHEMA.fields)
    + [
        T.StructField("quality_score", T.DoubleType(), True),
        T.StructField("anomaly_score", T.DoubleType(), True),
        T.StructField("processing_timestamp", T.TimestampType(), True),
    ]
)

SENSOR_TYPES = ["radar", "camera", "lidar", "ultrasonic", "imu", "gps"]

# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — explicit schemas so no read ever infers.
# ---------------------------------------------------------------------------
TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TABLE_NAMES = list(TESTDATA_SCHEMAS)
