"""Serving-layer queries — SURVEY.md §2.2 P7-P11 and §2.4 O1-O4.

The reference serves these over FastAPI + Postgres (src/api/sensor_api.py);
here they are pure DataFrame query functions (the query semantics are the
capability, not the HTTP transport). All sorts carry a total-order tiebreak
(sensor_id/ts) so pagination is deterministic and oracle-hashable — the
reference's ties were nondeterministic (SURVEY §7.4.5).

Scale notes: O1/O3/O4 are ORDER BY + LIMIT — Spark plans
TakeOrderedAndProject (per-partition top-k, then k·partitions rows to the
driver), which scales to any input size. OFFSET pagination deepens the
per-partition take by offset+limit; for deep pages at 100 TB, keyset
pagination (WHERE ts < last_seen) is the right call — provided as
``o1b_filtered_scan_keyset``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rounding import fround
from ..registry import register
from ..sources.sensor_view import SENSOR_ORACLE_CTE, quality_checked

# Fixed parameter values for the oracle-compared forms (the callables under
# the driver contract take no user params; these mirror typical API calls).
_VEHICLE = "VH_00007"
_SENSOR_TYPE = "error"
_T0 = "2024-01-01 00:00:00"
_T1 = "2024-01-08 00:00:00"


# ---------------------------------------------------------------------------
# P7 + O1 — dynamic filtered scan with pagination (limit+offset)
# ---------------------------------------------------------------------------
@register(
    "o1_filtered_scan_paginated",
    oracle=SENSOR_ORACLE_CTE
    + f"""
SELECT ts, sensor_id, vehicle_id, sensor_type, value,
       round(quality_score, 6) AS quality_score
FROM sensor_quality_checked
WHERE sensor_type = '{_SENSOR_TYPE}'
  AND ts >= TIMESTAMP '{_T0}' AND ts <= TIMESTAMP '{_T1}'
ORDER BY ts DESC, sensor_id
LIMIT 100 OFFSET 50
""",
    doc="P7+O1: filtered scan, ORDER BY ts DESC, LIMIT 100 OFFSET 50",
)
def o1_filtered_scan_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = quality_checked(spark, sf_dir)
    return (
        q.filter(
            (F.col("sensor_type") == _SENSOR_TYPE)
            & (F.col("ts") >= F.lit(_T0).cast("timestamp"))
            & (F.col("ts") <= F.lit(_T1).cast("timestamp"))
        )
        .select(
            "ts",
            "sensor_id",
            "vehicle_id",
            "sensor_type",
            "value",
            fround("quality_score", 6).alias("quality_score"),
        )
        .orderBy(F.col("ts").desc(), F.col("sensor_id"))
        .offset(50)
        .limit(100)
    )


# keyset-pagination twin (the 100 TB-correct form of deep pagination)
@register(
    "o1b_filtered_scan_keyset",
    oracle=SENSOR_ORACLE_CTE
    + """
SELECT ts, sensor_id, vehicle_id, sensor_type, value
FROM sensor_quality_checked
WHERE sensor_type = 'view' AND ts < TIMESTAMP '2024-01-03 00:00:00'
ORDER BY ts DESC, sensor_id
LIMIT 100
""",
    doc="O1 scale twin: keyset pagination (WHERE ts < cursor LIMIT k)",
)
def o1b_filtered_scan_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = quality_checked(spark, sf_dir)
    return (
        q.filter(
            (F.col("sensor_type") == "view")
            & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
        )
        .select("ts", "sensor_id", "vehicle_id", "sensor_type", "value")
        .orderBy(F.col("ts").desc(), F.col("sensor_id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# P7 variant — equality filter on vehicle_id (API /sensor-data?vehicle_id=)
# ---------------------------------------------------------------------------
@register(
    "p7_vehicle_scan",
    oracle=SENSOR_ORACLE_CTE
    + f"""
SELECT ts, sensor_id, vehicle_id, sensor_type, value, measurements
FROM sensor_quality_checked
WHERE vehicle_id = '{_VEHICLE}'
ORDER BY ts DESC, sensor_id
LIMIT 1000
""",
    doc="P7: per-vehicle filtered scan",
)
def p7_vehicle_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = quality_checked(spark, sf_dir)
    return (
        q.filter(F.col("vehicle_id") == _VEHICLE)
        .select("ts", "sensor_id", "vehicle_id", "sensor_type", "value", "measurements")
        .orderBy(F.col("ts").desc(), F.col("sensor_id"))
        .limit(1000)
    )


# ---------------------------------------------------------------------------
# P8 — date-bucket predicate (DATE(timestamp) = :date)
# ---------------------------------------------------------------------------
@register(
    "p8_date_bucket",
    oracle=SENSOR_ORACLE_CTE
    + """
SELECT sensor_type,
       count(*) AS record_count,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(value), 6)
         AS avg_value
FROM sensor_quality_checked
WHERE CAST(ts AS DATE) = DATE '2024-01-02'
GROUP BY sensor_type
""",
    doc="P8: DATE(ts) = d predicate + group",
)
def p8_date_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = quality_checked(spark, sf_dir)
    return (
        q.filter(F.to_date("ts") == F.lit("2024-01-02").cast("date"))
        .groupBy("sensor_type")
        .agg(
            F.count("*").alias("record_count"),
            fround(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count("value"),
                6,
            ).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# P10 — JSON field extraction + cast (JSONB analog)
# ---------------------------------------------------------------------------
@register(
    "p10_json_extract",
    oracle=SENSOR_ORACLE_CTE
    + """
SELECT sensor_type,
       round(avg(k), 6) AS avg_k,
       max(k) AS max_k,
       min(k) AS min_k,
       count(CASE WHEN k >= 50 THEN 1 END) AS high_k_count
FROM sensor_quality_checked
GROUP BY sensor_type
""",
    doc="P10: typed JSON measurement extraction + aggregate",
)
def p10_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k is get_json_object(measurements, '$.k')::int — see sensor_view.py
    q = quality_checked(spark, sf_dir)
    return q.groupBy("sensor_type").agg(
        fround(F.avg("k"), 6).alias("avg_k"),
        F.max("k").alias("max_k"),
        F.min("k").alias("min_k"),
        F.count(F.when(F.col("k") >= 50, 1)).alias("high_k_count"),
    )


# ---------------------------------------------------------------------------
# O4 — anomaly listing: multi-key sort + limit
# ---------------------------------------------------------------------------
@register(
    "o4_anomaly_listing",
    oracle=SENSOR_ORACLE_CTE
    + """
SELECT ts, sensor_id, vehicle_id, sensor_type, value,
       round(anomaly_score, 6) AS anomaly_score
FROM sensor_quality_checked
WHERE anomaly_score > 0
ORDER BY anomaly_score DESC, ts DESC, sensor_id
LIMIT 50
""",
    doc="P5+O4: anomalies sorted by (score desc, ts desc) top-50",
)
def o4_anomaly_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = quality_checked(spark, sf_dir)
    return (
        q.filter(F.col("anomaly_score") > 0)
        .select(
            "ts",
            "sensor_id",
            "vehicle_id",
            "sensor_type",
            "value",
            fround("anomaly_score", 6).alias("anomaly_score"),
        )
        .orderBy(
            F.col("anomaly_score").desc(), F.col("ts").desc(), F.col("sensor_id")
        )
        .limit(50)
    )
