"""The events → sensor-reading mapping (FIXTURES.md §5) + quality stage.

The driver's deterministic ``events`` table stands in for the reference's
sensor stream until a dedicated sensor fixture exists. The mapping is defined
TWICE, deliberately kept adjacent so they cannot drift:

- :func:`sensor_readings` / :func:`quality_checked` — the Spark DataFrame
  form (what the engine actually runs);
- :data:`SENSOR_ORACLE_CTE` — the equivalent DuckDB SQL CTE prefix used by
  every oracle query.

Mapping (events column → sensor field):
    ts → ts,  printf('VH_%05d', user_id) → vehicle_id,
    event_type → sensor_type,  event_type || '_' || event_id%100 → sensor_id,
    value → scalar measurement,  props (JSON) → measurements.

Quality stage semantics (reference SensorDataProcessor.scala:141-186):
- completeness filter P1: ts/sensor_id/vehicle_id/sensor_type non-null;
- quality_score P2: completeness score normalized to [0,1] (SURVEY §7.4.2);
- anomaly_score P4: 3-branch when-chain keyed on sensor_type thresholds
  (reference: radar distance>200 / camera object_count>20 / gps speed>200;
  here mapped onto event_type/value thresholds so a deterministic subset of
  the testdata fires);
- processing_timestamp P3: made deterministic as ts + 5 s so the latency
  monitoring queries (alerting.py:212-218) return a nonzero, oracle-stable
  value (SURVEY §7.4.5: never current_timestamp() in oracle-compared output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .tables import load_table

# Anomaly thresholds, mirrored in Spark and SQL below. Chosen so ~2-5% of the
# deterministic events rows fire (value ~ Uniform-ish [0,200)).
_ANOMALY_RULES = [
    ("error", 150.0, 1.0),
    ("click", 180.0, 1.0),
    ("purchase", 190.0, 0.8),
]
_ANOMALY_DEFAULT_THRESHOLD = 195.0
_ANOMALY_DEFAULT_SCORE = 0.5


def map_events(e: DataFrame) -> DataFrame:
    """Map an events-shaped DataFrame (batch OR streaming) onto the
    canonical sensor-reading shape."""
    return e.select(
        F.col("ts"),
        F.concat(
            F.col("event_type"), F.lit("_"), (F.col("event_id") % 100).cast("string")
        ).alias("sensor_id"),
        F.format_string("VH_%05d", F.col("user_id")).alias("vehicle_id"),
        F.col("event_type").alias("sensor_type"),
        F.col("value"),
        F.col("props").alias("measurements"),
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
    )


def sensor_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events mapped onto the canonical sensor-reading shape (pre-quality)."""
    return map_events(load_table(spark, sf_dir, "events"))


def _q_int_col() -> F.Column:
    """P2 core — integer completeness count 0..5 (reference
    SensorDataProcessor.scala:148-154). Kept as an exact integer so that
    aggregated quality averages are order-independent (sum of ints), then
    normalized to [0,1] once (SURVEY §7.4.2)."""
    terms = [
        F.when(F.col(c).isNotNull(), F.lit(1)).otherwise(F.lit(0))
        for c in ["ts", "sensor_id", "vehicle_id", "sensor_type", "value"]
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def _anomaly_score_col() -> F.Column:
    """P4 — chained when over sensor_type-specific thresholds (reference
    SensorDataProcessor.scala:176-183)."""
    expr = None
    for stype, threshold, score in _ANOMALY_RULES:
        cond = (F.col("sensor_type") == stype) & (F.col("value") > threshold)
        expr = F.when(cond, score) if expr is None else expr.when(cond, score)
    expr = expr.when(
        F.col("value") > _ANOMALY_DEFAULT_THRESHOLD, _ANOMALY_DEFAULT_SCORE
    )
    return expr.otherwise(F.lit(0.0))


def apply_quality(s: DataFrame) -> DataFrame:
    """P1+P2+P3+P4 applied to a sensor-reading DataFrame (batch OR
    streaming) — the analog of table ``sensor_quality_checked``
    (reference docker/init-db.sql:5-18)."""
    return (
        s.filter(
            F.col("ts").isNotNull()
            & F.col("sensor_id").isNotNull()
            & F.col("vehicle_id").isNotNull()
            & F.col("sensor_type").isNotNull()
        )
        .withColumn("q_int", _q_int_col())
        .withColumn("quality_score", F.col("q_int") / F.lit(5.0))
        .withColumn("anomaly_score", _anomaly_score_col())
        .withColumn(
            "processing_timestamp", F.col("ts") + F.expr("INTERVAL 5 SECONDS")
        )
    )


def quality_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch convenience: events table → sensor mapping → quality stage."""
    return apply_quality(sensor_readings(spark, sf_dir))


# ---------------------------------------------------------------------------
# DuckDB oracle twin. Prefix every oracle query with this CTE.
# ---------------------------------------------------------------------------
_anomaly_whens = "\n        ".join(
    f"WHEN sensor_type = '{stype}' AND value > {thr} THEN {score}"
    for stype, thr, score in _ANOMALY_RULES
)

SENSOR_ORACLE_CTE = f"""
WITH sensor_readings AS (
  SELECT
    ts,
    event_type || '_' || CAST(event_id % 100 AS VARCHAR) AS sensor_id,
    printf('VH_%05d', user_id) AS vehicle_id,
    event_type AS sensor_type,
    value,
    props AS measurements,
    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
),
sensor_quality_checked AS (
  SELECT *,
    ((CASE WHEN ts IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN sensor_id IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN vehicle_id IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN sensor_type IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)) AS q_int,
    ((CASE WHEN ts IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN sensor_id IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN vehicle_id IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN sensor_type IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)) / 5.0
      AS quality_score,
    CASE
        {_anomaly_whens}
        WHEN value > {_ANOMALY_DEFAULT_THRESHOLD} THEN {_ANOMALY_DEFAULT_SCORE}
        ELSE 0.0
    END AS anomaly_score,
    ts + INTERVAL 5 SECOND AS processing_timestamp
  FROM sensor_readings
  WHERE ts IS NOT NULL AND sensor_id IS NOT NULL
    AND vehicle_id IS NOT NULL AND sensor_type IS NOT NULL
)
"""
