"""Spark-SQL twin queries — the second entry style of the reference
(SURVEY.md §3.2: `SensorDataAnalytics.scala:264,284` runs SQL strings via
spark.sql alongside the DataFrame DSL). Every registry query already has a
DuckDB oracle; these twins prove the same logic runs through Spark's OWN
SQL front door (parse → analyze against registered views → optimize), and
tests assert SQL-vs-DataFrame result equality inside one engine.

Only representative shapes are duplicated here (scan-agg, sensor CTE,
window top-k, rollup) — the full surface lives in the DataFrame registry;
both forms converge to identical Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.sensor_view import quality_checked
from .sources.tables import register_views

SPARK_SQL_TWINS: dict[str, str] = {
    # j1 shape: scan-heavy grouped aggregation with decimal-exact sums
    "j1_pricing_summary": """
SELECT l_returnflag,
       l_linestatus,
       floor(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS sum_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    # a7 shape: global summary over the quality-checked sensor view
    "a7_global_summary": """
SELECT count(*) AS total_readings,
       count(DISTINCT vehicle_id) AS unique_vehicles,
       count(DISTINCT sensor_id) AS unique_sensors,
       count(DISTINCT sensor_type) AS unique_sensor_types,
       CAST(sum(q_int) AS DOUBLE) / (5.0 * count(*)) AS avg_quality_score,
       count(CASE WHEN anomaly_score > 0 THEN 1 END) AS anomaly_count
FROM sensor_quality_checked
""",
    # w1 shape: ranked window
    "w1_top_orders": """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3 AND o_custkey < 100
""",
    # g1 shape: rollup
    "g1_rollup": """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS order_count
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
}


def run_sql_twin(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Register base views (+ the sensor quality view) and run a twin."""
    register_views(spark, sf_dir)
    quality_checked(spark, sf_dir).createOrReplaceTempView(
        "sensor_quality_checked"
    )
    return spark.sql(SPARK_SQL_TWINS[name])
