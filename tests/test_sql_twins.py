"""SQL-entry parity: representative queries run through spark.sql over
registered views must equal their DataFrame-DSL forms row-for-row (the
reference's dual entry styles, SURVEY.md §3.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_big_data_engineering_spark.functions.rounding import fround
from iot_big_data_engineering_spark.sql_twins import SPARK_SQL_TWINS, run_sql_twin
from iot_big_data_engineering_spark.sources.sensor_view import quality_checked
from iot_big_data_engineering_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _rows(df, sort_cols):
    return [tuple(r) for r in df.orderBy(*sort_cols).collect()]


def test_j1_sql_equals_dataframe(spark):
    sql = run_sql_twin(spark, SF_SMOKE, "j1_pricing_summary")
    l = load_table(spark, SF_SMOKE, "lineitem")
    df = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"), 2).alias("sum_qty"),
            F.count("*").alias("count_order"),
        )
    )
    assert _rows(sql, ["l_returnflag", "l_linestatus"]) == _rows(
        df, ["l_returnflag", "l_linestatus"]
    )


def test_a7_sql_equals_dataframe(spark):
    sql = run_sql_twin(spark, SF_SMOKE, "a7_global_summary")
    q = quality_checked(spark, SF_SMOKE)
    df = q.agg(
        F.count("*").alias("total_readings"),
        F.countDistinct("vehicle_id").alias("unique_vehicles"),
        F.countDistinct("sensor_id").alias("unique_sensors"),
        F.countDistinct("sensor_type").alias("unique_sensor_types"),
        (F.sum("q_int").cast("double") / (F.lit(5.0) * F.count("*"))).alias(
            "avg_quality_score"
        ),
        F.count(F.when(F.col("anomaly_score") > 0, 1)).alias("anomaly_count"),
    )
    assert sql.collect() == df.collect()


def test_w1_and_g1_sql_run_and_match_counts(spark):
    w1 = run_sql_twin(spark, SF_SMOKE, "w1_top_orders")
    g1 = run_sql_twin(spark, SF_SMOKE, "g1_rollup")
    o = load_table(spark, SF_SMOKE, "orders")
    n_g1_groups = (
        o.rollup("o_orderstatus", "o_orderpriority").count().count()
    )
    assert g1.count() == n_g1_groups
    assert w1.filter(F.col("rn") > 3).count() == 0
    assert w1.count() > 0


def test_sql_and_dataframe_plans_converge(spark):
    """Both entry styles must optimize to the same physical plan shape for
    the j1 aggregation (HashAggregate partial/final over one scan)."""
    from iot_big_data_engineering_spark.plans.checks import plan_str

    sql_plan = plan_str(
        run_sql_twin(spark, SF_SMOKE, "j1_pricing_summary"), mode="simple"
    )
    assert "HashAggregate" in sql_plan
    assert sql_plan.count("Exchange") == 1  # single agg shuffle
