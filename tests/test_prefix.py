"""functions/prefix.py — the two-phase exclusive prefix sum must be
bit-identical to the naive per-group window for every bucket width
(including widths that split groups unevenly and width >= key range,
which degenerates to a single bucket)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from iot_big_data_engineering_spark.functions.prefix import exclusive_prefix_sum
from iot_big_data_engineering_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.mark.parametrize("width", [1, 7, 100, 10_000_000])
def test_exclusive_prefix_sum_equals_naive_window(spark, width):
    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", F.octet_length("props").alias("val")
    )
    fast = exclusive_prefix_sum(
        e,
        group_col="event_type",
        order_col="event_id",
        value_col="val",
        out_col="off",
        bucket_width=width,
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = e.withColumn(
        "off", (F.sum("val").over(w) - F.col("val")).cast("bigint")
    )
    a = {(r.event_type, r.event_id): r.off for r in fast.collect()}
    b = {(r.event_type, r.event_id): r.off for r in naive.collect()}
    assert a == b
