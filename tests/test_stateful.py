"""Stateful streaming operator test: run the per-vehicle running totals
over a multi-batch bounded stream; the LAST update per vehicle must equal
the batch groupBy totals (state survives across micro-batches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_big_data_engineering_spark.sources.sensor_view import quality_checked
from iot_big_data_engineering_spark.streaming.pipeline import sensor_stream
from iot_big_data_engineering_spark.streaming.stateful import (
    running_vehicle_totals,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_split_state"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").repartition(3).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_state_accumulates_across_batches(spark, split_events_dir):
    stream = sensor_stream(
        spark, split_events_dir, glob="part-*.parquet", max_files_per_trigger=1
    )
    q = (
        running_vehicle_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends each update; keep the last per key
    out = spark.sql(
        """
        SELECT vehicle_id, running_count, running_value
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY vehicle_id ORDER BY running_count DESC) rn
          FROM state_out
        ) WHERE rn = 1
        """
    )
    want = (
        quality_checked(spark, SF_SMOKE)
        .groupBy("vehicle_id")
        .agg(
            F.count("*").alias("running_count"),
            F.round(F.sum("value"), 6).alias("running_value"),
        )
    )
    got_map = {r.vehicle_id: (r.running_count, r.running_value) for r in out.collect()}
    want_map = {
        r.vehicle_id: (r.running_count, round(r.running_value, 6))
        for r in want.collect()
    }
    assert set(got_map) == set(want_map)
    mismatches = {
        k: (got_map[k], want_map[k])
        for k in want_map
        if got_map[k][0] != want_map[k][0]
        or abs(got_map[k][1] - want_map[k][1]) > 1e-6
    }
    assert not mismatches, list(mismatches.items())[:5]
