"""Generator property tests — mirror of the reference's only test file
(tests/test_data_generator.py:18-178): sensor-type vocabulary, per-type
value ranges, nested payload structure, metadata invariants, location
bounds, batch counts, determinism (which the reference, unseeded, could
not test)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from iot_big_data_engineering_spark.schema import SENSOR_TYPES
from iot_big_data_engineering_spark.sources.generator import (
    BASE_LAT,
    BASE_LON,
    synthetic_sensor_readings,
)

N = 2000


@pytest.fixture(scope="module")
def gen_rows(spark):
    df = synthetic_sensor_readings(spark, n=N, seed=7)
    rows = df.collect()
    assert len(rows) == N
    return rows


def _payloads(rows, stype):
    return [
        json.loads(r.measurements)
        for r in rows
        if r.sensor_type == stype and r.measurements is not None
    ]


def test_sensor_type_vocabulary(gen_rows):
    types = {r.sensor_type for r in gen_rows if r.sensor_type is not None}
    assert types == set(SENSOR_TYPES)


def test_record_structure(gen_rows):
    r = gen_rows[0]
    assert set(r.asDict()) == {
        "ts",
        "sensor_id",
        "vehicle_id",
        "sensor_type",
        "latitude",
        "longitude",
        "measurements",
        "metadata",
    }


def test_radar_ranges(gen_rows):
    payloads = _payloads(gen_rows, "radar")
    assert payloads
    for m in payloads:
        assert 0.5 <= m["distance"] <= 400.0  # >200 only for injected anomalies
        assert 0.0 <= m["speed"] <= 120.0
        assert -180.0 <= m["angle"] <= 180.0
        assert 0.7 <= m["confidence"] <= 1.0
        assert m["target_type"] in {"vehicle", "pedestrian", "cyclist", "static_object"}
        assert -50.0 <= m["relative_velocity"] <= 50.0


def test_camera_ranges_and_nesting(gen_rows):
    payloads = _payloads(gen_rows, "camera")
    assert payloads
    for m in payloads:
        assert 0 <= m["object_count"] <= 50
        ld = m["lane_detection"]
        assert 0.5 <= ld["left_lane_confidence"] <= 1.0
        assert 0.5 <= ld["right_lane_confidence"] <= 1.0
        assert 3.0 <= ld["lane_width"] <= 4.5
        assert 0 <= m["traffic_signs"] <= 5
        assert 0 <= m["pedestrian_detection"] <= 3
        assert 0.6 <= m["image_quality"] <= 1.0


def test_imu_nested_axes(gen_rows):
    payloads = _payloads(gen_rows, "imu")
    assert payloads
    for m in payloads:
        for axis in "xyz":
            assert -2.0 <= m["acceleration"]["x"] <= 2.0
            assert -0.5 <= m["gyroscope"][axis] <= 0.5
            assert -50.0 <= m["magnetometer"][axis] <= 50.0
        assert 9.0 <= m["acceleration"]["z"] <= 11.0


def test_metadata_invariants(gen_rows):
    for r in gen_rows[:200]:
        md = json.loads(r.metadata)
        assert md["manufacturer"] == "Bosch"
        assert md["model"].endswith(("V1", "V2", "V3"))
        assert -20.0 <= md["temperature"] <= 60.0
        assert 20.0 <= md["humidity"] <= 80.0
        assert md["calibration_date"] == "2024-01-01"


def test_location_bounds(gen_rows):
    for r in gen_rows:
        assert abs(r.latitude - BASE_LAT) <= 0.11
        assert abs(r.longitude - BASE_LON) <= 0.11


def test_null_injection_rate(gen_rows):
    n_null = sum(
        1
        for r in gen_rows
        if r.ts is None
        or r.sensor_id is None
        or r.vehicle_id is None
        or r.sensor_type is None
    )
    assert 0 < n_null < N * 0.08  # ~3% ± slack


def test_determinism(spark):
    a = synthetic_sensor_readings(spark, n=500, seed=11).collect()
    b = synthetic_sensor_readings(spark, n=500, seed=11).collect()
    assert a == b
    c = synthetic_sensor_readings(spark, n=500, seed=12).collect()
    assert a != c


def test_quality_pipeline_on_generator(spark):
    """The generator output drives the quality stage (P1-P2): nulls are
    filtered and quality_score reflects completeness."""
    from iot_big_data_engineering_spark.sources.sensor_view import apply_quality

    df = synthetic_sensor_readings(spark, n=1000, seed=3).withColumn(
        "value",
        F.get_json_object("measurements", "$.distance").cast("double"),
    )
    q = apply_quality(df)
    total = df.count()
    kept = q.count()
    assert kept < total  # completeness filter dropped the injected nulls
    assert q.filter(F.col("quality_score") < 0.8).count() >= 0
