"""Deterministic synthetic sensor-data source — the rebuild of the
reference generator (src/data_generator/sensor_data_generator.py:32-170)
as pure Spark column expressions over ``spark.range`` / the rate source.

Design: every "random" draw is a deterministic function of (record id,
seed, field salt) via xxhash64 — reproducible across runs, partitions and
cluster sizes (the reference used Python's global `random`, so its output
was neither seeded nor distributed). All six payload shapes and value
ranges match FIXTURES.md §1-2 (asserted by the reference's own tests,
tests/test_data_generator.py:54-131). Null injection (~3%) and anomaly
injection (~2%, out-of-range values per detectAnomalies) follow
FIXTURES.md so the quality/anomaly operators have work to do.

Scale: spark.range parallelizes the id space; every derived column is a
built-in expression (whole-stage codegen, zero Python) — the generator
sustains millions of rows/s/core and any target size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.rounding import fround
from ..schema import SENSOR_TYPES

BASE_LAT = 47.4979
BASE_LON = 19.0402
BASE_TS = "2024-01-01 00:00:00"
_U_MOD = 1 << 31


def _u(seed: int, salt: str, id_col: str = "id") -> Column:
    """Deterministic uniform [0, 1) from (id, seed, salt)."""
    return F.pmod(
        F.xxhash64(F.col(id_col), F.lit(seed), F.lit(salt)), F.lit(_U_MOD)
    ) / float(_U_MOD)


def _uniform(seed: int, salt: str, lo: float, hi: float, dp: int) -> Column:
    return fround(_u(seed, salt) * (hi - lo) + lo, dp)


def _uniform_int(seed: int, salt: str, lo: int, hi: int) -> Column:
    """Uniform integer in [lo, hi] (inclusive)."""
    return (F.floor(_u(seed, salt) * (hi - lo + 1)) + lo).cast("int")


def _choice(seed: int, salt: str, options: list) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, _uniform_int(seed, salt, 1, len(options)))


def synthetic_sensor_readings(
    spark: SparkSession,
    n: int = 10_000,
    seed: int = 42,
    null_rate: float = 0.03,
    anomaly_rate: float = 0.02,
    partitions: int | None = None,
) -> DataFrame:
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return generate_from_ids(base, seed=seed, null_rate=null_rate, anomaly_rate=anomaly_rate)


def generate_from_ids(
    base: DataFrame,
    seed: int = 42,
    null_rate: float = 0.03,
    anomaly_rate: float = 0.02,
) -> DataFrame:
    """Derive full sensor records from an ``id: long`` column (works for
    spark.range batches AND the streaming rate source alike)."""
    s = seed
    df = base.withColumn("sensor_type", _choice(s, "stype", SENSOR_TYPES))

    anomalous = _u(s, "anomaly") < anomaly_rate

    # --- per-type measurement payloads (FIXTURES.md §2) ----------------
    radar = F.struct(
        F.when(anomalous, _uniform(s, "r_dist_a", 200.01, 400.0, 2))
        .otherwise(_uniform(s, "r_dist", 0.5, 200.0, 2))
        .alias("distance"),
        _uniform(s, "r_speed", 0.0, 120.0, 2).alias("speed"),
        _uniform(s, "r_angle", -180.0, 180.0, 2).alias("angle"),
        _uniform(s, "r_conf", 0.7, 1.0, 3).alias("confidence"),
        _choice(
            s, "r_target", ["vehicle", "pedestrian", "cyclist", "static_object"]
        ).alias("target_type"),
        _uniform(s, "r_rvel", -50.0, 50.0, 2).alias("relative_velocity"),
    )
    camera = F.struct(
        F.when(anomalous, _uniform_int(s, "c_obj_a", 21, 50))
        .otherwise(_uniform_int(s, "c_obj", 0, 10))
        .alias("object_count"),
        F.struct(
            _uniform(s, "c_llc", 0.5, 1.0, 3).alias("left_lane_confidence"),
            _uniform(s, "c_rlc", 0.5, 1.0, 3).alias("right_lane_confidence"),
            _uniform(s, "c_lw", 3.0, 4.5, 2).alias("lane_width"),
        ).alias("lane_detection"),
        _uniform_int(s, "c_signs", 0, 5).alias("traffic_signs"),
        _uniform_int(s, "c_ped", 0, 3).alias("pedestrian_detection"),
        _uniform(s, "c_iq", 0.6, 1.0, 3).alias("image_quality"),
    )
    lidar = F.struct(
        _uniform_int(s, "l_pcs", 1000, 100000).alias("point_cloud_size"),
        _uniform_int(s, "l_obj", 0, 20).alias("detected_objects"),
        _uniform(s, "l_ra", 0.01, 0.05, 4).alias("range_accuracy"),
        _uniform(s, "l_ar", 0.1, 0.5, 2).alias("angular_resolution"),
        _choice(s, "l_sf", [10, 20, 30]).alias("scan_frequency"),
    )
    ultrasonic = F.struct(
        _uniform(s, "u_dist", 0.1, 5.0, 3).alias("distance"),
        _uniform(s, "u_ang", 30.0, 120.0, 1).alias("detection_angle"),
        _uniform(s, "u_sig", 0.5, 1.0, 3).alias("signal_strength"),
        _uniform(s, "u_tc", -2.0, 2.0, 2).alias("temperature_compensation"),
    )
    imu = F.struct(
        F.struct(
            _uniform(s, "i_ax", -2.0, 2.0, 4).alias("x"),
            _uniform(s, "i_ay", -2.0, 2.0, 4).alias("y"),
            _uniform(s, "i_az", 9.0, 11.0, 4).alias("z"),
        ).alias("acceleration"),
        F.struct(
            _uniform(s, "i_gx", -0.5, 0.5, 4).alias("x"),
            _uniform(s, "i_gy", -0.5, 0.5, 4).alias("y"),
            _uniform(s, "i_gz", -0.5, 0.5, 4).alias("z"),
        ).alias("gyroscope"),
        F.struct(
            _uniform(s, "i_mx", -50.0, 50.0, 2).alias("x"),
            _uniform(s, "i_my", -50.0, 50.0, 2).alias("y"),
            _uniform(s, "i_mz", -50.0, 50.0, 2).alias("z"),
        ).alias("magnetometer"),
    )
    gps = F.struct(
        fround(F.lit(BASE_LAT) + (_u(s, "g_lat") - 0.5) * 0.02, 6).alias("latitude"),
        fround(F.lit(BASE_LON) + (_u(s, "g_lon") - 0.5) * 0.02, 6).alias("longitude"),
        _uniform(s, "g_alt", 100.0, 200.0, 1).alias("altitude"),
        F.when(anomalous, _uniform(s, "g_speed_a", 200.01, 300.0, 2))
        .otherwise(_uniform(s, "g_speed", 0.0, 120.0, 2))
        .alias("speed"),
        _uniform(s, "g_head", 0.0, 360.0, 1).alias("heading"),
        _uniform(s, "g_acc", 1.0, 10.0, 1).alias("accuracy"),
        _uniform_int(s, "g_sat", 4, 12).alias("satellites"),
    )
    st = F.col("sensor_type")
    measurements = (
        F.when(st == "radar", F.to_json(radar))
        .when(st == "camera", F.to_json(camera))
        .when(st == "lidar", F.to_json(lidar))
        .when(st == "ultrasonic", F.to_json(ultrasonic))
        .when(st == "imu", F.to_json(imu))
        .otherwise(F.to_json(gps))
    )

    metadata = F.to_json(
        F.struct(
            F.concat(
                _uniform_int(s, "fw1", 1, 3).cast("string"),
                F.lit("."),
                _uniform_int(s, "fw2", 0, 9).cast("string"),
            ).alias("firmware_version"),
            F.lit("2024-01-01").alias("calibration_date"),
            F.lit("Bosch").alias("manufacturer"),
            F.concat(F.upper(st), F.lit("_SENSOR_V"), _uniform_int(s, "mv", 1, 3).cast("string")).alias(
                "model"
            ),
            _uniform(s, "temp", -20.0, 60.0, 1).alias("temperature"),
            _uniform(s, "hum", 20.0, 80.0, 1).alias("humidity"),
        )
    )

    # null injection: pick one of the critical fields for ~null_rate of rows
    null_row = _u(s, "nullrow") < null_rate
    null_pick = _uniform_int(s, "nullpick", 1, 4)

    return df.select(
        F.when(null_row & (null_pick == 1), F.lit(None)).otherwise(
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(BASE_TS).cast("timestamp"))
                + F.col("id") % 86400
            )
        ).alias("ts"),
        F.when(null_row & (null_pick == 2), F.lit(None)).otherwise(
            F.format_string(
                "%s_%03d", F.col("sensor_type"), _uniform_int(s, "sid", 1, 100)
            )
        ).alias("sensor_id"),
        F.when(null_row & (null_pick == 3), F.lit(None)).otherwise(
            F.format_string("VH_%05d", _uniform_int(s, "vid", 1, 1000))
        ).alias("vehicle_id"),
        F.when(null_row & (null_pick == 4), F.lit(None)).otherwise(
            F.col("sensor_type")
        ).alias("sensor_type"),
        fround(F.lit(BASE_LAT) + (_u(s, "lat") - 0.5) * 0.2, 6).alias("latitude"),
        fround(F.lit(BASE_LON) + (_u(s, "lon") - 0.5) * 0.2, 6).alias("longitude"),
        measurements.alias("measurements"),
        metadata.alias("metadata"),
    )


def rate_sensor_stream(
    spark: SparkSession, rows_per_second: int = 100, seed: int = 42
) -> DataFrame:
    """Streaming twin of the batch generator: the rate source's value
    column drives the same deterministic derivations (reference generator
    --stream mode at 1 rec/s; rowsPerSecond scales it)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(F.col("value").alias("id"))
    )
    return generate_from_ids(rate, seed=seed)
