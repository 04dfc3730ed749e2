"""IO layer tests: partitioned layout round-trip + partition pruning in
the plan, Kafka wire-format encode/decode round-trip (broker-free),
corrupt-record handling, dynamic partition overwrite idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_big_data_engineering_spark.plans.checks import plan_str
from iot_big_data_engineering_spark.sources.generator import (
    synthetic_sensor_readings,
)
from iot_big_data_engineering_spark.sources.io import (
    from_kafka_wire,
    kafka_reader_options,
    kafka_writer_options,
    read_partitioned,
    to_kafka_wire,
    write_partitioned,
)
from iot_big_data_engineering_spark.sources.sensor_view import quality_checked

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def part_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("partitioned"))
    q = quality_checked(spark, SF_SMOKE)
    write_partitioned(q, out, mode="overwrite")
    return out


def test_partition_layout_roundtrip(spark, part_path):
    q = quality_checked(spark, SF_SMOKE)
    back = read_partitioned(spark, part_path)
    assert back.count() == q.count()
    # layout columns exist and reconstruct the date
    r = back.select("year", "month", "day", "ts").first()
    assert (r.year, r.month, r.day) == (r.ts.year, r.ts.month, r.ts.day)


def test_partition_pruning_in_plan(spark, part_path):
    df = read_partitioned(spark, part_path, year=2024, month=1, day=2)
    p = plan_str(df)
    assert "PartitionFilters" in p
    # the partition predicate must appear as a partition filter, not a data filter
    pf_lines = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert any("day" in ln for ln in pf_lines), pf_lines
    # and it returns exactly that day's rows
    got = df.select(F.countDistinct(F.to_date("ts")).alias("n")).first().n
    assert got == 1


@pytest.mark.parametrize(
    "granularity,parts",
    [("weekly", ("year", "week")), ("monthly", ("year", "month"))],
)
def test_weekly_monthly_layouts(spark, tmp_path_factory, granularity, parts):
    """Reference SensorDataAnalytics.scala:83-88 selects daily/weekly/
    monthly partition layouts; the non-daily layouts must round-trip and
    partition-prune just like the daily one."""
    out = str(tmp_path_factory.mktemp(granularity))
    q = quality_checked(spark, SF_SMOKE)
    write_partitioned(q, out, mode="overwrite", granularity=granularity)
    back = read_partitioned(spark, out)
    assert back.count() == q.count()
    r = back.select(*parts, "ts").first()
    assert r.year == r.ts.year
    if granularity == "monthly":
        assert r.month == r.ts.month
        pruned = read_partitioned(spark, out, year=r.year, month=r.month)
    else:
        assert r.week == r.ts.isocalendar()[1]
        pruned = read_partitioned(spark, out, year=r.year, week=r.week)
    p = plan_str(pruned)
    pf_lines = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert any(parts[1] in ln for ln in pf_lines), pf_lines
    # exactly one partition period survives the pruned read (the smoke data
    # may span a single month, so compare distinct periods, not row counts)
    assert pruned.count() > 0
    assert pruned.select(*parts).distinct().count() == 1


def test_dynamic_overwrite_is_idempotent(spark, part_path):
    q = quality_checked(spark, SF_SMOKE)
    n_before = read_partitioned(spark, part_path).count()
    # re-write the same data with overwrite: counts must not change
    write_partitioned(q, part_path, mode="overwrite")
    assert read_partitioned(spark, part_path).count() == n_before


def test_kafka_wire_roundtrip(spark):
    readings = synthetic_sensor_readings(spark, n=500, seed=5).filter(
        F.col("ts").isNotNull()
        & F.col("sensor_id").isNotNull()
        & F.col("vehicle_id").isNotNull()
        & F.col("sensor_type").isNotNull()
    )
    wire = to_kafka_wire(readings)
    row = wire.first()
    assert "_" in row.key and row.value.startswith("{")
    back = from_kafka_wire(wire)
    assert back.count() == readings.count()
    cols = ["sensor_id", "vehicle_id", "sensor_type", "latitude", "longitude", "measurements"]
    assert readings.select(cols).exceptAll(back.select(cols)).count() == 0


def test_kafka_wire_drops_corrupt_records(spark):
    wire = spark.createDataFrame(
        [("k1", "{not json"), ("k2", None), ("k3", '{"timestamp": null}')],
        ["key", "value"],
    )
    assert from_kafka_wire(wire).count() == 0


def test_kafka_option_builders():
    r = kafka_reader_options("broker:9092")
    w = kafka_writer_options("broker:9092")
    assert r["subscribe"] == "sensor-data"
    assert w["kafka.enable.idempotence"] == "true"
    assert w["kafka.compression.type"] == "snappy"


def test_bucketed_join_is_shuffle_free(spark):
    """The 100 TB design proof for the one large-large join: orders and
    lineitem written bucketed+sorted on orderkey join with ZERO Exchange —
    the shuffle was paid once at write time (SURVEY.md §2.5)."""
    import shutil

    from iot_big_data_engineering_spark.plans.checks import assert_no_exchange
    from iot_big_data_engineering_spark.sources.io import (
        colocated_join,
        write_bucketed,
    )
    from iot_big_data_engineering_spark.sources.tables import load_table

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    write_bucketed(
        load_table(spark, SF_SMOKE, "orders"), "b_orders", "o_orderkey"
    )
    write_bucketed(
        load_table(spark, SF_SMOKE, "lineitem"), "b_lineitem", "l_orderkey"
    )
    j = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
    agg = j.groupBy("o_orderstatus").count()
    assert_no_exchange(j)
    # and the row count matches the unbucketed join
    o = load_table(spark, SF_SMOKE, "orders")
    l = load_table(spark, SF_SMOKE, "lineitem")
    assert j.count() == o.join(l, o.o_orderkey == l.l_orderkey).count()


def test_compaction_controls_file_count_and_clusters_stats(spark, tmp_path):
    """write_compacted must produce exactly N files, and range-clustering
    on event_id must yield non-overlapping per-file min/max stats — the
    property that lets parquet readers skip files on a point/range
    predicate."""
    from iot_big_data_engineering_spark.sources.io import (
        parquet_file_stats,
        write_compacted,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = str(tmp_path / "compacted")
    write_compacted(e, out, n_files=4, sort_col="event_id")

    stats = parquet_file_stats(out, "event_id")
    assert len(stats) == 4
    ordered = sorted(stats, key=lambda s: s[1])
    for (_, _, prev_max), (_, nxt_min, _) in zip(ordered, ordered[1:]):
        assert prev_max < nxt_min, "file ranges overlap — clustering failed"

    back = spark.read.parquet(out)
    assert back.count() == e.count()


def test_typed_ingest_enables_pushdown_on_json_field(spark, tmp_path):
    """The SCALE.md JSON lesson, mechanized: extracting a JSON field to a
    typed column ONCE at ingest turns every later per-row get_json_object
    parse into a pushed-down parquet predicate on a real column."""
    from iot_big_data_engineering_spark.plans.checks import (
        assert_pushed_filter,
        plan_str,
    )
    from iot_big_data_engineering_spark.sources.tables import load_table

    e = load_table(spark, SF_SMOKE, "events")
    typed_path = str(tmp_path / "events_typed")
    e.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    ).write.parquet(typed_path)

    typed = spark.read.parquet(typed_path).filter(F.col("k") > 50)
    assert_pushed_filter(typed, "k")  # parquet-level predicate

    raw = e.filter(F.get_json_object("props", "$.k").cast("int") > 50)
    assert "PushedFilters: [IsNotNull(props)" in plan_str(raw) or "get_json_object" in plan_str(raw)
    assert typed.count() == raw.count()


def test_zorder_layout_bounds_every_listed_dimension(spark, tmp_path):
    """Z-order clustering must produce per-file bounding boxes that are
    TIGHT IN BOTH dimensions simultaneously — the property single-key
    range clustering cannot give (its second dimension spans the full
    range in every file), and the reason a 2-dim box predicate skips
    files under Z-layout."""
    from iot_big_data_engineering_spark.sources.io import (
        parquet_file_stats,
        write_compacted,
        write_zordered,
    )
    from iot_big_data_engineering_spark.sources.tables import load_table

    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", F.col("value").cast("long").alias("value")
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single")
    write_zordered(e, zpath, cols=["user_id", "value"], n_files=8)
    write_compacted(e, spath, n_files=8, sort_col="user_id")

    def spans(path, col):
        stats = parquet_file_stats(path, col)
        lo = min(s[1] for s in stats)
        hi = max(s[2] for s in stats)
        full = max(hi - lo, 1)
        return [(s[2] - s[1]) / full for s in stats]

    z_user, z_value = spans(zpath, "user_id"), spans(zpath, "value")
    s_user, s_value = spans(spath, "user_id"), spans(spath, "value")

    avg = lambda xs: sum(xs) / len(xs)
    # single-key layout: tight on its sort key, much looser on the other
    # (measured ~0.06 / ~0.77 on this data)
    assert avg(s_user) < 0.3, s_user
    # Z-layout: BOTH dimensions bounded away from full-range (~0.35-0.4
    # measured), and its off-key dimension is decisively tighter than the
    # single-key layout's
    assert avg(z_user) < 0.6, z_user
    assert avg(z_value) < 0.6, z_value
    assert avg(z_value) + 0.2 < avg(s_value), (avg(z_value), avg(s_value))

    # consequence: a quarter x quarter box touches no more files under Z
    def touched(path, boxes):
        per_file: dict[str, bool] = {}
        for col, lo, hi in boxes:
            for f, mn, mx in parquet_file_stats(path, col):
                ok = not (mx < lo or mn > hi)
                per_file[f] = per_file.get(f, True) and ok
        return sum(per_file.values())

    u = [s[1] for s in parquet_file_stats(zpath, "user_id")]
    v = [s[1] for s in parquet_file_stats(zpath, "value")]
    box = [
        ("user_id", 100, 300),
        ("value", 0, 50),
    ]
    assert touched(zpath, box) <= touched(spath, box)
