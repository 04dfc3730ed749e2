"""st15 — stateful sessions with event-time timeout eviction.

The registered flow is value-compared against the batch gap-sessionize
oracle by test_oracle_parity; these tests pin the edge semantics on a
HAND corpus (gap boundary exactly at GAP — strict >, duplicate
timestamps, single-event users, sessions straddling the micro-batch
boundary) and the constants coupling."""

from __future__ import annotations

import os

import duckdb
import pytest

from iot_big_data_engineering_spark.streaming.pipeline import (
    _ST15_GAP_MIN,
    _ST15_ORACLE,
    st15_stateful_session_eviction,
)
from iot_big_data_engineering_spark.streaming.sessions import GAP_MIN

from .conftest import SF_SMOKE

_GAP_US = GAP_MIN * 60 * 1_000_000


def test_gap_constant_pinned():
    assert GAP_MIN == _ST15_GAP_MIN


def _run_hand_corpus(spark, tmp_path, rows):
    """rows: (event_id, ts_us, user_id). Writes a full events-shaped
    parquet so load_table sees the real schema."""
    d = tmp_path / "events_sf"
    os.makedirs(d, exist_ok=True)
    import datetime as dt

    data = [
        (
            eid,
            dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us),
            uid,
            "click",
            1.0,
            "{}",
        )
        for eid, us, uid in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in st15_stateful_session_eviction(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{d}/events.parquet/*.parquet'"
    )
    want = {
        (u, s, st.replace(tzinfo=None), en.replace(tzinfo=None), n)
        for u, s, st, en, n in con.execute(_ST15_ORACLE).fetchall()
    }
    got = {
        (u, s, st.replace(tzinfo=None), en.replace(tzinfo=None), n)
        for u, s, st, en, n in got
    }
    assert got == want
    return got


def test_gap_boundary_is_strict_and_dup_ts_merge(spark, tmp_path):
    """An inter-event gap of EXACTLY GAP stays one session (strict >,
    matching the SQL oracle); GAP + 1 µs splits; duplicate timestamps
    count as distinct events of one session; a single-event user closes
    via eviction."""
    rows = [
        # user 1: 3 events at 0, GAP (same session), then 2·GAP + 1 µs
        # after the second (new session)
        (1, 0, 1),
        (2, _GAP_US, 1),
        (3, 2 * _GAP_US + 1, 1),
        # user 2: duplicate timestamps — one session, n_events 3
        (4, 100, 2),
        (5, 100, 2),
        (6, 100 + 7, 2),
        # user 3: single event
        (7, 42, 3),
    ]
    got = _run_hand_corpus(spark, tmp_path, rows)
    by_user = {}
    for u, s, st, en, n in got:
        by_user.setdefault(u, []).append((s, n))
    assert sorted(by_user[1]) == [(1, 2), (2, 1)]  # strict > at the boundary
    assert by_user[2] == [(1, 3)]
    assert by_user[3] == [(1, 1)]


def test_sessions_straddle_microbatch_boundary(spark, tmp_path):
    """A session whose events fall on both sides of the corpus midpoint
    (the micro-batch split) must come out as ONE session — the
    cross-batch state-carry certificate in miniature."""
    hour_us = 3_600_000_000
    rows = [
        # user 1: events every GAP/2 across 4 hours — ONE session that
        # must straddle the midpoint slice
        *[(10 + i, i * (_GAP_US // 2), 1) for i in range(9)],
        # user 2: one session early, one session late (clear gap)
        (30, 0, 2),
        (31, 10 * hour_us, 2),
    ]
    got = _run_hand_corpus(spark, tmp_path, rows)
    u1 = [g for g in got if g[0] == 1]
    assert len(u1) == 1 and u1[0][4] == 9
    u2 = sorted(g[1] for g in got if g[0] == 2)
    assert u2 == [1, 2]


def test_st15_raises_on_gap_drift(spark, monkeypatch):
    import iot_big_data_engineering_spark.streaming.sessions as S

    monkeypatch.setattr(S, "GAP_MIN", GAP_MIN + 1)
    with pytest.raises(RuntimeError, match="gap diverged"):
        st15_stateful_session_eviction(spark, SF_SMOKE)


def test_st15_raises_on_empty_events(spark, tmp_path):
    d = tmp_path / "empty_sf"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    with pytest.raises(RuntimeError, match="empty events"):
        st15_stateful_session_eviction(spark, str(d))


def test_st15_state_survives_stop_restart(spark, tmp_path):
    """The restart certificate (st10's precedent, applied to the custom
    stateful operator): phase 1 streams the two real time slices and is
    STOPPED; phase 2 restarts from the same checkpoint with only the
    far-future sentinel files as new input, so every emitted eviction in
    phase 2 closes a session whose state was built BEFORE the kill —
    recovered state, recovered watermark, recovered file-source offsets.
    The assembled file-sink output must equal the batch sessionization
    oracle exactly (the parquet sink's commit log gives exactly-once
    across the restart, where a memory sink would lose phase-1 rows)."""
    import datetime as dt
    import time as _time

    from pyspark.sql import functions as F

    from iot_big_data_engineering_spark.sources.tables import load_table
    from iot_big_data_engineering_spark.streaming.sessions import (
        sessionize_with_eviction,
    )

    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts")
    b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = b.lo + (b.hi - b.lo) / 2
    gap = dt.timedelta(minutes=GAP_MIN)
    sent1 = b.hi + gap + dt.timedelta(hours=1)
    sent2 = sent1 + gap + dt.timedelta(hours=1)

    def _write(i, df):
        part = tmp_path / f"part{i}"
        df.coalesce(1).write.parquet(str(part))
        src = [f for f in os.listdir(part) if f.endswith(".parquet")]
        assert len(src) == 1
        dst = in_dir / f"{i:02d}.parquet"
        os.rename(part / src[0], dst)
        os.utime(dst, (1_700_000_000 + 10 * i,) * 2)

    _write(0, ev.filter(F.col("ts") < F.lit(mid)))
    _write(1, ev.filter(F.col("ts") >= F.lit(mid)))

    def _start(available_now):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(in_dir))
            .withWatermark("ts", "1 second")
        )
        w = (
            sessionize_with_eviction(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    # ---- phase 1: both real slices, then the kill ----
    q1 = _start(available_now=False)
    deadline = _time.monotonic() + 120.0
    while (
        sum(1 for p in q1.recentProgress if p["numInputRows"] > 0) < 2
        and _time.monotonic() < deadline
    ):
        _time.sleep(0.2)
    n1 = sum(1 for p in q1.recentProgress if p["numInputRows"] > 0)
    q1.stop()
    assert n1 >= 1, "phase 1 processed no data batch before the kill"

    # ---- phase 2: only the sentinels are new; restart from checkpoint ----
    _write(2, spark.createDataFrame([(-1, sent1)], "user_id long, ts timestamp"))
    _write(3, spark.createDataFrame([(-2, sent2)], "user_id long, ts timestamp"))
    q2 = _start(available_now=True)
    q2.awaitTermination()
    n2 = sum(1 for p in q2.recentProgress if p["numInputRows"] > 0)
    assert n2 >= 1, "phase 2 processed no data — nothing crossed the restart"

    out = spark.read.schema(
        "user_id long, session_id long, session_start timestamp, "
        "session_end timestamp, n_events long, via_timeout boolean"
    ).parquet(out_dir)
    rows = out.filter(F.col("user_id") >= 0).collect()
    n_users = ev.select("user_id").distinct().count()
    evicted = [r for r in rows if r.via_timeout]
    assert len(evicted) == n_users  # every final session closed via state
    # built before OR carried across the kill — eviction exactly once
    got = {
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in rows
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{SF_SMOKE}/events.parquet'"
    )
    want = {
        (u, s, st.replace(tzinfo=None), en.replace(tzinfo=None), n)
        for u, s, st, en, n in con.execute(_ST15_ORACLE).fetchall()
    }
    assert {
        (u, s, st.replace(tzinfo=None), en.replace(tzinfo=None), n)
        for u, s, st, en, n in got
    } == want


def test_st15_raises_on_single_timestamp_corpus(spark, tmp_path):
    """lo == hi would make the ts < mid slice empty and fail the
    >=4-data-micro-batches check with a message blaming batching; the
    guard (ADVICE r12) names the degenerate corpus instead."""
    import datetime as dt

    d = tmp_path / "one_ts_sf"
    os.makedirs(d, exist_ok=True)
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, t, i % 3, "click", 1.0, "{}") for i in range(9)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    with pytest.raises(RuntimeError, match="single timestamp"):
        st15_stateful_session_eviction(spark, str(d))


def test_update_raises_on_null_event_time():
    """astype('int64') maps NaT to INT64_MIN silently (ADVICE r12) — a
    null event time must fail loudly, not open a garbage session."""
    import pandas as pd

    from iot_big_data_engineering_spark.streaming.sessions import _update

    class _NoState:
        hasTimedOut = False
        exists = False

    pdf = pd.DataFrame(
        {"user_id": [7, 7], "ts": [pd.Timestamp("2024-01-01"), pd.NaT]}
    )
    with pytest.raises(RuntimeError, match="null event timestamp"):
        list(_update((7,), [pdf], _NoState()))
