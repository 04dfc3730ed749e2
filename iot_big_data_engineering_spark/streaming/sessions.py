"""Event-time session tracking with TIMEOUT EVICTION — the production
form of the custom stateful operator (``applyInPandasWithState`` +
``GroupStateTimeout.EventTimeTimeout``).

st6 carries one compact state row per key but never evicts
(``NoTimeout``); its header documents that production would bound state
to the active-key set via timeout. st15 IS that form: per-user gap
sessions where

- an in-batch gap > GAP closes the earlier session immediately (no
  future event can extend it — later events have later event times,
  and pre-watermark stragglers are dropped by the engine), and
- the watermark passing ``last_event + GAP`` fires the EVENT-TIME
  TIMEOUT callback, which emits the key's open session and REMOVES the
  state row — idle keys cost nothing once their gap horizon passes.

That eviction is what makes per-key state viable at 100 TB: without it,
state grows with every key ever seen; with it, state is bounded by the
keys active inside one gap horizon.

Determinism contract: state is integers and microsecond timestamps only
(count, start, last) — no float accumulation — and the gap walk sorts
each batch's timestamps, so emissions are a pure function of the
(batch sequence, event multiset). The registered flow replays
time-ranged slices in a pinned file order, so the driver's value hash
certifies the full state machine: open → extend → in-batch close →
timeout-evict.

Ref parity anchor: the reference has no stateful operators; this is the
§2.8 extension pattern (SURVEY.md) exercised with bounded state, the
way a real deployment would track per-device sessions.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MIN = 60
_GAP_US = GAP_MIN * 60 * 1_000_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("via_timeout", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("sess", T.LongType()),      # sessions opened so far
        T.StructField("start_us", T.LongType()),  # open session start
        T.StructField("last_us", T.LongType()),   # open session last event
        T.StructField("cnt", T.LongType()),       # open session event count
    ]
)


def _emit(user_id, closed, via_timeout) -> pd.DataFrame:
    """One output frame per call: ``closed`` is a list of
    (session_id, start_us, last_us, n_events) tuples."""
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_id": [c[0] for c in closed],
            "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
            "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
            "n_events": [c[3] for c in closed],
            "via_timeout": [via_timeout] * len(closed),
        }
    )


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    user_id = key[0]
    if state.hasTimedOut:
        # watermark passed last + GAP with no new data: the open session
        # is final — emit it and EVICT the state row
        sess, start_us, last_us, cnt = state.get
        yield _emit(user_id, [(sess, start_us, last_us, cnt)], True)
        state.remove()
        return
    # raise-don't-guess (ADVICE r12): astype('int64') silently maps NaT
    # to INT64_MIN, which would open a garbage session and diverge from
    # the oracle's NULL-ordering — a null event time is a corrupt input
    # here, not a degenerate one.
    ts_chunks = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        if pdf["ts"].isna().any():
            raise RuntimeError(
                f"sessionize: null event timestamp for user_id={user_id}"
            )
        ts_chunks.append(pdf["ts"].astype("int64") // 1000)
    if not ts_chunks:  # defensive: no data and no timeout — nothing to do
        return
    ts_sorted = sorted(int(t) for chunk in ts_chunks for t in chunk)
    if state.exists:
        sess, start_us, last_us, cnt = state.get
    else:
        sess, start_us, last_us, cnt = 0, None, None, 0
    closed = []
    for t in ts_sorted:
        if start_us is None:
            sess += 1
            start_us, last_us, cnt = t, t, 1
        elif t - last_us > _GAP_US:  # strict >, matching the SQL oracle
            closed.append((sess, start_us, last_us, cnt))
            sess += 1
            start_us, last_us, cnt = t, t, 1
        else:
            # max() is defensive: within a batch ts_sorted is ascending,
            # and across batches the time-ranged slice layout puts every
            # new t at or after the carried last — but a carried last
            # must never move BACKWARD, or later gap checks would split
            # against the wrong anchor
            last_us, cnt = max(last_us, t), cnt + 1
    state.update((sess, start_us, last_us, cnt))
    # safe by the slice layout: last >= this batch's slice floor, which
    # exceeds the watermark (= previous slice's max − delay)
    state.setTimeoutTimestamp((last_us + _GAP_US) // 1000 + 1)
    if closed:
        yield _emit(user_id, closed, False)


def sessionize_with_eviction(stream: DataFrame) -> DataFrame:
    """Streaming (user_id, ts) → closed gap-sessions, state evicted at
    the event-time timeout. ``stream`` must already carry a watermark on
    ``ts``."""
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
