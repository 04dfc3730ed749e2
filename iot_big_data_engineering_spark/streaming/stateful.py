"""Custom stateful streaming operator: per-vehicle running telemetry via
``applyInPandasWithState`` — the Structured Streaming primitive for
operators the built-in aggregations can't express (the reference had no
stateful operators; this is the extension pattern for e.g. per-device
drift tracking or cross-batch dedup at 100 TB).

State is one compact row per vehicle (count, value sum, last-seen ts);
each micro-batch updates state from its Arrow batches and emits the new
running totals. The timeout-eviction production form this header used
to promise exists now: ``streaming/sessions.py`` (st15) carries
``GroupStateTimeout.EventTimeTimeout`` and removes a key's state when
the watermark passes its gap horizon — bounding state to the
active-device set. st6 keeps ``NoTimeout`` deliberately: its contract
is lifetime running totals, where eviction would change the answer.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("running_count", T.LongType()),
        T.StructField("running_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cnt", T.LongType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    cnt, val, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        cnt += len(pdf)
        val += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((cnt, val, last_us))
    yield pd.DataFrame(
        {
            "vehicle_id": [key[0]],
            "running_count": [cnt],
            "running_value": [round(val, 6)],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_vehicle_totals(quality_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-vehicle running totals, updated each
    micro-batch (update output mode)."""
    return quality_stream.select("vehicle_id", "ts", "value").groupBy(
        "vehicle_id"
    ).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
