"""Advanced relational operators (beyond-reference engine capabilities):
sessionization, as-of join, pivot, percentiles, histograms, and the
salted-aggregation skew pattern. All oracle-checked.

Scale notes per operator are inline; the common thread: every one is
expressed so the expensive part is a single keyed shuffle (window or
aggregate), with the skew-prone cases given an explicit mitigation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..caching import track
from ..functions import hashing, vectors as V
from ..functions.rounding import fround, sql_fround
from ..registry import register
from ..sources.tables import load_table

_R = 6
SESSION_GAP_MIN = 30


# ---------------------------------------------------------------------------
# ADV1 — sessionization: gap > 30 min starts a new session per user.
# lag + cumulative-sum over an event-time window; one shuffle on user_id.
# At 100 TB the same query runs per day-partition with session stitching
# at boundaries, or as session_window() in streaming.
# ---------------------------------------------------------------------------
@register(
    "adv1_sessionize",
    oracle=f"""
WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
FROM s
GROUP BY user_id, CAST(session_id AS BIGINT)
""",
    doc="ADV1: gap-based sessionization (lag + cumsum window)",
)
def adv1_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap > SESSION_GAP_MIN * 60), 1
    ).otherwise(0)
    s = e.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        fround(
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 2
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# ADV2 — as-of join: each event matched to the latest order (of the same
# customer) at-or-before the event time. Spark lacks a native ASOF JOIN.
#
# TIME-BUCKETED candidate join (the 100 TB-safe shape). The naive form —
# equi-join on customer with ts >= orderdate, then row_number per event —
# produces events × orders-per-customer candidate rows: a heavy customer
# blows up the window input. Bucketing the time axis (calendar month here)
# bounds candidates per event to orders *in the event's own bucket* plus
# ONE precomputed carry row:
#
#   1. per (custkey, bucket): latest order in that bucket (groupBy max);
#   2. running "latest order in any EARLIER bucket" per customer via a
#      window over the per-bucket compaction (rows = customer's distinct
#      active months — thousands of× smaller than raw orders);
#   3. events equi-join on (custkey, bucket): in-bucket candidates filtered
#      to orderdate <= ts, max-reduced per event — bounded by per-bucket
#      order count, not per-customer;
#   4. as-of answer = greatest(in-bucket best, earlier-bucket carry).
#
# Match = latest o_orderdate, ties → max o_orderkey (orders pre-deduped to
# one per (custkey, orderdate) so both engines tie-break identically; the
# struct max ordering is (o_orderdate, o_orderkey) on both paths).
# ---------------------------------------------------------------------------
# Bucket-width knob shared by the bucketed joins (adv2, adv11). Finer
# buckets bound the per-(customer, bucket) candidate arrays tighter — the
# skew lever when one customer concentrates ~1e5 orders in a month — at
# the cost of more compaction rows (and, for the range join, more
# expansion rows per order). All widths are integer buckets CONSECUTIVE
# over time, which the carry window (asof) and the sequence() expansion
# (range) both require.
_BUCKETS = {
    "month": lambda c: (F.year(c) * 12 + F.month(c)).cast("int"),
    "week": lambda c: F.floor(F.unix_date(F.to_date(c)) / 7).cast("int"),
    "day": lambda c: F.unix_date(F.to_date(c)).cast("int"),
}


def _bucket_fn(bucket: str):
    try:
        return _BUCKETS[bucket]
    except KeyError:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}, got {bucket!r}")


def asof_join(
    events: DataFrame, orders: DataFrame, bucket: str = "month"
) -> DataFrame:
    """Library form of the as-of join: ``events(event_id, user_id, ts)``
    each matched to the latest order at-or-before ``ts`` from
    ``orders(o_custkey, o_orderkey, o_orderdate)``. ``bucket`` is the
    skew knob — see ``_BUCKETS``."""
    mbucket = _bucket_fn(bucket)
    e = events.select("event_id", "user_id", "ts")
    ob = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumn("bkt", mbucket(F.col("o_orderdate")))
    )
    best = F.struct("o_orderdate", "o_orderkey")

    # (2) per-bucket compaction: in-bucket orders as a sorted-comparable
    # array + running earlier-bucket carry. Event-only buckets (months where
    # a customer has events but no orders) are added with an empty array so
    # the carry is defined for every event bucket. All shuffles here are on
    # COMPACTED rows (customer × active month), not raw events/orders.
    per_bucket = ob.groupBy("o_custkey", "bkt").agg(
        F.collect_list(best).alias("ords")
    )
    ev = e.withColumn("bkt", mbucket(F.col("ts")))
    ev_keys = ev.select(
        F.col("user_id").alias("o_custkey"), "bkt"
    ).distinct()
    missing = ev_keys.join(
        per_bucket.select("o_custkey", "bkt"), ["o_custkey", "bkt"], "left_anti"
    ).withColumn(
        "ords",
        F.lit(None).cast("array<struct<o_orderdate:timestamp,o_orderkey:bigint>>"),
    )
    carry_w = (
        Window.partitionBy("o_custkey")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lookup = (
        per_bucket.unionByName(missing)
        .withColumn("prev_best", F.max(F.array_max("ords")).over(carry_w))
        .select("o_custkey", "bkt", "ords", "prev_best")
    )

    # (3) ONE event-sized hash join on (customer, bucket); the in-bucket
    # best is an array filter + array_max per row (bounded by that
    # customer's orders IN THAT MONTH — no candidate row explosion, no
    # per-event re-aggregation). Struct comparison is (o_orderdate,
    # o_orderkey) lexical — "latest date, then highest key" everywhere.
    in_best = F.array_max(
        F.filter("ords", lambda x: x["o_orderdate"] <= F.col("ts"))
    )
    return (
        ev.join(
            lookup,
            (ev.user_id == lookup.o_custkey) & (ev.bkt == lookup.bkt),
            "left",
        )
        .withColumn("asof", F.greatest(in_best, F.col("prev_best")))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("asof.o_orderkey").alias("o_orderkey"),
            F.col("asof.o_orderdate").alias("o_orderdate"),
        )
    )


@register(
    "adv2_asof_join",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    doc="ADV2: as-of join, time-bucketed candidate bound (month buckets)",
)
def adv2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderdate"
        ),
    )


# ---------------------------------------------------------------------------
# ADV3 — pivot: daily event counts, one column per event type.
# Explicit pivot values keep the plan single-pass (no distinct-scan).
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "adv3_pivot_daily_counts",
    oracle=f"""
SELECT CAST(ts AS DATE) AS d,
       {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
""",
    doc="ADV3: pivot event_type → columns of daily counts",
)
def adv3_pivot_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("d"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# ADV4 — salted aggregation: the two-stage skew pattern. Stage 1 aggregates
# on (key, salt) — a hot key's rows spread over 8 reducers — stage 2 merges
# the partials. Result is identical to the direct aggregation (the oracle
# IS the direct form), which is the point: a pure-plan mitigation.
# ---------------------------------------------------------------------------
_N_SALT = 8


@register(
    "adv4_salted_agg",
    oracle=f"""
SELECT event_type,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value,
       max(value) AS max_value
FROM events
GROUP BY event_type
""",
    doc="ADV4: two-stage salted aggregation ≡ direct groupBy (skew pattern)",
)
def adv4_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    partial = (
        e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALT)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("psum"),
            F.max("value").alias("pmax"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        fround(F.sum("psum").cast("double"), 2).alias("total_value"),
        F.max("pmax").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# ADV5 — histogram / binning: fixed-width value buckets per event type.
# ---------------------------------------------------------------------------
@register(
    "adv5_value_histogram",
    oracle="""
SELECT event_type,
       CAST(floor(value / 20.0) AS BIGINT) AS bucket,
       count(*) AS n
FROM events
GROUP BY event_type, bucket
""",
    doc="ADV5: fixed-width histogram of value per event type",
)
def adv5_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.floor(F.col("value") / 20.0).cast("bigint").alias("bucket"),
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# ADV6 — exact percentiles (interpolated), per event type. Spark
# `percentile` and DuckDB `quantile_cont` both use linear interpolation
# over the sorted values → identical doubles (rounded defensively).
# At 100 TB swap for approx_percentile (t-digest) — provided as the
# library twin adv6b below (registry-retired r16; band-tested).
# ---------------------------------------------------------------------------
@register(
    "adv6_percentiles",
    oracle=f"""
SELECT event_type,
       round(quantile_cont(value, 0.25), {_R}) AS p25,
       round(quantile_cont(value, 0.50), {_R}) AS p50,
       round(quantile_cont(value, 0.75), {_R}) AS p75,
       round(quantile_cont(value, 0.95), {_R}) AS p95
FROM events
GROUP BY event_type
""",
    doc="ADV6: exact interpolated percentiles per event type",
)
def adv6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        fround(F.percentile("value", 0.25), _R).alias("p25"),
        fround(F.percentile("value", 0.50), _R).alias("p50"),
        fround(F.percentile("value", 0.75), _R).alias("p75"),
        fround(F.percentile("value", 0.95), _R).alias("p95"),
    )


# adv6b was RETIRED from the registry r16 per the r14 saturation ruling
# (registry._RETIRED): it is the approx/sketch twin of adv6 above, whose
# exact form stays gated. The capability remains as this library
# function — the sketch-within-rank-band contract (every flag TRUE:
# approx_percentile's rank error 1/accuracy = 1e-4 must keep the
# estimate inside the exact [p−0.01, p+0.01] quantile band) is pinned by
# tests/test_approx_quality.py.
def adv6b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def within_band(p: float, delta: float = 0.01) -> F.Column:
        ap = F.approx_percentile("value", F.lit(p), F.lit(10000))
        lo = F.percentile("value", p - delta)
        hi = F.percentile("value", p + delta)
        return (ap >= lo) & (ap <= hi)

    return e.groupBy("event_type").agg(
        fround(F.percentile("value", 0.50), _R).alias("p50"),
        fround(F.percentile("value", 0.95), _R).alias("p95"),
        within_band(0.50).alias("p50_within_band"),
        within_band(0.95).alias("p95_within_band"),
    )


# ---------------------------------------------------------------------------
# W3 — reporting-gap detection (the lag/lead family; the reference's
# liveness monitor A11 generalized per-entity). Epoch seconds carry the
# microsecond fraction on both engines (Spark cast(ts as double) == DuckDB
# EXTRACT(EPOCH FROM ts)), so deltas are bit-comparable after rounding.
# ---------------------------------------------------------------------------
@register(
    "w3_event_gaps",
    oracle="""
WITH g AS (
  SELECT user_id,
         EXTRACT(EPOCH FROM ts)
           - lag(EXTRACT(EPOCH FROM ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events WHERE user_id < 50
)
SELECT user_id,
       count(gap_s) AS gap_count,
       round(max(gap_s), 6) AS max_gap_s,
       round(CAST(sum(gap_s) AS DOUBLE) / count(gap_s), 6) AS avg_gap_s,
       CAST(count(CASE WHEN gap_s > 3600 THEN 1 END) AS BIGINT) AS gaps_over_1h
FROM g
WHERE gap_s IS NOT NULL
GROUP BY user_id
""",
    doc="W3: per-entity reporting gaps via lag() over event time",
)
def w3_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("double")
    g = e.select(
        "user_id",
        (epoch - F.lag(epoch).over(w)).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap_s").alias("gap_count"),
        fround(F.max("gap_s"), 6).alias("max_gap_s"),
        fround(F.sum("gap_s").cast("double") / F.count("gap_s"), 6).alias("avg_gap_s"),
        F.count(F.when(F.col("gap_s") > 3600, 1)).alias("gaps_over_1h"),
    )


# ---------------------------------------------------------------------------
# ADV8 — deterministic hash sampling. TABLESAMPLE is non-deterministic
# across engines/seeds, so the portable form is a multiplicative-hash
# predicate on the key: keeps ~p% of rows, identical rows on every engine,
# and pushes down to the scan like any filter. At 100 TB this is the
# cheap-profiling primitive: stats on a 1% slice without a full pass.
# The membership hash is the shared overflow-exact chunked Knuth multiply
# (functions/hashing.py) — the r5-r7 naive o_orderkey*K form wraps/throws/
# promotes divergently across engines for keys >= ~3.5e9 (VERDICT r7
# demand #3 fixed dp3/mm7; adv8 carried the same wart, same fix).
# ---------------------------------------------------------------------------
_SAMPLE_HASH_SQL = hashing.knuth_hash32_sql("o_orderkey")
@register(
    "adv8_hash_sample_stats",
    oracle=f"""
SELECT count(*) AS sample_rows,
       count(*) * 10 AS estimated_total_rows,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             / count(*), 6) AS avg_totalprice,
       count(DISTINCT o_custkey) AS sample_customers
FROM orders
WHERE {_SAMPLE_HASH_SQL} % 100 < 10
""",
    doc="ADV8: deterministic 10% hash sample + scale-up estimate",
)
def adv8_hash_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.pmod(hashing.knuth_hash32(F.col("o_orderkey")), 100) < 10)
        .agg(
            F.count("*").alias("sample_rows"),
            (F.count("*") * 10).alias("estimated_total_rows"),
            fround(
                F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_totalprice"),
            F.countDistinct("o_custkey").alias("sample_customers"),
        )
    )


# ---------------------------------------------------------------------------
# ADV9 — latest record per key (dedup-by-recency): the upsert/SCD
# materialization every append-only pipeline needs. max_by on a total
# order (ts, event_id) is a single partial+final aggregate — cheaper than
# the window row_number form at scale (no per-key sort, just a running
# max), and AQE handles key skew.
# ---------------------------------------------------------------------------
@register(
    "adv9_latest_per_key",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts, event_type, round(value, 6) AS value
FROM ranked WHERE rn = 1
""",
    doc="ADV9: latest event per user via max_by on (ts, event_id)",
)
def adv9_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    latest = F.max_by(
        F.struct("event_id", "ts", "event_type", "value"),
        F.struct("ts", "event_id"),
    )
    return e.groupBy("user_id").agg(latest.alias("r")).select(
        "user_id",
        F.col("r.event_id").alias("event_id"),
        F.col("r.ts").alias("ts"),
        F.col("r.event_type").alias("event_type"),
        fround("r.value", 6).alias("value"),
    )


# ---------------------------------------------------------------------------
# ADV10 — unpivot/melt (wide → long): the inverse of adv3's pivot. Spark's
# native unpivot (Expand under the hood — no shuffle, no join) turns the
# daily-analytics metric columns into (metric, value) rows, the shape
# metric stores and plotting layers want. Oracle = portable UNION ALL.
# ---------------------------------------------------------------------------
@register(
    "adv10_unpivot_daily_metrics",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type,
         count(*) AS record_count,
         count(DISTINCT user_id) AS unique_users
  FROM events GROUP BY 1, 2
)
SELECT d, event_type, 'record_count' AS metric, record_count AS value FROM daily
UNION ALL
SELECT d, event_type, 'unique_users', unique_users FROM daily
""",
    doc="ADV10: unpivot wide daily metrics into (metric, value) rows",
)
def adv10_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(
        F.count("*").alias("record_count"),
        F.countDistinct("user_id").alias("unique_users"),
    )
    return daily.unpivot(
        ["d", "event_type"],
        ["record_count", "unique_users"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# ADV11 — range join: each event against the orders of the same customer
# whose 30-day activity window [o_orderdate, o_orderdate+30d) contains the
# event time. A raw inequality join is O(events × orders-per-customer);
# the scale shape mirrors adv2: each order EXPANDS to the <=2 month
# buckets its window intersects (sequence+explode on the small side),
# per-(customer, bucket) orders compact to an array, and events take ONE
# equi-join on (customer, bucket) with per-row array filtering — candidate
# work bounded per customer-month, one event-sized shuffle total.
# ---------------------------------------------------------------------------
def range_join_active_orders(
    events: DataFrame,
    orders: DataFrame,
    bucket: str = "month",
    window_days: int = 30,
) -> DataFrame:
    """Library form of the range join: per event, the orders of the same
    customer whose ``[o_orderdate, o_orderdate + window_days)`` activity
    window contains ``ts``. ``bucket`` is the skew knob (see ``_BUCKETS``);
    finer buckets shrink the per-(customer, bucket) arrays but expand each
    order into more bucket rows (~window_days/bucket_width + 1)."""
    mbucket = _bucket_fn(bucket)
    e = events.select("event_id", "user_id", "ts")
    o = orders.select("o_custkey", "o_orderkey", "o_orderdate")
    # expand each order to the buckets its half-open window covers. The
    # last covered instant is orderdate+window−ε; for a timestamp orderdate
    # with nonzero time-of-day that instant can fall one calendar bucket
    # past day orderdate+window−1, so the expansion upper bound is
    # orderdate+window — at most one superfluous bucket row, and the exact
    # per-row interval filter below discards any overreach.
    ob = o.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                mbucket(F.col("o_orderdate")),
                mbucket(
                    F.col("o_orderdate")
                    + F.expr(f"INTERVAL {window_days} DAYS")
                ),
            )
        ),
    )
    per_bucket = ob.groupBy("o_custkey", "bkt").agg(
        F.collect_list(F.struct("o_orderdate", "o_orderkey")).alias("ords")
    )
    ev = e.withColumn("bkt", mbucket(F.col("ts")))
    active = F.filter(
        "ords",
        lambda x: (F.col("ts") >= x["o_orderdate"])
        & (F.col("ts") < x["o_orderdate"] + F.expr(f"INTERVAL {window_days} DAYS")),
    )
    return (
        ev.join(
            per_bucket,
            (ev.user_id == per_bucket.o_custkey) & (ev.bkt == per_bucket.bkt),
            "left",
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(F.size(active), F.lit(0)).cast("bigint").alias(
                "n_active_orders"
            ),
            F.array_max(
                F.transform(active, lambda x: x["o_orderkey"])
            ).alias("latest_active_order"),
        )
    )


@register(
    "adv11_range_join",
    oracle="""
SELECT e.event_id, e.user_id, e.ts,
       count(o.o_orderkey) AS n_active_orders,
       max(o.o_orderkey) AS latest_active_order
FROM events e
LEFT JOIN orders o
  ON o.o_custkey = e.user_id
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 30 DAY
GROUP BY 1, 2, 3
""",
    doc="ADV11: bucketed range join (orders active within 30 days)",
)
def adv11_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return range_join_active_orders(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders"),
    )


# ---------------------------------------------------------------------------
# DQ1 — key-skew audit: the pre-flight diagnostic you run BEFORE a
# shuffle-heavy join/agg at 100 TB to decide whether the skew mitigations
# (adv4's salting, adv2/adv11's bucket knob, AQE skew-join) are needed, and
# with what salt factor. One pass builds per-key frequencies (map-side
# partial agg, the shuffle carries one row per key); the profile over those
# frequencies (key count, max, mean, hottest key, hot-key share) is a
# second tiny aggregate over |keys| rows. The hottest key is chosen with a
# full deterministic tiebreak (max count, then min key id).
# ---------------------------------------------------------------------------
@register(
    "dq1_key_skew_audit",
    oracle=f"""
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
p AS (
  SELECT count(*) AS n_keys,
         CAST(sum(n) AS BIGINT) AS total_rows,
         max(n) AS max_count,
         round(avg(n), {_R}) AS avg_count,
         round(max(n) / avg(n), {_R}) AS skew_ratio
  FROM c
),
h AS (
  SELECT user_id AS hot_key, n AS hot_count
  FROM c ORDER BY n DESC, user_id LIMIT 1
)
SELECT n_keys, total_rows, max_count, avg_count, skew_ratio,
       hot_key, round(hot_count / total_rows, {_R}) AS hot_key_share
FROM p, h
""",
    doc="DQ1: per-key frequency skew profile (feeds the salting knob)",
)
def dq1_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    c = track(c.persist())  # both branches below read the per-key counts
    profile = c.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_count"),
        fround(F.avg("n"), _R).alias("avg_count"),
        fround(F.max("n").cast("double") / F.avg("n"), _R).alias("skew_ratio"),
    )
    hot = (
        c.orderBy(F.col("n").desc(), "user_id")
        .limit(1)
        .select(F.col("user_id").alias("hot_key"), F.col("n").alias("hot_count"))
    )
    return (
        profile.join(hot)  # 1 row × 1 row
        .select(
            "n_keys",
            "total_rows",
            "max_count",
            "avg_count",
            "skew_ratio",
            "hot_key",
            fround(
                F.col("hot_count").cast("double") / F.col("total_rows"), _R
            ).alias("hot_key_share"),
        )
    )


# ---------------------------------------------------------------------------
# DQ2 — join-cardinality pre-flight: before materializing a large equi-
# join at 100 TB, compute its EXACT output size and skew profile from the
# two per-key count tables alone. For an inner equi-join the output row
# count is Σ_k |L_k|·|R_k| — two map-side-combined key aggregates plus a
# |keys|-sized join, orders of magnitude cheaper than running the join
# (the fact rows never move). The same per-key products expose the
# dominant key (the one AQE skew-split or salting must handle) before any
# executor commits to it. Companion to dq1 (single-side skew audit).
# Overflow bound: per-key products and their sum stay in int64 up to
# ~3·10⁹ rows per key PER SIDE (3e9² ≈ int64 max) — a single key holding
# billions of rows on both sides is already the catastrophic-join signal
# this query exists to flag, and ANSI mode fails loudly rather than
# wrapping if it is ever exceeded.
# ---------------------------------------------------------------------------
@register(
    "dq2_join_size_preflight",
    oracle=f"""
WITH l AS (SELECT user_id AS k, count(*) AS nl FROM events GROUP BY 1),
r AS (SELECT o_custkey AS k, count(*) AS nr FROM orders GROUP BY 1),
m AS (SELECT l.k, nl, nr, nl * nr AS prod FROM l JOIN r USING (k)),
p AS (
  SELECT count(*) AS n_join_keys,
         CAST(sum(prod) AS BIGINT) AS join_rows,
         max(prod) AS max_key_rows
  FROM m
),
h AS (SELECT k AS top_key FROM m ORDER BY prod DESC, k LIMIT 1),
t AS (
  SELECT (SELECT CAST(sum(nl) AS BIGINT) FROM l) AS left_rows,
         (SELECT CAST(sum(nr) AS BIGINT) FROM r) AS right_rows
)
SELECT left_rows, right_rows, n_join_keys, join_rows, max_key_rows,
       top_key,
       round(max_key_rows / join_rows, {_R}) AS top_key_share,
       round(join_rows / left_rows, {_R}) AS expansion_factor
FROM p, h, t
""",
    doc="DQ2: exact equi-join output size + dominant key from per-key counts",
)
def dq2_join_size_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the per-key count tables persist: each raw table is scanned exactly
    # ONCE (plan-tested) — the matched-key branch AND the totals branch
    # both reuse the cached |keys|-sized counts
    l = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count("*").alias("nl"))
        .persist()
    )
    l = track(l)
    r = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("nr"))
        .persist()
    )
    r = track(r)
    m = l.join(r, "k").select("k", "nl", "nr", (F.col("nl") * F.col("nr")).alias("prod"))
    m = track(m.persist())  # profile + top-key branches both read it
    profile = m.agg(
        F.count("*").alias("n_join_keys"),
        F.sum("prod").alias("join_rows"),
        F.max("prod").alias("max_key_rows"),
    )
    top = m.orderBy(F.col("prod").desc(), "k").limit(1).select(
        F.col("k").alias("top_key")
    )
    totals = l.agg(F.sum("nl").alias("left_rows")).join(
        r.agg(F.sum("nr").alias("right_rows"))
    )
    return (
        profile.join(top).join(totals)  # three 1-row inputs
        .select(
            "left_rows",
            "right_rows",
            "n_join_keys",
            "join_rows",
            "max_key_rows",
            "top_key",
            fround(
                F.col("max_key_rows").cast("double") / F.col("join_rows"), _R
            ).alias("top_key_share"),
            fround(
                F.col("join_rows").cast("double") / F.col("left_rows"), _R
            ).alias("expansion_factor"),
        )
    )


# ---------------------------------------------------------------------------
# DQ3 — referential-integrity audit: orphan-key counts across the star
# schema's foreign keys, the data-quality gate a pipeline runs before
# trusting any join (an orphan rate > 0 silently drops rows from every
# inner join downstream). Each relation is ONE left join against the
# dimension's DISTINCT keys followed by ONE aggregate counting rows and
# unmatched non-null keys together — only keys move, and every edge is a
# single job (the anti-join + separate-counts form paid two). Output is
# one row per audited edge with total/orphan counts and orphan share.
# ---------------------------------------------------------------------------
_DQ3_EDGES = [
    # (child table, child key, parent table, parent key)
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "dq3_referential_audit",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{c}.{ck} -> {p}.{pk}' AS edge,
       (SELECT count(*) FROM {c}) AS child_rows,
       (SELECT count(*) FROM {c}
        WHERE {ck} IS NOT NULL
          AND {ck} NOT IN (SELECT {pk} FROM {p})) AS orphan_rows,
       CASE WHEN (SELECT count(*) FROM {c}) > 0
            THEN round((SELECT count(*) FROM {c}
                        WHERE {ck} IS NOT NULL
                          AND {ck} NOT IN (SELECT {pk} FROM {p}))
                       / CAST((SELECT count(*) FROM {c}) AS DOUBLE), 6)
       END AS orphan_share
"""
        for c, ck, p, pk in _DQ3_EDGES
    ),
    doc="DQ3: orphan-key audit over every star-schema foreign key",
)
def dq3_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The "shared persisted fact projection" rewrite (r16/r17's deferred
    # 100 TB candidate) was measured r18 and is WRONG AT EVERY SCALE, so
    # the per-edge form below stands permanently: the three lineitem
    # edges each scan a DIFFERENT single key column (l_orderkey /
    # l_suppkey / l_partkey), so under parquet column pruning the three
    # "passes" together read each column chunk exactly once — the same
    # bytes one shared 3-column scan reads — while the shared persist
    # adds a cache materialization and serializes the three otherwise
    # independent branches behind it. Measured r18 on a 278 MB 32-split
    # lineitem (above any broadcast/split threshold): per-edge
    # 1.97/1.56 s vs shared 2.13/1.88 s, values identical; same ordering
    # under autoBroadcastJoinThreshold=-1 at sf0.1 (1.45/1.37 vs
    # 1.50/1.56). The r16 "3× fact I/O" framing ignored column pruning.
    out = None
    for c, ck, p, pk in _DQ3_EDGES:
        child = load_table(spark, sf_dir, c).select(ck)
        parent_keys = (
            load_table(spark, sf_dir, p)
            .select(F.col(pk).alias(ck))
            .distinct()
            .withColumn("_present", F.lit(1))
        )
        # null child keys join to nothing but are NOT orphans — count
        # only non-null unmatched keys
        orphan = F.col(ck).isNotNull() & F.col("_present").isNull()
        row = (
            child.join(parent_keys, ck, "left")
            .agg(
                F.count("*").alias("child_rows"),
                F.count(F.when(orphan, 1)).alias("orphan_rows"),
            )
            .select(
                F.lit(f"{c}.{ck} -> {p}.{pk}").alias("edge"),
                "child_rows",
                "orphan_rows",
                # empty-child guard: both counts are non-NULL, so the
                # ratio would raise ANSI DIVIDE_BY_ZERO on an empty
                # table (the m10/m18 hazard class, r11 audit) — the
                # share is unknowable there, export NULL on both engines
                F.when(
                    F.col("child_rows") > 0,
                    fround(
                        F.col("orphan_rows").cast("double")
                        / F.col("child_rows"),
                        _R,
                    ),
                ).alias("orphan_share"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# ADV12 — robust outlier profile: median/MAD per group, the
# outlier gate that mean/stddev z-scores cannot provide on heavy-tailed
# telemetry (one hot vehicle shifts a mean; it cannot shift a median).
# Three passes over the fact — median, MAD, then the count of rows
# beyond 3·MAD — each a map-side-combinable aggregate, with the tiny
# per-group statistics (bounded event_type enum) broadcast back between
# passes; deliberately NOT a per-group window, which would sort each
# group in a single task at 100 TB.
# ---------------------------------------------------------------------------
_ADV12_K = 3.0


@register(
    "adv12_robust_outliers",
    oracle=f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - med.m), 0.5) AS mad,
         min(med.m) AS m
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       round(mad.m, {_R}) AS median_value,
       round(mad.mad, {_R}) AS mad,
       count(*) AS n,
       count(CASE WHEN abs(e.value - mad.m) > {_ADV12_K} * mad.mad
             THEN 1 END) AS n_outliers,
       round(count(CASE WHEN abs(e.value - mad.m) > {_ADV12_K} * mad.mad
                   THEN 1 END) / CAST(count(*) AS DOUBLE), {_R})
         AS outlier_share
FROM events e JOIN mad USING (event_type)
GROUP BY e.event_type, mad.m, mad.mad
""",
    doc="ADV12: median/MAD robust outlier profile per event type",
)
def adv12_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.percentile("value", 0.5).alias("m"))
    mad = (
        e.join(F.broadcast(med), "event_type")  # |event types| rows
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("m")), 0.5).alias("mad"),
            F.min("m").alias("m"),
        )
    )
    far = F.abs(F.col("value") - F.col("m")) > _ADV12_K * F.col("mad")
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "m", "mad")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(far, 1)).alias("n_outliers"),
        )
        .select(
            "event_type",
            fround("m", _R).alias("median_value"),
            fround("mad", _R).alias("mad"),
            "n",
            "n_outliers",
            fround(
                F.col("n_outliers").cast("double") / F.col("n"), _R
            ).alias("outlier_share"),
        )
    )


# ---------------------------------------------------------------------------
# ADV13 — salted replicate JOIN: the join-side counterpart of adv4's
# two-stage salted aggregation. When a large-large equi-join has a few
# hot keys, the hot keys' rows all land in the same shuffle partitions
# and one straggler task dominates the stage. The manual cure: salt the
# FACT side with pmod(hash(unique_id), S) and replicate the DIM side S×
# (crossJoin with a size-S salt range), joining on (key, salt) — each
# hot key now spreads over S tasks at the cost of an S× dim blow-up.
# First choice at 100 TB is AQE's runtime skew-join split
# (spark.sql.adaptive.skewJoin.enabled splits oversized partitions
# after seeing shuffle stats); manual salting remains the tool when the
# skewed join feeds a same-key aggregation AQE can't re-split, or when
# the dim side must stay un-broadcast (too big) yet replicates cheaply
# (S× a PER-KEY table ≪ fact size). dq1's skew audit supplies S.
#
# Certificate of transparency: the oracle is the PLAIN join + agg —
# salting must not change a single row. A salt/key mismatch (fact
# salt range ≠ replicated range, hash on a non-unique column, dropped
# salt in the join condition) duplicates or drops fact rows and flips
# counts/sums through the hash gate.
# ---------------------------------------------------------------------------
@register(
    "adv13_salted_join",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day, e.event_type,
       count(*) AS n,
       round(CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE), 2)
         AS total_value
FROM events e JOIN firsts f ON e.user_id = f.user_id
GROUP BY 1, 2
""",
    doc="ADV13: salted replicate join ≡ plain join (skew-mitigation transparency)",
)
def adv13_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.to_date("ts").alias("d")
    )
    firsts = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    # fact side: salt from the row-unique event_id — NEVER from the join
    # key (hot keys must spread, and a non-unique hash would correlate
    # salt with key and re-concentrate them)
    fact = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALT)))
    # dim side: replicate each per-user row across the full salt range
    dim = firsts.join(
        spark.range(_N_SALT).select(F.col("id").alias("salt")), how="cross"
    )
    joined = fact.join(dim, ["user_id", "salt"])
    return joined.groupBy(
        F.col("cohort_day").cast("timestamp").alias("cohort_day"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        fround(
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 2
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# DQ5 — table profile: the per-column data-profiling pre-flight every
# large ingest runs before trusting a new drop (null counts, exact
# cardinality, min/max) in long format, one row per column. Numeric
# min/max surface as DOUBLE, string/timestamp min/max as VARCHAR, the
# other pair NULL — a stable wide-ish schema any profiler UI can read.
#
# Scale shape: one UNION leg per column, each leg a COLUMN-PRUNED scan
# (ReadSchema carries exactly one column) feeding a partial-agged
# count/min/max plus one exact-distinct shuffle on that column's
# values. Six pruned scans of one column each ≈ one full scan of the
# six profiled columns, and each distinct is its own independent
# key-space — deliberately NOT a single multi-countDistinct aggregate,
# whose Expand node would multiply every input row by the number of
# profiled columns before the shuffle. At 100 TB the exact distinct is
# the anchor; the sketch twin (approx_count_distinct / a18's HLL
# contract) is the serving path when ±2% suffices.
# ---------------------------------------------------------------------------
_DQ5_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
_DQ5_STR = ["o_orderstatus", "o_orderpriority", "o_orderdate"]


def _dq5_leg_sql(col: str, numeric: bool) -> str:
    if numeric:
        mins = (
            f"CAST(min({col}) AS DOUBLE) AS num_min,"
            f" CAST(max({col}) AS DOUBLE) AS num_max,"
            f" CAST(NULL AS VARCHAR) AS str_min,"
            f" CAST(NULL AS VARCHAR) AS str_max"
        )
    else:
        mins = (
            f"CAST(NULL AS DOUBLE) AS num_min,"
            f" CAST(NULL AS DOUBLE) AS num_max,"
            f" CAST(min({col}) AS VARCHAR) AS str_min,"
            f" CAST(max({col}) AS VARCHAR) AS str_max"
        )
    return (
        f"SELECT '{col}' AS column_name,"
        f" count(*) AS n_rows,"
        f" count(*) - count({col}) AS n_null,"
        f" count(DISTINCT {col}) AS n_distinct, {mins}"
        f" FROM orders"
    )


@register(
    "dq5_table_profile",
    oracle=" UNION ALL ".join(
        [_dq5_leg_sql(c, True) for c in _DQ5_NUM]
        + [_dq5_leg_sql(c, False) for c in _DQ5_STR]
    ),
    doc=(
        "DQ5: per-column table profile — nulls, exact cardinality, "
        "typed min/max, one pruned scan leg per column"
    ),
)
def dq5_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    legs = []
    for col in _DQ5_NUM + _DQ5_STR:
        numeric = col in _DQ5_NUM
        if numeric:
            mins = [
                F.min(col).cast("double").alias("num_min"),
                F.max(col).cast("double").alias("num_max"),
                F.min(F.lit(None).cast("string")).alias("str_min"),
                F.max(F.lit(None).cast("string")).alias("str_max"),
            ]
        else:
            mins = [
                F.min(F.lit(None).cast("double")).alias("num_min"),
                F.max(F.lit(None).cast("double")).alias("num_max"),
                F.min(col).cast("string").alias("str_min"),
                F.max(col).cast("string").alias("str_max"),
            ]
        legs.append(
            o.select(col).agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
                F.countDistinct(col).alias("n_distinct"),
                *mins,
            ).select(F.lit(col).alias("column_name"), "*")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# ADV14 — SCD2 snapshot merge: reconcile a full dimension snapshot into
# a type-2 history (valid_from / valid_to / is_current) — the lakehouse
# MERGE INTO shape every warehouse dimension load runs nightly.
# Deterministic fixture derived from `customer` via the shared Knuth
# stream h = h32(c_custkey) % 10: the existing history holds every
# customer except h=3 (those arrive NEW in the snapshot); the snapshot
# holds every customer except h=2 (those went missing → full-snapshot
# semantics close them); h=0 rows arrive with a changed balance
# (+100.00). All four merge branches are therefore provably non-empty:
#   current  — matched, value equal: the open row is carried unchanged
#   closed   — matched, value changed: old version closed at T1
#   updated  — matched, value changed: new open version from T1
#   retired  — in history only: closed at T1 (full-snapshot semantics)
#   inserted — in snapshot only: new open version from T1
# The registered output is the FULL merged history (~1.1x |customers|
# rows), so the driver's value hash certifies every branch row-for-row,
# not just the branch counts.
#
# Scale shape: ONE full-outer sort-merge join co-partitioned on the
# dimension key — exactly the shuffle Delta/Iceberg MERGE plans — then
# a map-side conditional explode emits 1 or 2 history rows per key; no
# window, no second shuffle, nothing collected. At 100 TB the open/
# closed split is the partition key of the history table (is_current,
# valid_to), so serving reads prune to the open slice; the snapshot
# side joins at |dim| rows, never |fact|.
# ---------------------------------------------------------------------------
_ADV14_H_SQL = f"({hashing.knuth_hash32_sql('c_custkey')} % 10)"
_ADV14_T0 = "2023-01-01"
_ADV14_T1 = "2024-01-01"

# module-level so st12 (the streaming maintenance twin) can register with
# the SAME oracle verbatim — the a22/st11 pattern
_ADV14_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_acctbal, {_ADV14_H_SQL} AS h FROM customer
),
d AS (SELECT c_custkey, c_acctbal AS bal_old FROM c WHERE h <> 3),
s AS (
  SELECT c_custkey,
         CASE WHEN h = 0 THEN round(c_acctbal + 100.0, 2)
              ELSE c_acctbal END AS bal_new
  FROM c WHERE h <> 2
),
m AS (
  SELECT coalesce(d.c_custkey, s.c_custkey) AS c_custkey,
         d.c_custkey IS NOT NULL AS in_dim,
         s.c_custkey IS NOT NULL AS in_snap,
         d.bal_old, s.bal_new
  FROM d FULL OUTER JOIN s ON d.c_custkey = s.c_custkey
)
SELECT c_custkey, bal_old AS acctbal,
       CAST('{_ADV14_T0}' AS TIMESTAMP) AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to,
       TRUE AS is_current, 'current' AS scd_action
FROM m WHERE in_dim AND in_snap AND bal_old IS NOT DISTINCT FROM bal_new
UNION ALL
SELECT c_custkey, bal_old, CAST('{_ADV14_T0}' AS TIMESTAMP),
       CAST('{_ADV14_T1}' AS TIMESTAMP), FALSE, 'closed'
FROM m WHERE in_dim AND in_snap AND bal_old IS DISTINCT FROM bal_new
UNION ALL
SELECT c_custkey, bal_new, CAST('{_ADV14_T1}' AS TIMESTAMP),
       CAST(NULL AS TIMESTAMP), TRUE, 'updated'
FROM m WHERE in_dim AND in_snap AND bal_old IS DISTINCT FROM bal_new
UNION ALL
SELECT c_custkey, bal_old, CAST('{_ADV14_T0}' AS TIMESTAMP),
       CAST('{_ADV14_T1}' AS TIMESTAMP), FALSE, 'retired'
FROM m WHERE in_dim AND NOT in_snap
UNION ALL
SELECT c_custkey, bal_new, CAST('{_ADV14_T1}' AS TIMESTAMP),
       CAST(NULL AS TIMESTAMP), TRUE, 'inserted'
FROM m WHERE in_snap AND NOT in_dim
"""


def scd2_inputs(spark: SparkSession, sf_dir: str):
    """The deterministic (dim, snapshot) fixture shared by adv14 and its
    streaming twin st12: history = customers with h != 3, snapshot =
    customers with h != 2, h = 0 rows carry a +100.00 balance change
    (h = shared Knuth stream mod 10)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.pmod(hashing.knuth_hash32(F.col("c_custkey")), F.lit(10)).alias("h"),
    )
    dim = c.filter(F.col("h") != 3).select(
        "c_custkey",
        F.col("c_acctbal").alias("bal_old"),
        F.lit(True).alias("in_dim"),
    )
    snap = c.filter(F.col("h") != 2).select(
        "c_custkey",
        F.when(
            # fround, NOT F.round: the oracle's round() is floor-rewritten
            # by registry._rewrite_rounds, so the Spark side must evaluate
            # the identical floor(x*100+0.5)/100 double expression or the
            # one F.round in the engine sits on a hash-compared column
            # (VERDICT r8 What's-wrong #2)
            F.col("h") == 0, fround(F.col("c_acctbal") + F.lit(100.0), 2)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("bal_new"),
        F.lit(True).alias("in_snap"),
    )
    return dim, snap


def scd2_history_rows(m: DataFrame) -> DataFrame:
    """Explode a reconciled frame (c_custkey, in_dim, in_snap, bal_old,
    bal_new) into SCD2 history rows. Map-side only — the caller owns the
    join that produced ``m``; adv14 feeds it the whole full-outer join,
    st12 feeds it per-micro-batch left joins plus the end-of-snapshot
    retired remainder, so both paths share the branch expressions."""
    t0 = F.lit(_ADV14_T0).cast("timestamp")
    t1 = F.lit(_ADV14_T1).cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")

    def ver(bal, vf, vt, cur, action):
        return F.struct(
            bal.alias("acctbal"),
            vf.alias("valid_from"),
            vt.alias("valid_to"),
            F.lit(cur).alias("is_current"),
            F.lit(action).alias("scd_action"),
        )

    both = F.col("in_dim") & F.col("in_snap")
    # NULL-SAFE change detection (IS DISTINCT FROM in the oracle): with a
    # plain !=, a key whose balance is NULL on both sides makes `changed`
    # NULL — Spark's when-chain would then fall through to 'current'
    # while the oracle's WHERE drops the row entirely, a silent
    # cross-engine divergence on any dimension with nullable attributes
    changed = both & ~F.col("bal_old").eqNullSafe(F.col("bal_new"))
    versions = (
        F.when(changed, F.array(
            ver(F.col("bal_old"), t0, t1, False, "closed"),
            ver(F.col("bal_new"), t1, null_ts, True, "updated"),
        ))
        .when(both, F.array(
            ver(F.col("bal_old"), t0, null_ts, True, "current"),
        ))
        .when(F.col("in_dim"), F.array(
            ver(F.col("bal_old"), t0, t1, False, "retired"),
        ))
        .otherwise(F.array(
            ver(F.col("bal_new"), t1, null_ts, True, "inserted"),
        ))
    )
    return m.select(
        "c_custkey", F.explode(versions).alias("v")
    ).select("c_custkey", "v.*")


@register(
    "adv14_scd2_snapshot_merge",
    oracle=_ADV14_ORACLE,
    doc=(
        "ADV14: SCD2 snapshot merge — type-2 dimension history via one "
        "full-outer join + conditional explode; all five branches live"
    ),
)
def adv14_scd2_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim, snap = scd2_inputs(spark, sf_dir)
    m = dim.join(snap, "c_custkey", "full_outer").select(
        "c_custkey",
        F.coalesce("in_dim", F.lit(False)).alias("in_dim"),
        F.coalesce("in_snap", F.lit(False)).alias("in_snap"),
        "bal_old",
        "bal_new",
    )
    return scd2_history_rows(m)


# ---------------------------------------------------------------------------
# DQ6 — SNAPSHOT DRIFT AUDIT: dq5's profile, differenced across two
# snapshots — the pre-flight every scheduled ingest runs before
# promoting a new drop ("did today's extract silently change shape?").
# Null-rate drift and cardinality drift are THE two cheap detectors for
# upstream schema rot (a column going silently NULL, an id column
# collapsing to a constant, a fan-out join duplicating keys). The two
# "snapshots" here are the deterministic halves of `orders` under the
# shared Knuth stream (h = h32(o_orderkey) % 2) — disjoint,
# reproducible on both engines, and statistically exchangeable, so the
# expected verdict is "no drift" and any flipped flag is a real defect
# in the profiling algebra, not data noise.
#
# The hash-compared surface is exact: per-side row/null counts and
# exact distinct cardinalities (int64), null rates in integer ppm
# (guarded // division), and the two drift booleans are integer
# comparisons — null-rate delta > 10,000 ppm (1 point) or a 2× exact
# cardinality ratio.
#
# Scale shape: one COLUMN-PRUNED scan leg per profiled column
# (ReadSchema = that column + the key), each a TWO-LEVEL aggregate:
# groupBy (value, side) with map-side combine, then plain conditional
# sums over the compact group table — per-side cardinality is the
# surviving group count, so there is NO distinct aggregate anywhere
# (a single agg with two countDistinct(when(...)) plans through an
# Expand that triples every input row before the shuffle; verified
# absent in the executed plan). Both snapshots profile in one scan per
# column rather than two. dq5's leg-independence rationale applies: no
# row is multiplied by the number of profiled columns. At 100 TB, real
# snapshots are partition-pruned paths (S5) instead of hash halves —
# the algebra is unchanged.
#
# Ref parity anchor: the reference's quality gate counts per-category
# completeness and compares against fixed thresholds
# (src/spark/streaming/SensorDataProcessor.scala:75-96); dq6 is the
# same threshold-verdict shape computed pairwise across snapshots.
# ---------------------------------------------------------------------------
_DQ6_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
             "o_orderpriority"]
_DQ6_NULL_PPM = 10_000  # 1-point null-rate delta flags drift
_DQ6_H_SQL = f"({hashing.knuth_hash32_sql('o_orderkey')} % 2)"


def _dq6_leg_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       CAST(coalesce(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_rows_a,
       CAST(coalesce(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_rows_b,
       CAST(coalesce(sum(CASE WHEN h = 0 AND {col} IS NULL THEN 1 ELSE 0
                         END), 0) AS BIGINT) AS n_null_a,
       CAST(coalesce(sum(CASE WHEN h = 1 AND {col} IS NULL THEN 1 ELSE 0
                         END), 0) AS BIGINT) AS n_null_b,
       CAST(count(DISTINCT CASE WHEN h = 0 THEN {col} END) AS BIGINT)
         AS n_distinct_a,
       CAST(count(DISTINCT CASE WHEN h = 1 THEN {col} END) AS BIGINT)
         AS n_distinct_b
FROM (SELECT *, {_DQ6_H_SQL} AS h FROM orders)
"""


_DQ6_ORACLE = f"""
WITH p AS ({" UNION ALL ".join(_dq6_leg_sql(c) for c in _DQ6_COLS)}),
r AS (
  SELECT *,
         CASE WHEN n_rows_a > 0
              THEN (n_null_a * 1000000) // n_rows_a ELSE 0 END AS null_ppm_a,
         CASE WHEN n_rows_b > 0
              THEN (n_null_b * 1000000) // n_rows_b ELSE 0 END AS null_ppm_b
  FROM p
)
SELECT column_name, n_rows_a, n_rows_b, n_null_a, n_null_b,
       n_distinct_a, n_distinct_b,
       CAST(null_ppm_a AS BIGINT) AS null_ppm_a,
       CAST(null_ppm_b AS BIGINT) AS null_ppm_b,
       (abs(null_ppm_a - null_ppm_b) > {_DQ6_NULL_PPM}
        OR n_distinct_a * 2 < n_distinct_b
        OR n_distinct_b * 2 < n_distinct_a) AS drifted
FROM r
ORDER BY column_name
"""


@register(
    "dq6_snapshot_drift",
    oracle=_DQ6_ORACLE,
    doc=(
        "DQ6: cross-snapshot drift audit — per-column null-ppm and "
        "exact-cardinality deltas between two hash snapshots, integer "
        "drift verdicts; one pruned conditional-agg leg per column"
    ),
)
def dq6_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return snapshot_drift(load_table(spark, sf_dir, "orders"))


def snapshot_drift(
    orders: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """dq6 core over any orders-shaped frame — separated for tests and
    the generator-scale data-bound sweep."""
    o = orders.withColumn(
        "h", F.pmod(hashing.knuth_hash32(F.col("o_orderkey")), F.lit(2))
    )
    legs = []
    for col in cols or _DQ6_COLS:
        a, b = F.col("h") == 0, F.col("h") == 1
        nn = F.col(col).isNotNull()
        # two-level aggregate instead of countDistinct(when(...)): a
        # single agg with TWO distinct expressions plans through an
        # Expand node (every input row multiplied 3x before the
        # shuffle); pre-grouping on (value, side) gives one map-side-
        # combined shuffle on compact keys and turns every statistic —
        # including the exact per-side cardinality (= surviving group
        # count) — into a plain conditional sum. Expand-free, verified
        # in the executed plan.
        g = o.select(col, "h").groupBy(col, "h").agg(
            F.count("*").alias("cnt")
        )
        legs.append(
            g.agg(
                # coalesce: the global agg on an EMPTY table emits one
                # row of NULL sums; a profile row must read 0, and the
                # oracle coalesces identically
                F.coalesce(F.sum(F.when(a, F.col("cnt"))), F.lit(0))
                .cast("bigint")
                .alias("n_rows_a"),
                F.coalesce(F.sum(F.when(b, F.col("cnt"))), F.lit(0))
                .cast("bigint")
                .alias("n_rows_b"),
                F.coalesce(F.sum(F.when(a & ~nn, F.col("cnt"))), F.lit(0))
                .cast("bigint")
                .alias("n_null_a"),
                F.coalesce(F.sum(F.when(b & ~nn, F.col("cnt"))), F.lit(0))
                .cast("bigint")
                .alias("n_null_b"),
                F.coalesce(F.sum((a & nn).cast("int")), F.lit(0))
                .cast("bigint")
                .alias("n_distinct_a"),
                F.coalesce(F.sum((b & nn).cast("int")), F.lit(0))
                .cast("bigint")
                .alias("n_distinct_b"),
            ).select(F.lit(col).alias("column_name"), "*")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    ppm_a = F.when(
        F.col("n_rows_a") > 0,
        F.expr("CAST((n_null_a * 1000000) DIV n_rows_a AS BIGINT)"),
    ).otherwise(F.lit(0).cast("bigint"))
    ppm_b = F.when(
        F.col("n_rows_b") > 0,
        F.expr("CAST((n_null_b * 1000000) DIV n_rows_b AS BIGINT)"),
    ).otherwise(F.lit(0).cast("bigint"))
    out = out.withColumn("null_ppm_a", ppm_a).withColumn("null_ppm_b", ppm_b)
    return out.select(
        "column_name", "n_rows_a", "n_rows_b", "n_null_a", "n_null_b",
        "n_distinct_a", "n_distinct_b", "null_ppm_a", "null_ppm_b",
        (
            (F.abs(F.col("null_ppm_a") - F.col("null_ppm_b")) > _DQ6_NULL_PPM)
            | (F.col("n_distinct_a") * 2 < F.col("n_distinct_b"))
            | (F.col("n_distinct_b") * 2 < F.col("n_distinct_a"))
        ).alias("drifted"),
    ).orderBy("column_name")


# ---------------------------------------------------------------------------
# ADV15 — FIXED-POINT INTEGER PAGERANK over the customer↔supplier
# trading graph (3 damped power iterations, d = 0.85) — the iterative-
# algorithm representative: entity-importance ranking over a bipartite
# relationship graph (who trades with well-connected partners), the
# same computational shape as label propagation, HITS, or embedding
# propagation over a lakehouse graph.
#
# The float problem, solved structurally: PageRank's per-node sum of
# neighbor contributions is the canonical nondeterministic double
# reduction. adv15 runs the ENTIRE recursion in scaled int64
# arithmetic — ranks start at S = 10¹², contributions are exact floor
# divisions r DIV deg, damping is (85·Σ) DIV 100 — so every engine
# computes bit-identical ranks in ANY reduction order, and the compared
# surface needs no rounding at all. Overflow headroom: total mass ≈
# N·S ≈ 1.6e16 at sf0.1; 85·Σ ≤ 1.4e18 < 2^63 — and the bound is now
# ENFORCED, not argued: pagerank_fixed_point counts nodes and raises
# past _PAGERANK_MAX_NODES (≈108k at S=10^12 — r9 ADVICE). Past the
# bound, this repo's default-ANSI Spark 4 sessions would raise a
# generic mid-job ArithmeticException (non-ANSI deployments would wrap
# SILENTLY while DuckDB raises — the worse, divergence-shaped failure);
# the guard converts both into one named pre-flight error.
# The graph is made undirected (both edge directions), so every node
# has out-degree ≥ 1 and the dangling-mass correction drops out.
#
# Plan shape at 100 TB: the edge list (distinct cust-supp pairs) builds
# once from the lineitem⋈orders join and persists WITH its out-degree
# column — each iteration is then one shuffle join (ranks ⋈ edges on
# src) + one aggregate (on dst) with map-side partials; 3 iterations =
# 3 bounded stages, no lineage blow-up (production depth passes
# checkpoint_every to truncate lineage every k iterations —
# value-identical by construction, property-tested). Rank state is 2 int64 columns —
# the minimal shuffle payload.
#
# Ref parity anchor: the reference ranks entities by aggregated
# connectivity-weighted activity (vehicle analytics,
# src/spark/batch/SensorDataAnalytics.scala:158-172; vehicle top-k,
# src/api/sensor_api.py:323-335); adv15 is that ranking where
# importance recurses through the join graph.
# ---------------------------------------------------------------------------
_ADV15_S = 1_000_000_000_000  # rank scale: 10^12 fixed-point units
_ADV15_BASE = (15 * _ADV15_S) // 100  # (1-d)·S with d = 0.85
_ADV15_ITERS = 3
_ADV15_TOPN = 20


def _adv15_iter_sql(prev: str, out: str, base: int = _ADV15_BASE) -> str:
    return f"""{out} AS (
  SELECT e.dst AS node,
         {base} + (85 * sum(r.r // e.deg)) // 100 AS r
  FROM edges_d e JOIN {prev} r ON e.src = r.node
  GROUP BY e.dst
)"""


@register(
    "adv15_pagerank",
    oracle=f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM e0
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM e0
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
edges_d AS (
  SELECT edges.src, edges.dst, deg.deg
  FROM edges JOIN deg ON edges.src = deg.src
),
r0 AS (SELECT src AS node, CAST({_ADV15_S} AS BIGINT) AS r FROM deg),
{_adv15_iter_sql("r0", "r1")},
{_adv15_iter_sql("r1", "r2")},
{_adv15_iter_sql("r2", "r3")}
SELECT node, CAST(node % 2 AS INTEGER) AS is_supplier,
       CAST(r AS BIGINT) AS rank_fp
FROM r3
ORDER BY rank_fp DESC, node ASC
LIMIT {_ADV15_TOPN}
""",
    doc=(
        "ADV15: 3-iteration damped PageRank over the customer↔supplier "
        "graph in exact fixed-point int64 — order-free, unrounded"
    ),
)
def adv15_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # persisted: both branches of the undirected-edge union consume e0,
    # and the deg / edges_d cache builds each materialize that union —
    # without this the join+distinct executes up to 4× (r9 self-review)
    e0 = track(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist()
    )
    edges = e0.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionAll(
        e0.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    ranked = pagerank_fixed_point(edges, iters=_ADV15_ITERS)
    return (
        ranked.select(
            "node",
            (F.col("node") % 2).cast("int").alias("is_supplier"),
            F.col("r").cast("bigint").alias("rank_fp"),
        )
        .orderBy(F.col("rank_fp").desc(), F.col("node").asc())
        .limit(_ADV15_TOPN)
    )


# Hard node-count ceiling for the int64 fixed-point arithmetic: the
# per-node in-sum intermediate is 85·sum(contrib), and sum(contrib)
# into one node is bounded by the conserved total rank mass ≤ N·S, so
# 85·N·S must stay below 2^63. At S = 10^12 that is N ≤ 108,495 nodes —
# sf0.1's ~16k customer+supplier nodes fit with 6× headroom, sf1's
# ~160k would NOT (r9 ADVICE). What happens past the bound depends on
# session config: default-ANSI Spark 4 raises a generic mid-job
# ArithmeticException; non-ANSI deployments wrap silently while DuckDB
# raises — a silent cross-engine divergence. The guard below turns
# both into one named pre-flight failure; the production form past the
# ceiling drops S to 10^9 (N ≤ 1.08e8) or moves to double ranks
# outside the hash-compared surface.
_PAGERANK_MAX_NODES = (2**63 - 1) // (85 * _ADV15_S)


def _check_pagerank_overflow(n_nodes: int, scale: int = _ADV15_S) -> None:
    """Raise before the first iteration if 85·N·S can exceed int64 —
    separated so the bound is unit-testable without a 10^5-node graph."""
    if 85 * n_nodes * scale > 2**63 - 1:
        raise RuntimeError(
            f"pagerank_fixed_point: {n_nodes} nodes at scale {scale} can "
            f"overflow int64 (85·N·S = {85 * n_nodes * scale} > 2^63−1); "
            f"max safe nodes at this scale: {(2**63 - 1) // (85 * scale)}. "
            "Lower the scale (e.g. 10^9) for larger graphs."
        )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    checkpoint_every: int | None = None,
    scale: int = _ADV15_S,
) -> DataFrame:
    """Damped power iteration over an (src, dst) edge frame in scaled
    int64 arithmetic — returns (node, r). Every node must appear as a
    src (give the graph both edge directions for undirected inputs):
    that guarantees out-degree ≥ 1 and a defined in-rank for every
    node. Separated so tests can replay hand graphs exactly.

    ``checkpoint_every``: localCheckpoint() the rank frame every k
    iterations — production depth (tens of iterations) would otherwise
    accumulate one join+aggregate of lineage per iteration until plan
    compilation dominates. Checkpointing changes the plan only, never
    the int64 values (property-tested in test_plans); the
    registered 3-iteration adv15 form runs unchecked.

    ``scale``: rank fixed-point units (default 10^12, adv15's exact
    form). The int64 ceiling is 85·N·scale < 2^63, so lowering the
    scale trades rank precision for node capacity — scale=10^9 admits
    ~1.08e8 nodes (the adv15b production form for sf ≥ 1 graphs). The
    arithmetic is the identical integer expression at every scale; the
    default reproduces adv15's registered values bit-for-bit."""
    if checkpoint_every is not None and checkpoint_every < 1:
        # 0 would ZeroDivisionError at the modulo below, and a caller
        # meaning "never" should pass None (round-10 review finding #4)
        raise ValueError(
            f"checkpoint_every must be >= 1 or None, got {checkpoint_every}"
        )
    # deg is |nodes| rows and has TWO consumers (the edge annotation and
    # the rank init) — without the persist the rank-init lineage re-scans
    # the base tables (r9 plan audit)
    deg = track(
        edges.groupBy("src")
        .agg(F.count("*").cast("bigint").alias("deg"))
        .persist()
    )
    edges_d = track(
        edges.join(deg, "src").persist()  # reused every iteration
    )
    # one cheap count on the persisted deg (materialized regardless by
    # the first iteration) turns a silent sf≥1 int64 wrap into a loud
    # pre-iteration failure (r9 ADVICE)
    _check_pagerank_overflow(deg.count(), scale)
    base = (15 * scale) // 100  # (1-d)·scale with d = 0.85
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(scale).cast("bigint").alias("r"),
    )
    for i in range(iters):
        ranks = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select(
                "dst", F.expr("r DIV deg").alias("contrib")
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(base).cast("bigint")
                    + F.expr("85 * sum(contrib) DIV 100")
                ).alias("r")
            )
            .select(F.col("dst").alias("node"), F.col("r").cast("bigint"))
        )
        if (
            checkpoint_every is not None
            and (i + 1) % checkpoint_every == 0
            and (i + 1) < iters
        ):
            ranks = ranks.localCheckpoint()  # truncate lineage, keep values
    return ranks


# ---------------------------------------------------------------------------
# ADV15B — PAGERANK AT PRODUCTION NODE SCALE (adv15 past the int64
# ceiling, VERDICT r10 Next #7): adv15's exact 10^12 fixed point caps
# the graph at _PAGERANK_MAX_NODES ≈ 108k nodes (sf0.1 fits, sf1's
# ~160k does NOT — the guard fails loudly there). The production form
# drops the rank scale to 10^9: the int64 ceiling 85·N·S < 2^63 then
# admits N ≤ ~1.08e8 nodes — every TPC-H sf through ~600 (1e8
# customers+suppliers) — while the arithmetic stays the IDENTICAL
# integer expression (init = S, contrib = r DIV deg, next =
# 0.15·S + 85·Σ DIV 100), so the compared surface remains exact int64
# on both engines: no rounding, no float, no cross-engine hazard. The
# price is rank granularity (3 fewer significant digits), which a
# top-20 surface cannot observe unless two nodes' exact ranks differ
# by < 10^-9 of total mass.
#
# Plan shape: identical to adv15 (persisted degree-annotated edges,
# one join+aggregate per iteration); only literals differ.
#
# Ref parity anchor: same as adv15
# (src/spark/batch/SensorDataAnalytics.scala:158-172,
# src/api/sensor_api.py:323-335).
# ---------------------------------------------------------------------------
_ADV15B_S = 1_000_000_000  # rank scale: 10^9 — N ≤ (2^63−1)/(85·10^9)
_ADV15B_BASE = (15 * _ADV15B_S) // 100


def _custsupp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The undirected customer↔supplier edge list (adv15's graph),
    rebuilt here so adv15's r10-gated registered body stays
    byte-identical (rotation hygiene): both direction branches consume
    one persisted distinct pair relation."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e0 = track(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist()
    )
    return e0.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionAll(
        e0.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )


@register(
    "adv15b_pagerank_scale9",
    oracle=f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM e0
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM e0
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
edges_d AS (
  SELECT edges.src, edges.dst, deg.deg
  FROM edges JOIN deg ON edges.src = deg.src
),
r0 AS (SELECT src AS node, CAST({_ADV15B_S} AS BIGINT) AS r FROM deg),
{_adv15_iter_sql("r0", "r1", _ADV15B_BASE)},
{_adv15_iter_sql("r1", "r2", _ADV15B_BASE)},
{_adv15_iter_sql("r2", "r3", _ADV15B_BASE)}
SELECT node, CAST(node % 2 AS INTEGER) AS is_supplier,
       CAST(r AS BIGINT) AS rank_fp
FROM r3
ORDER BY rank_fp DESC, node ASC
LIMIT {_ADV15_TOPN}
""",
    doc=(
        "ADV15B: adv15's damped PageRank at the 10^9 production rank "
        "scale — int64-safe to ~1.08e8 nodes, exact on both engines"
    ),
)
def adv15b_pagerank_scale9(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = pagerank_fixed_point(
        _custsupp_edges(spark, sf_dir), iters=_ADV15_ITERS, scale=_ADV15B_S
    )
    return (
        ranked.select(
            "node",
            (F.col("node") % 2).cast("int").alias("is_supplier"),
            F.col("r").cast("bigint").alias("rank_fp"),
        )
        .orderBy(F.col("rank_fp").desc(), F.col("node").asc())
        .limit(_ADV15_TOPN)
    )


# ---------------------------------------------------------------------------
# DQ7 — DECLARATIVE EXPECTATION AUDIT over the orders table: the
# Great-Expectations/dbt-test primitive — a fixed suite of data-quality
# expectations evaluated in one job, each reporting exact row counts, a
# failed-ppm and a pass verdict. Two of the six expectations FAIL on
# the shipped data by design (the price ceiling and the date horizon),
# so the fail path is non-vacuous on the gate surface itself.
#
# Plan shape at 100 TB — three legs, each the cheapest plan for its
# expectation class:
# - all four ROW-LEVEL expectations (not-null, range, date horizon,
#   domain) ride ONE ungrouped aggregate over ONE column-pruned scan —
#   adding a row expectation costs one conditional sum, never a scan;
# - uniqueness is the two-level key aggregate (groupBy key → count,
#   then one conditional sum — dq6's no-Expand discipline);
# - referential integrity is an anti-join against the distinct FK
#   domain (dq3's machinery), counted, never materialized.
# Every reported number is an exact int64; ppm is floor division.
#
# NULL semantics (Great-Expectations convention, identical on both
# engines): NULLs fail their dedicated not-null expectation and pass
# range/date checks (comparison → NULL → CASE ELSE 0); the domain check
# fails NULLs explicitly (OR IS NULL) so a silent NULL priority cannot
# read as in-domain.
#
# Ref parity anchor: the reference validates typed records against
# fixed constraints before processing (quality gates,
# src/spark/streaming/SensorDataProcessor.scala:75-102); dq7 is that
# gate generalized to a declarative multi-expectation audit report.
# ---------------------------------------------------------------------------
_DQ7_PRICE_MAX = 300_000.0
_DQ7_DATE_LO = "1995-01-01 00:00:00"
_DQ7_DATE_HI = "2001-01-01 00:00:00"
_DQ7_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
_DQ7_PRI_SQL = ", ".join(f"'{p}'" for p in _DQ7_PRIORITIES)


@register(
    "dq7_expectation_audit",
    oracle=f"""
WITH rowchk AS (
  -- coalesce on every fail counter: sum() over ZERO rows is NULL in SQL
  -- while the Spark side's cnt() coalesces to 0 — an empty orders table
  -- must audit as 0-failed/passed on both engines (r13 empty-corpus
  -- audit; fix landed with dq7's r14 window seat)
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END),
                       0) AS BIGINT) AS f_null,
         CAST(coalesce(sum(CASE WHEN o_totalprice < 0.0
                         OR o_totalprice > {_DQ7_PRICE_MAX} THEN 1 ELSE 0
                  END), 0) AS BIGINT) AS f_range,
         CAST(coalesce(sum(CASE WHEN o_orderdate < TIMESTAMP '{_DQ7_DATE_LO}'
                         OR o_orderdate >= TIMESTAMP '{_DQ7_DATE_HI}'
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS f_date,
         CAST(coalesce(sum(CASE WHEN o_orderpriority IS NULL
                         OR o_orderpriority NOT IN ({_DQ7_PRI_SQL})
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS f_dom
  FROM orders
),
uniq AS (
  SELECT CAST(coalesce(sum(CASE WHEN c >= 2 THEN c ELSE 0 END), 0)
              AS BIGINT) AS f
  FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY o_orderkey)
),
ref AS (
  SELECT CAST(count(*) AS BIGINT) AS f
  FROM orders o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
),
suite AS (
  SELECT 'orderkey_not_null' AS expectation, n_rows, f_null AS n_failed
  FROM rowchk
  UNION ALL
  SELECT 'totalprice_in_range', n_rows, f_range FROM rowchk
  UNION ALL
  SELECT 'orderdate_in_horizon', n_rows, f_date FROM rowchk
  UNION ALL
  SELECT 'priority_in_domain', n_rows, f_dom FROM rowchk
  UNION ALL
  SELECT 'orderkey_unique', rowchk.n_rows, uniq.f
  FROM rowchk CROSS JOIN uniq
  UNION ALL
  SELECT 'custkey_references_customer', rowchk.n_rows, ref.f
  FROM rowchk CROSS JOIN ref
)
SELECT expectation, n_rows, n_failed,
       CAST(CASE WHEN n_rows > 0 THEN n_failed * 1000000 // n_rows
                 ELSE 0 END AS BIGINT) AS failed_ppm,
       n_failed = 0 AS passed
FROM suite
""",
    doc=(
        "DQ7: declarative 6-expectation data-quality audit over orders "
        "— exact counts, failed-ppm, pass verdicts; fail path "
        "non-vacuous on shipped data"
    ),
)
def dq7_expectation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return expectation_audit(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def expectation_audit(o: DataFrame, c: DataFrame) -> DataFrame:
    """dq7 core — separated so tests can plant NULLs, duplicates and
    orphans and check every expectation's fail accounting."""
    lo = F.lit(_DQ7_DATE_LO).cast("timestamp")
    hi = F.lit(_DQ7_DATE_HI).cast("timestamp")

    def cnt(cond: Column) -> Column:
        # coalesce: an ungrouped sum over an EMPTY table is NULL, which
        # would leak NULL n_failed / NULL passed where the suite's
        # convention is 0 / true (dq6's empty-table hardening; r9
        # self-review). The oracle coalesces identically.
        return F.coalesce(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
        ).cast("bigint")

    rowchk = track(
        o.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            cnt(F.col("o_orderkey").isNull()).alias("f_null"),
            cnt(
                (F.col("o_totalprice") < 0.0)
                | (F.col("o_totalprice") > _DQ7_PRICE_MAX)
            ).alias("f_range"),
            cnt(
                (F.col("o_orderdate") < lo) | (F.col("o_orderdate") >= hi)
            ).alias("f_date"),
            cnt(
                F.col("o_orderpriority").isNull()
                | ~F.col("o_orderpriority").isin(_DQ7_PRIORITIES)
            ).alias("f_dom"),
        ).persist()  # six consumers: one per suite row
    )
    uniq = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("f")
        )
    )
    ref = (
        o.join(
            c.select("c_custkey").distinct(),
            o["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").cast("bigint").alias("f"))
    )

    def row_leg(name: str, col: str) -> DataFrame:
        return rowchk.select(
            F.lit(name).alias("expectation"),
            "n_rows",
            F.col(col).alias("n_failed"),
        )

    def scalar_leg(name: str, f: DataFrame) -> DataFrame:
        return rowchk.crossJoin(F.broadcast(f)).select(
            F.lit(name).alias("expectation"),
            "n_rows",
            F.col("f").alias("n_failed"),
        )

    suite = (
        row_leg("orderkey_not_null", "f_null")
        .unionAll(row_leg("totalprice_in_range", "f_range"))
        .unionAll(row_leg("orderdate_in_horizon", "f_date"))
        .unionAll(row_leg("priority_in_domain", "f_dom"))
        .unionAll(scalar_leg("orderkey_unique", uniq))
        .unionAll(scalar_leg("custkey_references_customer", ref))
    )
    return suite.select(
        "expectation",
        "n_rows",
        "n_failed",
        F.expr(
            "CAST(CASE WHEN n_rows > 0 THEN n_failed * 1000000 DIV n_rows "
            "ELSE 0 END AS BIGINT)"
        ).alias("failed_ppm"),
        (F.col("n_failed") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# DQ8 — EMBEDDING-COLUMN QUALITY AUDIT: the vector-table preflight the
# dq family was missing — dq5 profiles scalar columns, dq8 profiles the
# `array<float>` column every ANN/dedup consumer (s-family, d6, d9)
# assumes well-formed: per label, NULL vectors, NULL components,
# dimension spread, exact-zero norms (undefined cosine), non-finite
# components (NaN/Inf poison every distance), and the norm range. Run
# it BEFORE building an index; a wrong-dim or NaN vector found later
# costs a rebuild.
#
# Exactness contract: every counter is an exact int64 conditional sum;
# the only doubles are norm_min/norm_max — per-vector norms through the
# shared sequential-fold dot (V.sql_dot ≡ F.aggregate, float→double
# cast exact), reduced by MIN/MAX (order-independent, unlike sums) and
# floor-rounded 6 dp. The norm legs see only WELL-FORMED vectors: NULL
# vectors, vectors with NULL components and vectors with non-finite
# components are each counted (INDEPENDENTLY — a [NULL, NaN] vector
# lands in both buckets) and EXCLUDED from n2; zero-LENGTH vectors are
# pinned to norm 0.0 explicitly (Spark's fold over [] is 0.0, DuckDB's
# list_sum is NULL) so they count as zero-norm on both engines
# — NaN propagates through min/max differently per engine, and Spark's
# three-valued exists()/sum-over-NULL semantics diverge from DuckDB's
# NULL-dropping list_filter, so every malformed class is classified by
# explicit NULL-proof predicates (x IS NOT NULL AND ...) that evaluate
# identically on both engines (round-10 review finding #1).
#
# Plan shape at 100 TB: one map-only projection computing (dim,
# nullcomp, bad, norm²) per row inside the scan stage, then ONE hash
# aggregate on |labels| keys with map-side partials — the dq6/t16
# counter→rollup shape; nothing vector-sized shuffles (the arrays are
# reduced to four scalars before the exchange).
#
# Ref parity anchor: the reference validates typed payload fields
# before processing and reports per-category quality counters
# (src/spark/streaming/SensorDataProcessor.scala:75-102,
# src/spark/batch/SensorDataAnalytics.scala:177-196); dq8 is that gate
# for the embeddings extension's vector payload.
# ---------------------------------------------------------------------------
@register(
    "dq8_embedding_audit",
    oracle=f"""
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
),
p AS (
  SELECT label,
         CASE WHEN v IS NULL THEN NULL
              ELSE CAST(len(v) AS INTEGER) END AS dim,
         CASE WHEN v IS NULL THEN false
              ELSE len(list_filter(v, x -> x IS NULL)) > 0
         END AS nullcomp,
         CASE WHEN v IS NULL THEN false
              ELSE len(list_filter(v, x -> x IS NOT NULL
                                           AND (isnan(x) OR isinf(x)))) > 0
         END AS bad,
         CASE WHEN v IS NOT NULL
                AND len(list_filter(v, x -> x IS NULL)) = 0
                AND len(list_filter(v, x -> x IS NOT NULL
                                            AND (isnan(x) OR isinf(x)))) = 0
              THEN CASE WHEN len(v) = 0 THEN 0.0
                        ELSE {V.sql_dot("v", "v")} END
         END AS n2
  FROM e
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN dim IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_vec,
       CAST(count(DISTINCT dim) AS BIGINT) AS n_dims_distinct,
       CAST(min(dim) AS INTEGER) AS dim_min,
       CAST(max(dim) AS INTEGER) AS dim_max,
       CAST(sum(CASE WHEN nullcomp THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_component,
       CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonfinite,
       CAST(sum(CASE WHEN n2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_norm,
       round(min(sqrt(n2)), 6) AS norm_min,
       round(max(sqrt(n2)), 6) AS norm_max
FROM p GROUP BY label
""",
    doc=(
        "DQ8: per-label embedding-column audit — NULL vectors/components, "
        "dim spread, zero norms, non-finite components, norm range; the "
        "ANN-index preflight"
    ),
)
def dq8_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", V.to_double("embedding").alias("v")
    )
    return embedding_audit(e)


def embedding_audit(e: DataFrame) -> DataFrame:
    """dq8 core over any (label, v: array<double>) frame — separated so
    tests can plant NULL / NULL-component / zero / NaN / Inf /
    ragged-dim vectors. All classifier predicates are NULL-proof
    (never three-valued): exists() runs x IS NOT NULL AND ... so a
    NULL component cannot turn a boolean into NULL on one engine and
    false on the other."""
    v = F.col("v")
    nullcomp = F.when(v.isNull(), F.lit(False)).otherwise(
        F.exists(v, lambda x: x.isNull())
    )
    nonfinite = F.when(v.isNull(), F.lit(False)).otherwise(
        F.exists(
            v,
            lambda x: x.isNotNull()
            & (F.isnan(x) | (F.abs(x) == F.lit(float("inf")))),
        )
    )
    p = e.select(
        "label",
        F.when(v.isNull(), F.lit(None)).otherwise(F.size(v)).alias("dim"),
        nullcomp.alias("nullcomp"),
        nonfinite.alias("bad"),
        # zero-length vectors: the fold over [] is 0.0 on Spark but
        # list_sum over [] is NULL on DuckDB — pin ||[]||^2 = 0.0
        # explicitly on both engines so an empty vector counts as
        # zero-norm instead of diverging (round-10 review #2b)
        F.when(
            v.isNotNull() & ~nullcomp & ~nonfinite,
            F.when(F.size(v) == 0, F.lit(0.0)).otherwise(V.dot(v, v)),
        ).alias("n2"),
    )
    return p.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.sum(F.when(F.col("dim").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_vec"),
        F.countDistinct("dim").cast("bigint").alias("n_dims_distinct"),
        F.min("dim").cast("int").alias("dim_min"),
        F.max("dim").cast("int").alias("dim_max"),
        F.sum(F.when(F.col("nullcomp"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_component"),
        F.sum(F.when(F.col("bad"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonfinite"),
        F.sum(F.when(F.col("n2") == 0.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_norm"),
        fround(F.min(F.sqrt(F.col("n2"))), 6).alias("norm_min"),
        fround(F.max(F.sqrt(F.col("n2"))), 6).alias("norm_max"),
    )


# ---------------------------------------------------------------------------
# DQ9 — POPULATION STABILITY INDEX drift (shipped library-tested r15
# with its oracle constant ready per the r14 saturation ruling, the
# dp18/u5 discipline; REGISTERED r17 into the seat freed by the
# a7_summary_report_approx retirement — the recorded plan): dq6
# audits per-COLUMN drift (null ppm, cardinality) between two snapshot
# halves; this op audits per-DISTRIBUTION drift of a numeric measure —
# the classic model-monitoring PSI over equi-depth decile bins, the
# standard "did the data shift under my model/filter?" preflight a
# training-data pipeline runs between corpus snapshots.
#
# Semantics: events are split into two deterministic halves by the
# same overflow-exact Knuth-mod-2 TECHNIQUE dq6 uses for its snapshot
# split — applied here to event_id over events (dq6 splits o_orderkey
# over orders; the halves are per-audit, not shared — ADVICE r15 #1).
# Per event_type, decile edges are EXACT percentiles of side A (rounded
# to the shared 6-dp grid so the bin comparisons see identical doubles
# on both engines); every row of BOTH sides is binned by edges-passed
# count; per-bin proportions are Laplace-smoothed ((cnt+1)/(n+10), so
# an empty bin never divides by zero or ln(0) — ANSI-safe by
# construction); PSI = Σ_bins (pA−pB)·ln(pA/pB), folded in bin order
# (Spark F.aggregate over the bin-sorted array, DuckDB list_reduce over
# list(term ORDER BY bin) — the dp17 ordered-fold discipline, so the
# 10-term double sum is bit-identical). Verdict thresholds are the
# conventional 0.1 / 0.25 (compared on the ROUNDED psi so the CASE
# cannot flip across engines). Types with no baseline rows are excluded
# by contract: drift is measured AGAINST the baseline, and a type that
# is new in B has no baseline distribution to drift from — surfacing
# new types is a cardinality audit's job, not a PSI's. NULL event_type
# is excluded up front alongside NULL value (ADVICE r15 #3: Spark's
# orderBy is ASC NULLS FIRST while DuckDB's is NULLS LAST — a NULL-type
# group would emit an identical row at a DIFFERENT position, breaking
# any order-sensitive gate comparison; a NULL type is a data-hygiene
# finding, not a distribution).
#
# 100 TB: pass 1 is one groupBy(event_type) aggregate over side A —
# EXACT percentile is the compared surface (the adv6/adv6b twin
# discipline: exact for the oracle-checked output; the documented scale
# path swaps approx_percentile(accuracy=10000) into the same plan shape
# when |group| no longer fits an exact-percentile buffer, identical to
# how adv6b certifies its sketch inside the exact ±0.01 band). Pass 2
# broadcasts the |types|-row edge table (KB) and runs ONE
# map-side-combined count aggregate on (type, bin, side) keys — ≤
# |types|·20 groups regardless of corpus size. The dense-bin frame and
# the fold are |types|·10 rows. No window, no driver collect, no
# corpus-scale shuffle anywhere: the only exchange carries
# (type, bin) partial counts.
# ---------------------------------------------------------------------------
_DQ9_FRACS = [i / 10.0 for i in range(1, 10)]
_DQ9_BINS = 10

_DQ9_EDGE_LIST = "[" + ", ".join(str(x) for x in _DQ9_FRACS) + "]"

_DQ9_ORACLE = f"""
WITH e AS (
  SELECT event_type, value,
         ({hashing.knuth_hash32_sql('event_id')} % 2) AS side
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
edges AS (
  SELECT event_type,
         list_transform(
           quantile_cont(value, {_DQ9_EDGE_LIST}),
           x -> {sql_fround('x')}
         ) AS eds
  FROM e WHERE side = 0 GROUP BY event_type
),
binned AS (
  SELECT e.event_type, e.side,
         CAST(len(list_filter(ed.eds, x -> e.value > x)) AS INTEGER) AS bin
  FROM e JOIN edges ed USING (event_type)
),
cnts AS (
  SELECT event_type, bin,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM binned GROUP BY event_type, bin
),
dense AS (
  SELECT ed.event_type, CAST(r.range AS INTEGER) AS bin
  FROM edges ed CROSS JOIN range({_DQ9_BINS}) r
),
filled AS (
  SELECT d.event_type, d.bin,
         coalesce(c.cnt_a, 0) AS cnt_a, coalesce(c.cnt_b, 0) AS cnt_b
  FROM dense d
  LEFT JOIN cnts c ON d.event_type = c.event_type AND d.bin = c.bin
),
tot AS (
  SELECT event_type,
         CAST(sum(cnt_a) AS BIGINT) AS n_a,
         CAST(sum(cnt_b) AS BIGINT) AS n_b
  FROM filled GROUP BY event_type
),
terms AS (
  SELECT f.event_type, f.bin,
         ((CAST(f.cnt_a AS DOUBLE) + 1.0) / (CAST(t.n_a AS DOUBLE) + 10.0)
          - (CAST(f.cnt_b AS DOUBLE) + 1.0) / (CAST(t.n_b AS DOUBLE) + 10.0))
         * ln(((CAST(f.cnt_a AS DOUBLE) + 1.0) / (CAST(t.n_a AS DOUBLE) + 10.0))
              / ((CAST(f.cnt_b AS DOUBLE) + 1.0) / (CAST(t.n_b AS DOUBLE) + 10.0)))
           AS term
  FROM filled f JOIN tot t USING (event_type)
),
psi AS (
  SELECT event_type,
         {sql_fround("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY bin)), (acc, x) -> acc + x)")}
           AS psi
  FROM terms GROUP BY event_type
)
SELECT t.event_type, t.n_a, t.n_b, p.psi,
       CASE WHEN p.psi >= 0.25 THEN 'major'
            WHEN p.psi >= 0.1 THEN 'moderate'
            ELSE 'stable' END AS verdict
FROM tot t JOIN psi p USING (event_type)
ORDER BY t.event_type
"""


@register(
    "dq9_psi_drift",
    oracle=_DQ9_ORACLE,
    doc=(
        "DQ9: per-event-type PSI drift between deterministic Knuth "
        "halves over exact decile bins of the baseline half; "
        "Laplace-smoothed, bin-ordered fold, thresholded verdict"
    ),
)
def dq9_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return psi_drift(load_table(spark, sf_dir, "events"))


def psi_drift(events: DataFrame) -> DataFrame:
    """dq9 core over any events-shaped frame — separated for tests
    (empty tables, single-type, all-one-side, NULL values/ids)."""
    spark = events.sparkSession
    e = events.filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type",
        "value",
        F.pmod(hashing.knuth_hash32(F.col("event_id")), F.lit(2)).alias(
            "side"
        ),
    )
    edges = (
        e.filter(F.col("side") == 0)
        .groupBy("event_type")
        .agg(
            F.transform(
                F.percentile(
                    "value", F.array(*[F.lit(x) for x in _DQ9_FRACS])
                ),
                lambda c: fround(c, _R),
            ).alias("eds")
        )
    )
    binned = (
        # inner join: types with no baseline rows are out by contract
        e.join(F.broadcast(edges), "event_type")
        .select(
            "event_type",
            "side",
            F.size(
                F.filter(F.col("eds"), lambda x: F.col("value") > x)
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_a"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_b"),
        )
    )
    dense = edges.select("event_type").crossJoin(
        F.broadcast(
            spark.range(_DQ9_BINS).select(F.col("id").cast("int").alias("bin"))
        )
    )
    filled = dense.join(binned, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
    )
    g = filled.groupBy("event_type").agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum("cnt_b").cast("bigint").alias("n_b"),
        F.collect_list(
            F.struct(
                F.col("bin").alias("bin"),
                F.col("cnt_a").alias("ca"),
                F.col("cnt_b").alias("cb"),
            )
        ).alias("bins"),
    )

    def _term(x):  # (pA − pB) · ln(pA / pB), Laplace-smoothed — see header
        pa = (x.getField("ca").cast("double") + F.lit(1.0)) / (
            F.col("n_a").cast("double") + F.lit(10.0)
        )
        pb = (x.getField("cb").cast("double") + F.lit(1.0)) / (
            F.col("n_b").cast("double") + F.lit(10.0)
        )
        return (pa - pb) * F.log(pa / pb)

    psi = fround(
        F.aggregate(
            F.array_sort(F.col("bins")),
            F.lit(0.0),
            lambda acc, x: acc + _term(x),
        ),
        _R,
    )
    return (
        g.select(
            "event_type",
            "n_a",
            "n_b",
            psi.alias("psi"),
            # compare the ROUNDED psi (same expression), so the verdict
            # CASE can never flip across engines on a sub-grid delta
            F.when(psi >= 0.25, F.lit("major"))
            .when(psi >= 0.1, F.lit("moderate"))
            .otherwise(F.lit("stable"))
            .alias("verdict"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# DQ10 — CATEGORICAL COMPOSITION DRIFT, Jensen–Shannon (library; r18
# seat candidate — r17's two seats are already committed to dq9/dp19,
# so this ships tested with its oracle constant ready, the established
# discipline): the drift dimension the dq family still lacked. dq6
# audits per-COLUMN deltas (null ppm, cardinality), dq9 audits
# WITHIN-type value distributions (PSI over decile bins); this op
# audits the ACROSS-type composition — did the MIX of event types shift
# between the two snapshot halves? The model-monitoring complement:
# a pipeline whose per-type value laws are all stable can still break
# downstream consumers when the type proportions move.
#
# Semantics: rows split into two deterministic halves by the shared
# overflow-exact Knuth-mod-2 stream on event_id (the dq6/dq9 TECHNIQUE,
# applied per-audit; halves are not shared across audits). NULL
# event_type is excluded up front (the dq9/ADVICE-r15 lesson, baked in
# from day one — NULLS FIRST/LAST placement would diverge); rows count
# regardless of value (composition is about row mix, not values). Per
# type: Laplace-smoothed proportions p = (cnt+1)/(n+T) with T = the
# distinct-type count (so both sides' smoothed proportions each sum to
# exactly 1 and no ln(0)/÷0 exists — ANSI-safe on any input); the JS
# term is 0.5·p_a·ln(p_a/m) + 0.5·p_b·ln(p_b/m) with m = (p_a+p_b)/2 —
# a closed-form scalar per type, no fold needed for bit-identity. The
# TOTAL JS divergence folds the per-type terms in type-sorted order
# (the dp17/dq9/t20 ordered-fold discipline) and rides every row as a
# constant column, with verdicts on both grains: per-type |p_b − p_a|
# share deltas (1 ppt watch / 5 ppt alert) and the conventional
# total-JS thresholds (0.01 watch / 0.05 alert), each compared on the
# ROUNDED value so the CASE cannot flip across engines.
#
# 100 TB: ONE map-side-combined count aggregate on (type, side) keys —
# ≤ 2·|types| groups regardless of corpus size. The |types|-row count
# frame is persist()ed (the s9 track() pattern) because it feeds three
# downstream subtrees (the 1-row totals, the js_total fold, and the
# output select): without the pin the one-scan claim would rest on
# Spark's exchange reuse deduping identical aggregate subplans (ADVICE
# r16 #2). Everything after runs on |types|-row frames — the two
# scalar attaches (totals, js_total) are broadcast crossJoins, the
# established 1-row pattern; the fold state is |types|-bounded. No
# window, no corpus-scale shuffle beyond the count partials, no driver
# collect.
# ---------------------------------------------------------------------------
_DQ10_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         ({hashing.knuth_hash32_sql('event_id')} % 2) AS side
  FROM events
  WHERE event_type IS NOT NULL
),
cnts AS (
  SELECT event_type,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM e GROUP BY event_type
),
tot AS (
  SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
         CAST(sum(cnt_b) AS BIGINT) AS n_b,
         CAST(count(*) AS BIGINT) AS n_types
  FROM cnts
),
p AS (
  SELECT c.event_type, c.cnt_a, c.cnt_b,
         (CAST(c.cnt_a AS DOUBLE) + 1.0)
           / (CAST(t.n_a AS DOUBLE) + CAST(t.n_types AS DOUBLE)) AS p_a,
         (CAST(c.cnt_b AS DOUBLE) + 1.0)
           / (CAST(t.n_b AS DOUBLE) + CAST(t.n_types AS DOUBLE)) AS p_b
  FROM cnts c CROSS JOIN tot t
),
terms AS (
  SELECT event_type, cnt_a, cnt_b, p_a, p_b,
         0.5 * p_a * ln(p_a / ((p_a + p_b) / 2.0))
           + 0.5 * p_b * ln(p_b / ((p_a + p_b) / 2.0)) AS js_term
  FROM p
),
total AS (
  SELECT {sql_fround(
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
      " list(js_term ORDER BY event_type)), (acc, x) -> acc + x)"
  )} AS js_total
  FROM terms
)
SELECT tm.event_type, tm.cnt_a, tm.cnt_b,
       {sql_fround("tm.p_a")} AS p_a,
       {sql_fround("tm.p_b")} AS p_b,
       {sql_fround("tm.p_b - tm.p_a")} AS share_delta,
       {sql_fround("tm.js_term")} AS js_term,
       tt.js_total,
       CASE WHEN abs({sql_fround("tm.p_b - tm.p_a")}) >= 0.05 THEN 'alert'
            WHEN abs({sql_fround("tm.p_b - tm.p_a")}) >= 0.01 THEN 'watch'
            ELSE 'stable' END AS type_verdict,
       CASE WHEN tt.js_total >= 0.05 THEN 'alert'
            WHEN tt.js_total >= 0.01 THEN 'watch'
            ELSE 'stable' END AS mix_verdict
FROM terms tm CROSS JOIN total tt
ORDER BY tm.event_type
"""


def dq10_composition_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return composition_drift(load_table(spark, sf_dir, "events"))


def composition_drift(events: DataFrame) -> DataFrame:
    """dq10 core over any events-shaped frame — separated for tests
    (hand mixes with closed-form JS, empty tables, NULL types/ids,
    one-sided types)."""
    cnts = (
        events.filter(F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.pmod(hashing.knuth_hash32(F.col("event_id")), F.lit(2)).alias(
                "side"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_a"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("cnt_b"),
        )
    )
    # |types| rows; pinned so the corpus-scale count aggregate runs ONCE
    # for its three consumers (tot, the js_total fold, the output) —
    # see header (ADVICE r16 #2)
    cnts = track(cnts.persist())
    tot = cnts.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum("cnt_b").cast("bigint").alias("n_b"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    # tot is ONE row — broadcast scalar attach, the established pattern
    p_a = (F.col("cnt_a").cast("double") + F.lit(1.0)) / (
        F.col("n_a").cast("double") + F.col("n_types").cast("double")
    )
    p_b = (F.col("cnt_b").cast("double") + F.lit(1.0)) / (
        F.col("n_b").cast("double") + F.col("n_types").cast("double")
    )
    m = (p_a + p_b) / F.lit(2.0)
    js_term = F.lit(0.5) * p_a * F.log(p_a / m) + F.lit(0.5) * p_b * F.log(
        p_b / m
    )
    terms = cnts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "cnt_a",
        "cnt_b",
        p_a.alias("p_a_raw"),
        p_b.alias("p_b_raw"),
        js_term.alias("js_term_raw"),
    )
    # |types|-row frame: the total fold and its broadcast re-attach both
    # run on bounded data (type-sorted fold — see header)
    total = terms.agg(
        fround(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("event_type").alias("event_type"),
                            F.col("js_term_raw").alias("t"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x.getField("t"),
            ),
            _R,
        ).alias("js_total")
    )
    delta = fround(F.col("p_b_raw") - F.col("p_a_raw"), _R)
    return (
        terms.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "cnt_a",
            "cnt_b",
            fround(F.col("p_a_raw"), _R).alias("p_a"),
            fround(F.col("p_b_raw"), _R).alias("p_b"),
            delta.alias("share_delta"),
            fround(F.col("js_term_raw"), _R).alias("js_term"),
            "js_total",
            F.when(F.abs(delta) >= 0.05, F.lit("alert"))
            .when(F.abs(delta) >= 0.01, F.lit("watch"))
            .otherwise(F.lit("stable"))
            .alias("type_verdict"),
            F.when(F.col("js_total") >= 0.05, F.lit("alert"))
            .when(F.col("js_total") >= 0.01, F.lit("watch"))
            .otherwise(F.lit("stable"))
            .alias("mix_verdict"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# DQ11 — CUSUM CHANGEPOINT LOCALIZATION (library; r19 seat candidate —
# the registry is saturated and the r18 seats are already committed to
# t20/dq10 (_PLANNED_R18_*), so this ships tested with its oracle
# constant ready, the established discipline): the drift dimension
# dq6/dq9/dq10 still lack is TIME. dq9 detects THAT a value
# distribution shifted between halves and dq10 THAT the type mix
# shifted; neither says WHEN. dq11 runs the classic offline CUSUM
# changepoint estimator per event_type over the DAILY mean of value:
# with daily means x_1..x_D and grand mean x̄, S_k = Σ_{i≤k}(x_i − x̄)
# and the estimated changepoint is argmax_k |S_k| (k ∈ 1..D−1, tie →
# earliest k) — the day the level shifted, with the before/after means
# and the relative shift as the actionable output (Page 1954 / the
# standard AMOC "at most one changepoint" formulation).
#
# Cross-engine determinism: the daily mean is an EXACT DECIMAL(12,2)
# sum divided once (the adv4/a3/a8 pattern — double summation order
# can never flip a bit); the per-type day series folds in DAY-SORTED
# order on both engines (Spark F.aggregate over the array_sort'ed
# struct list, DuckDB list_reduce over list(... ORDER BY day) — the
# dp17/dq9/t20 ordered-fold discipline), and every prefix sum S_k is
# its own ordered fold over slice(xs, 1, k), so all D−1 CUSUM values
# are bit-identical across engines; argmax compares those identical
# doubles with k ASC as the total-order tiebreak. Verdicts compare the
# ROUNDED relative shift (|Δ| / max(|x̄|, 1), 5% watch / 20% alert) so
# the CASE cannot flip on a sub-grid delta. NULL value/type/ts rows are
# excluded up front (the dq9/dq10 lesson); types with a single day
# have no interior k and drop by contract (HAVING D ≥ 2).
#
# 100 TB: ONE map-side-combined (type, day) aggregate over the corpus —
# ≤ |types|·|days| groups regardless of row count; everything after
# runs on |types|-row frames whose arrays and exploded k-rows are
# |days|-bounded (the per-type argmax window covers ≤ |days| rows —
# the audited bounded-window class). The O(D²) slice-folds are driver-
# free, distributed, and bounded by the DAY-GRAIN, never the corpus.
# No corpus-scale shuffle beyond the daily partials, no driver collect.
# ---------------------------------------------------------------------------
_DQ11_WATCH = 0.05
_DQ11_ALERT = 0.20

_DQ11_ORACLE = f"""
WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
),
daily AS (
  SELECT event_type, day,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS x
  FROM e GROUP BY event_type, day
),
serie AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         list(day ORDER BY day) AS days,
         list(x ORDER BY day) AS xs
  FROM daily GROUP BY event_type HAVING count(*) >= 2
),
base AS (
  SELECT event_type, n_days, days, xs,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
                     (acc, v) -> acc + v) AS total
  FROM serie
),
ks AS (
  SELECT event_type, n_days, days, xs, total,
         unnest(range(1, n_days)) AS k
  FROM base
),
sk AS (
  SELECT event_type, n_days, days, total, k,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list_slice(xs, 1, k)),
                     (acc, v) -> acc + v) AS prefix
  FROM ks
),
sc AS (
  SELECT event_type, n_days, days, total, k, prefix,
         prefix - CAST(k AS DOUBLE) * (total / n_days) AS s,
         prefix / k AS mb,
         (total - prefix) / (n_days - k) AS ma
  FROM sk
),
best AS (
  SELECT event_type, n_days, days, k, s, mb, ma,
         abs(ma - mb) / greatest(abs(total / n_days), 1.0) AS rel,
         row_number() OVER (
           PARTITION BY event_type ORDER BY abs(s) DESC, k ASC
         ) AS rn
  FROM sc
)
SELECT event_type, n_days,
       days[k] AS cp_day,
       {sql_fround("abs(s)")} AS cusum_max,
       {sql_fround("mb")} AS mean_before,
       {sql_fround("ma")} AS mean_after,
       {sql_fround("ma - mb")} AS mean_shift,
       {sql_fround("rel")} AS rel_shift,
       CASE WHEN {sql_fround("rel")} >= {_DQ11_ALERT} THEN 'alert'
            WHEN {sql_fround("rel")} >= {_DQ11_WATCH} THEN 'watch'
            ELSE 'stable' END AS cp_verdict
FROM best WHERE rn = 1
ORDER BY event_type
"""


def dq11_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_changepoint(load_table(spark, sf_dir, "events"))


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """dq11 core over any events-shaped frame — separated for tests
    (planted level shifts with known changepoints, empty tables,
    single-day types, NULL value/type/ts)."""
    e = events.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        "event_type", F.col("ts").cast("date").alias("day"), "value"
    )
    daily = e.groupBy("event_type", "day").agg(
        # exact decimal sum, ONE double division — see header
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("x")
    )
    serie = (
        daily.groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("day", "x"))).alias("arr"))
        .select(
            "event_type",
            F.size("arr").cast("bigint").alias("n_days"),
            F.transform("arr", lambda s: s.getField("day")).alias("days"),
            F.transform("arr", lambda s: s.getField("x")).alias("xs"),
        )
        .filter(F.col("n_days") >= 2)
    )
    base = serie.withColumn(
        "total", F.aggregate("xs", F.lit(0.0), lambda acc, v: acc + v)
    )
    ks = base.select(
        "event_type",
        "n_days",
        "days",
        "xs",
        "total",
        F.explode(F.expr("sequence(1L, n_days - 1)")).alias("k"),
    )
    # each S_k is an ordered fold over the first k daily means — O(D²)
    # arithmetic on |days|-bounded arrays, bit-identical to the oracle's
    # list_slice folds (see header)
    sk = ks.withColumn(
        "prefix",
        F.expr("aggregate(slice(xs, 1, int(k)), 0.0D, (acc, v) -> acc + v)"),
    )
    xbar = F.col("total") / F.col("n_days").cast("double")
    sc_ = sk.withColumn(
        "s", F.col("prefix") - F.col("k").cast("double") * xbar
    ).withColumn("mb", F.col("prefix") / F.col("k").cast("double")).withColumn(
        "ma",
        (F.col("total") - F.col("prefix"))
        / (F.col("n_days") - F.col("k")).cast("double"),
    )
    rel = F.abs(F.col("ma") - F.col("mb")) / F.greatest(
        F.abs(xbar), F.lit(1.0)
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.col("k").asc()
    )  # ≤ |days| rows per type — the audited bounded-window class
    best = sc_.withColumn("rel", rel).withColumn(
        "rn", F.row_number().over(w)
    ).filter(F.col("rn") == 1)
    rel_r = fround(F.col("rel"), _R)
    return best.select(
        "event_type",
        "n_days",
        F.expr("element_at(days, int(k))").alias("cp_day"),
        fround(F.abs(F.col("s")), _R).alias("cusum_max"),
        fround(F.col("mb"), _R).alias("mean_before"),
        fround(F.col("ma"), _R).alias("mean_after"),
        fround(F.col("ma") - F.col("mb"), _R).alias("mean_shift"),
        rel_r.alias("rel_shift"),
        F.when(rel_r >= _DQ11_ALERT, F.lit("alert"))
        .when(rel_r >= _DQ11_WATCH, F.lit("watch"))
        .otherwise(F.lit("stable"))
        .alias("cp_verdict"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# DQ12 — BENFORD FIRST-DIGIT AUDIT (library; r20 pipeline candidate —
# the registry is saturated and the r18/r19 seats are spoken for
# (_PLANNED_R18_*, d13/dq11), so this ships tested with its oracle
# constant ready, the established discipline): the data-entry/fraud
# smell test the dq family still lacked. Naturally occurring monetary
# amounts follow Benford's law (P(first digit = d) = log10(1 + 1/d));
# fabricated, truncated, or unit-mangled feeds do not — auditors
# (Nigrini's MAD test) use exactly this as a first-pass integrity
# screen. dq12 audits o_totalprice: per first significant digit, the
# observed vs expected share, plus the corpus-level MAD (mean absolute
# deviation, the Nigrini statistic), total variation distance, and
# Pearson chi-square, with the MAD conformity verdict.
#
# Cross-engine determinism BY CONSTRUCTION: the digit is extracted
# WITHOUT logarithms — price → exact DECIMAL(12,2) cents (the adv4
# pattern) → BIGINT → first character of the integer's decimal string
# (integer-to-string is identical in both engines; no log10 whose
# 1-ulp libm divergence could flip a digit at a power of ten). Digit
# counts are exact integers; the nine expected probabilities are
# INTERPOLATED CONSTANTS (shortest-round-trip reprs of log10(1+1/d),
# so both engines parse the identical double — neither engine's libm
# is consulted); p_obs divides two exact integers once; the three
# statistics fold the nine digit terms in digit order (the shared
# ordered-fold discipline). Verdicts compare the ROUNDED MAD against
# Nigrini's published thresholds (0.006 close / 0.012 acceptable /
# 0.015 marginal, above = nonconforming). Non-positive amounts are
# excluded by contract (first-digit law is defined on positive
# magnitudes); an empty input yields the empty frame (the n > 0
# guard filters the dense digit scaffold away).
#
# 100 TB: ONE map-side-combined count aggregate onto ≤ 9 groups —
# nothing else touches the corpus, and the aggregate has exactly one
# consumer (no pin needed). The dense 9-digit scaffold carries the
# total as a constant-domain window over its 9 rows (integer sum —
# order-free, the audit's constant-domain bounded class), the single
# 1-row stats attach broadcasts, and the 9-term folds are
# constant-size. No corpus-scale shuffle beyond the count partials,
# no driver collect.
# ---------------------------------------------------------------------------
_DQ12_EXP = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}
_DQ12_CLOSE, _DQ12_OK, _DQ12_MARGINAL = 0.006, 0.012, 0.015

_DQ12_VALUES = ", ".join(
    f"({d}, CAST({p!r} AS DOUBLE))" for d, p in _DQ12_EXP.items()
)

_DQ12_ORACLE = f"""
WITH cents AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
),
obs AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM cents GROUP BY 1
),
exp_p AS (
  SELECT * FROM (VALUES {_DQ12_VALUES}) AS e(digit, p_exp)
),
dense AS (
  SELECT digit, p_exp, n_obs,
         CAST(sum(n_obs) OVER () AS BIGINT) AS n
  FROM (
    SELECT e.digit, e.p_exp, coalesce(o.n_obs, 0) AS n_obs
    FROM exp_p e LEFT JOIN obs o ON e.digit = o.digit
  )
  QUALIFY n > 0
),
terms AS (
  SELECT digit, n_obs, p_exp, n,
         CAST(n_obs AS DOUBLE) / n AS p_obs,
         CAST(n_obs AS DOUBLE) / n - p_exp AS dev,
         (CAST(n_obs AS DOUBLE) - n * p_exp) * (CAST(n_obs AS DOUBLE) - n * p_exp)
           / (n * p_exp) AS chi_term
  FROM dense
),
stats AS (
  SELECT
    {sql_fround(
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list(abs(dev) ORDER BY digit)), (acc, x) -> acc + x) / 9.0"
    )} AS mad,
    {sql_fround(
        "0.5 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list(abs(dev) ORDER BY digit)), (acc, x) -> acc + x)"
    )} AS tvd,
    {sql_fround(
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list(chi_term ORDER BY digit)), (acc, x) -> acc + x)"
    )} AS chi2
  FROM terms
)
SELECT t.digit, t.n_obs,
       {sql_fround("t.p_obs")} AS p_obs,
       {sql_fround("t.p_exp")} AS p_exp,
       {sql_fround("t.dev")} AS dev,
       s.mad, s.tvd, s.chi2,
       CASE WHEN s.mad < {_DQ12_CLOSE} THEN 'close'
            WHEN s.mad < {_DQ12_OK} THEN 'acceptable'
            WHEN s.mad < {_DQ12_MARGINAL} THEN 'marginal'
            ELSE 'nonconforming' END AS conformity
FROM terms t CROSS JOIN stats s
ORDER BY t.digit
"""


def dq12_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_audit(
        load_table(spark, sf_dir, "orders"), "o_totalprice"
    )


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """dq12 core over any frame and positive numeric column — separated
    for tests (hand-built conforming/uniform corpora with closed-form
    statistics, empty inputs, non-positive exclusion)."""
    spark = df.sparkSession
    obs = (
        df.filter(F.col(col).isNotNull() & (F.col(col) > 0))
        .select(
            F.substring(
                (F.col(col).cast("decimal(12,2)") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n_obs"))
    )
    exp_p = spark.createDataFrame(
        [(d, p) for d, p in _DQ12_EXP.items()], "digit int, p_exp double"
    )
    # the total rides a constant-domain window over the 9-row scaffold
    # (integer sum — order-free), so the corpus-scale count aggregate
    # has exactly ONE consumer and needs no pin; n > 0 guards the empty
    # input (the scaffold filters itself away)
    dense = (
        exp_p.join(obs, "digit", "left")
        .select(
            "digit",
            "p_exp",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        )
        .withColumn(
            "n", F.sum("n_obs").over(Window.partitionBy()).cast("bigint")
        )
        .filter(F.col("n") > 0)
    )
    p_obs = F.col("n_obs").cast("double") / F.col("n")
    dev = p_obs - F.col("p_exp")
    chi_term = (
        (F.col("n_obs").cast("double") - F.col("n") * F.col("p_exp"))
        * (F.col("n_obs").cast("double") - F.col("n") * F.col("p_exp"))
        / (F.col("n") * F.col("p_exp"))
    )
    terms = dense.select(
        "digit",
        "n_obs",
        "p_exp",
        p_obs.alias("p_obs_raw"),
        dev.alias("dev_raw"),
        chi_term.alias("chi_raw"),
    )

    def _fold(field):  # digit-ordered 9-term fold (see header)
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("digit").alias("digit"), field.alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x.getField("v"),
        )

    stats = terms.agg(
        fround(_fold(F.abs(F.col("dev_raw"))) / F.lit(9.0), _R).alias("mad"),
        fround(F.lit(0.5) * _fold(F.abs(F.col("dev_raw"))), _R).alias("tvd"),
        fround(_fold(F.col("chi_raw")), _R).alias("chi2"),
    )
    return (
        terms.crossJoin(F.broadcast(stats))  # 1-row stats attach
        .select(
            "digit",
            "n_obs",
            fround(F.col("p_obs_raw"), _R).alias("p_obs"),
            fround(F.col("p_exp"), _R).alias("p_exp"),
            fround(F.col("dev_raw"), _R).alias("dev"),
            "mad",
            "tvd",
            "chi2",
            F.when(F.col("mad") < _DQ12_CLOSE, F.lit("close"))
            .when(F.col("mad") < _DQ12_OK, F.lit("acceptable"))
            .when(F.col("mad") < _DQ12_MARGINAL, F.lit("marginal"))
            .otherwise(F.lit("nonconforming"))
            .alias("conformity"),
        )
        .orderBy("digit")
    )
