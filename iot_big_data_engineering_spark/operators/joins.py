"""Star-schema join + aggregation layer (beyond-reference extension).

The reference has **no joins** (SURVEY.md §2.5) — its only multi-table
behavior is pipeline composition. A real analytics engine needs dimension
enrichment, so this module adds the join-capable layer over the driver's
TPC-H-ish star schema, plus an enrichment join of the `events` stream table
against the customer/nation dimensions (the analog of the reference's
implicit vehicle/sensor dimensions).

Join strategy for 100 TB:
- dimension tables (region 5, nation 25, customer ~O(SF·150k), supplier,
  part) are broadcast — `F.broadcast()` hints remove the shuffle on the
  fact side entirely for region/nation/supplier; customer/part stay
  broadcastable far beyond these SFs (threshold set to 64 MB in session.py);
- the one genuinely large-large join (orders ⋈ lineitem) is a shuffle join
  on the key both sides would be bucketed on in a managed layout
  (`write.bucketBy(N, "o_orderkey")`); AQE handles skew splitting;
- aggregations sit above the joins so Catalyst pushes filters beneath the
  join (verified in tests/test_plans.py).

Determinism: money aggregates run through exact DECIMAL arithmetic
(prices/discounts/taxes are 2-dp values), then convert to DOUBLE once —
double summation is order-dependent across partitions, and Spark's and
DuckDB's orders differ, so a double-summed revenue can land on a rounding
boundary. Decimal sums are exact and associative → bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.rounding import fround
from ..registry import register
from ..sources.tables import load_table


def _dec2(col: str) -> Column:
    return F.col(col).cast("decimal(12,2)")


# decimal forms of the classic revenue expressions
def _disc_price() -> Column:
    return _dec2("l_extendedprice") * (F.lit(1) - _dec2("l_discount"))


def _charge() -> Column:
    return _disc_price() * (F.lit(1) + _dec2("l_tax"))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(12,2)))"
)
_SQL_CHARGE = _SQL_DISC_PRICE + " * (1 + CAST(l_tax AS DECIMAL(12,2)))"


def _sum_dbl(c: Column) -> Column:
    return F.sum(c).cast("double")


# ---------------------------------------------------------------------------
# J1 — TPC-H Q1 shape: pricing summary (no join; scan-heavy agg baseline)
# ---------------------------------------------------------------------------
@register(
    "j1_pricing_summary",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2)
         AS sum_base_price,
       round(CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum({_SQL_CHARGE}) AS DOUBLE), 2) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="J1: TPC-H Q1 pricing summary over lineitem (decimal-exact sums)",
)
def j1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(_sum_dbl(_dec2("l_quantity")), 2).alias("sum_qty"),
            fround(_sum_dbl(_dec2("l_extendedprice")), 2).alias("sum_base_price"),
            fround(_sum_dbl(_disc_price()), 2).alias("sum_disc_price"),
            fround(_sum_dbl(_charge()), 2).alias("sum_charge"),
            fround(_sum_dbl(_dec2("l_quantity")) / n, 6).alias("avg_qty"),
            fround(_sum_dbl(_dec2("l_extendedprice")) / n, 6).alias("avg_price"),
            fround(_sum_dbl(_dec2("l_discount")) / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — TPC-H Q3 shape: shipping priority (3-way join, top-k revenue)
# ---------------------------------------------------------------------------
@register(
    "j3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       round(CAST(sum({_SQL_DISC_PRICE.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS DOUBLE), 2) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="J3: TPC-H Q3 shipping priority (broadcast customer, top-10)",
)
def j3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        l.filter(F.col("l_shipdate") > cutoff)
        .join(
            o.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fround(_sum_dbl(_disc_price()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J5 — TPC-H Q5 shape: full star join through region/nation
# ---------------------------------------------------------------------------
@register(
    "j5_region_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       round(CAST(sum({_SQL_DISC_PRICE.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS DOUBLE), 2) AS revenue,
       count(*) AS lineitem_count
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
    doc="J5: region-filtered supplier volume (broadcast dims)",
)
def j5_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("s_suppkey", "n_name")
    )
    return (
        l.join(F.broadcast(dims), l.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            fround(_sum_dbl(_disc_price()), 2).alias("revenue"),
            F.count("*").alias("lineitem_count"),
        )
        .select("n_name", "revenue", "lineitem_count")
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# ---------------------------------------------------------------------------
# J10 — large-large join: orders ⋈ lineitem per-order rollup
# ---------------------------------------------------------------------------
@register(
    "j10_order_rollup",
    oracle=f"""
SELECT o.o_orderstatus,
       o.o_orderpriority,
       count(DISTINCT o.o_orderkey) AS order_count,
       round(CAST(sum({_SQL_DISC_PRICE.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS DOUBLE), 2) AS revenue,
       round(CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS avg_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus, o.o_orderpriority
""",
    doc="J10: shuffle join orders⋈lineitem (the bucket-by candidate at scale)",
)
def j10_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            fround(_sum_dbl(_disc_price()), 2).alias("revenue"),
            fround(_sum_dbl(_dec2("l_quantity")) / F.count(F.lit(1)), 6).alias(
                "avg_qty"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J11 — part enrichment: revenue by brand (broadcast part)
# ---------------------------------------------------------------------------
@register(
    "j11_brand_revenue",
    oracle=f"""
SELECT p.p_brand,
       count(*) AS lineitem_count,
       round(CAST(sum({_SQL_DISC_PRICE.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS DOUBLE), 2) AS revenue,
       round(CAST(sum(CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS avg_retail_price
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY revenue DESC, p_brand
""",
    doc="J11: lineitem ⋈ broadcast(part) revenue by brand",
)
def j11_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("lineitem_count"),
            fround(_sum_dbl(_disc_price()), 2).alias("revenue"),
            fround(
                _sum_dbl(_dec2("p_retailprice")) / F.count(F.lit(1)), 6
            ).alias("avg_retail_price"),
        )
        .orderBy(F.col("revenue").desc(), F.col("p_brand"))
    )


# ---------------------------------------------------------------------------
# J12 — semi/anti joins: customers with vs without orders
# ---------------------------------------------------------------------------
@register(
    "j12_customer_order_presence",
    oracle="""
SELECT 'with_orders' AS bucket, count(*) AS customer_count
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders', count(*)
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="J12: left_semi / left_anti join (EXISTS / NOT EXISTS)",
)
def j12_customer_order_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").alias("customer_count"))
        .select(F.lit("with_orders").alias("bucket"), "customer_count")
    )
    without = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("customer_count"))
        .select(F.lit("without_orders").alias("bucket"), "customer_count")
    )
    return with_orders.unionAll(without)


# ---------------------------------------------------------------------------
# J13 — events enriched against customer/nation dims (stream-table pattern)
# ---------------------------------------------------------------------------
@register(
    "j13_events_enriched",
    oracle="""
SELECT n.n_name,
       c.c_mktsegment,
       e.event_type,
       count(*) AS event_count,
       round(CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value,
       round(CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)
         AS avg_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, c.c_mktsegment, e.event_type
""",
    doc="J13: fact-stream enrichment via broadcast dimension joins",
)
def j13_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dim = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_mktsegment", "n_name"
    )
    return (
        e.join(F.broadcast(dim), e.user_id == dim.c_custkey)
        .groupBy("n_name", "c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("event_count"),
            fround(_sum_dbl(_dec2("value")), 2).alias("total_value"),
            fround(_sum_dbl(_dec2("value")) / F.count(F.lit(1)), 6).alias(
                "avg_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# W1 — analytic window functions (absent from the reference; core engine
# capability): top-3 orders per customer by price, with rank + lag
# ---------------------------------------------------------------------------
@register(
    "w1_top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
       CAST(rn AS INTEGER) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3 AND o_custkey < 100
""",
    doc="W1: row_number window, top-3 orders per customer",
)
def w1_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.filter(F.col("o_custkey") < 100)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            fround("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# W2 — cumulative / moving aggregates over event time per user
# (window-ordered cumulative sums are order-deterministic in both engines,
# so plain double arithmetic is cross-engine safe here)
# ---------------------------------------------------------------------------
@register(
    "w2_user_running_value",
    oracle="""
SELECT event_id, user_id, ts,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_value,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
         AS delta_from_prev
FROM events
WHERE user_id < 10
""",
    doc="W2: running sum + lag deltas per user over event time",
)
def w2_user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.filter(F.col("user_id") < 10)
        .select(
            "event_id",
            "user_id",
            "ts",
            fround(
                F.sum("value").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                2,
            ).alias("running_value"),
            fround(F.col("value") - F.lag("value").over(w), 2).alias(
                "delta_from_prev"
            ),
        )
    )


# ---------------------------------------------------------------------------
# G1 — grouping sets / rollup (absent from reference; engine capability)
# ---------------------------------------------------------------------------
@register(
    "g1_rollup_order_stats",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS order_count,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE), 2)
         AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="G1: ROLLUP hierarchy totals over orders",
)
def g1_rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("order_count"),
            fround(
                F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double"),
                2,
            ).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "order_count",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# U1 — set operations (absent from reference; engine capability)
# ---------------------------------------------------------------------------
@register(
    "u1_active_keys_union",
    oracle="""
SELECT custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
  UNION
  SELECT user_id AS custkey FROM events WHERE value > 150
) t
""",
    doc="U1: UNION (distinct) of high-value customer keys from two tables",
)
def u1_active_keys_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    a = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    b = e.filter(F.col("value") > 150).select(F.col("user_id").alias("custkey"))
    return a.union(b).distinct()
