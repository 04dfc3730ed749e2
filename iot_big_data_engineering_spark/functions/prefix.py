"""Two-phase distributed exclusive prefix sum.

`sum() OVER (PARTITION BY group ORDER BY key)` with low-cardinality
groups is the classic window-function scale trap: each group is a
single-task global sort. This helper computes the identical exclusive
running sum in two parallel phases, exact integers throughout:

phase 1 — bucket the order key monotonically (floor(key / width)) and
  cumsum WITHIN (group, bucket): parallelism = #buckets, not #groups;
phase 2 — exclusive-prefix the tiny per-bucket totals table (rows =
  #buckets, driver-scale) and broadcast it back; global offset =
  bucket prefix + within-bucket offset.

Monotone bucketing preserves the global order, so the result is
bit-identical to the naive window — which is exactly what the users'
DuckDB oracles state (mm6 shard planning, dp5 sequence packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str,
    bucket_width: int = 1_000,
) -> DataFrame:
    """Adds ``out_col`` = Σ value over rows strictly earlier in
    ``order_col`` within ``group_col`` (exclusive running sum). The
    order key must be numeric and unique per group.

    ``bucket_width`` is the scale knob: phase 2 broadcasts one row per
    bucket, so pick width ∝ key-range / 10⁵ to keep the prefix table
    MB-sized at any corpus (e.g. 10¹¹ doc ids → width 10⁶ → 10⁵ bucket
    rows). Wider buckets trade phase-1 parallelism, which stays ample
    while #buckets ≫ cores."""
    b = df.withColumn("_bkt", F.floor(F.col(order_col) / bucket_width))
    win_in = (
        Window.partitionBy(group_col, "_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.withColumn(
        "_local_excl",
        (F.sum(value_col).over(win_in) - F.col(value_col)).cast("bigint"),
    )
    win_bkt = (
        Window.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = (
        b.groupBy(group_col, "_bkt")
        .agg(F.sum(value_col).cast("bigint").alias("_bkt_total"))
        .withColumn(
            "_bkt_excl",
            (F.sum("_bkt_total").over(win_bkt) - F.col("_bkt_total")).cast(
                "bigint"
            ),
        )
        .select(group_col, "_bkt", "_bkt_excl")
    )
    return (
        within.join(F.broadcast(prefixes), [group_col, "_bkt"])
        .withColumn(out_col, F.col("_bkt_excl") + F.col("_local_excl"))
        .drop("_bkt", "_local_excl", "_bkt_excl")
    )
