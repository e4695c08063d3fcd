"""Gap-fill for rollup series: dense bucket spine + locf + linear interp.

All built-in window/array functions (JVM-side, whole-stage codegen):
  * spine: per-key ``sequence(min_ts, max_ts, interval)`` + explode,
  * locf: ``last(value, ignorenulls=True)`` over an ordered key window,
  * linear: interpolate between the locf neighbor and the next non-null
    (``last(..., ignorenulls=True)`` over a DESC-ordered running frame —
    both directions stream in O(rows) per partition).

Scale note: windows are partitioned by key — each per-key series is tiny
(bounded by the tier's retention horizon), so no single window frame grows
with total data volume, only with series length. The spine explode emits
rows proportional to key-count × horizon/bucket, the same order as the
rollup itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from symtseries_spark.config import TIERS


def dense_spine(rollup: DataFrame, tier: str) -> DataFrame:
    """One row per (key, bucket) between each key's min and max bucket_ts."""
    step = TIERS[tier]
    spine = (
        rollup.groupBy("key")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {step} SECOND"))
            ).alias("bucket_ts"),
        )
    )
    return spine


def gapfill(
    rollup: DataFrame,
    tier: str,
    value_col: str = "text_len_avg",
    methods: tuple = ("locf", "linear"),
) -> DataFrame:
    """Return (key, bucket_ts, value, value_locf, value_linear, is_gap).

    The join spine↔rollup is an equi-join on (key, bucket_ts); both sides
    are already hash-partitioned by key from their groupBys, so AQE keeps
    this cheap. locf/linear are computed in one pass over two key windows.
    """
    spine = dense_spine(rollup, tier)
    joined = spine.join(
        rollup.select("key", "bucket_ts", F.col(value_col).alias("value")),
        ["key", "bucket_ts"],
        "left",
    )
    w_past = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # "next non-null" is computed as last-non-null over a DESC-ordered
    # RUNNING frame, not first() over a (0, unboundedFollowing) frame:
    # Spark streams growing frames in O(rows) but re-evaluates an
    # unbounded-following frame per row — O(rows²) per key partition,
    # which at an hourly grid over months of retention is the difference
    # between ~1 s and ~80 s at sf0.1 (measured r5). Same hash partition
    # by key, one extra in-partition sort.
    w_future = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn("is_gap", F.col("value").isNull())
    if "locf" in methods:
        out = out.withColumn(
            "value_locf", F.last("value", ignorenulls=True).over(w_past)
        )
    if "linear" in methods:
        ts_s = F.unix_timestamp("bucket_ts").cast("double")
        pair = F.when(
            F.col("value").isNotNull(), F.struct(ts_s.alias("t"), F.col("value").alias("v"))
        )
        prev = F.last(pair, ignorenulls=True).over(w_past)
        nxt = F.last(pair, ignorenulls=True).over(w_future)
        frac = (ts_s - prev["t"]) / (nxt["t"] - prev["t"])
        interp = prev["v"] + (nxt["v"] - prev["v"]) * frac
        out = out.withColumn(
            "value_linear",
            F.when(F.col("value").isNotNull(), F.col("value"))
            .when(prev.isNull(), nxt["v"])
            .when(nxt.isNull(), prev["v"])
            .otherwise(interp),
        )
    return out
