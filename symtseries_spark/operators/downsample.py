"""Visualization-grade downsampling: M4 (min/max/first/last per pixel bucket).

M4 (Jugel et al., "M4: A Visualization-Oriented Time Series Data
Aggregation", VLDB 2014 — public) is the standard error-free line-chart
downsample: splitting the time range into one bucket per output pixel and
keeping the first, last, min, and max point of each bucket reproduces the
rasterized line exactly while reducing an arbitrarily long series to
≤ 4·width points.

Spark shape: ONE aggregation on (key, bucket) using min/max over packed
comparable structs. Struct min/max lowers to SortAggregate (structs are
not mutable hash-agg buffer types); since pixel buckets hold few points
(output cardinality ~ input rows) a map-side partial reduces nothing, so
round 6 repartitions on the group keys FIRST and runs the whole
aggregate post-shuffle on every core — still exactly one exchange,
carrying rows of the same width, where a row_number window formulation
would sort the shuffled rows under three different orderings. The
per-partition sort is by the group key only (pinned in
tests/test_plans.py). Struct comparison is lexicographic
(ts, tiebreak, value), making first/last deterministic under equal
timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    bucket_s: int = 3600,
) -> DataFrame:
    """Per (key, bucket_s-wide bucket): first/last (by time) and min/max
    (by value) with their timestamps.

    Returns (key, bucket_ts, n, first_v, last_v, min_v, max_v,
    t_first, t_last, t_min, t_max) — the 4-tuple M4 needs to draw the
    bucket's pixel column exactly.
    """
    t = F.col(ts_col).cast("timestamp").cast("double")
    v = F.col(value_col)
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    by_time = F.struct(t.alias("t"), tb.alias("tb"), v.alias("v"))
    # value-ordered struct: lexicographic (v, t, tb) means min_v ties
    # resolve to the EARLIEST point and max_v ties to the LATEST (struct
    # max takes the largest t) — pinned in test_m4_ties_resolve_deterministically
    by_value = F.struct(v.alias("v"), t.alias("t"), tb.alias("tb"))
    bucket = (F.floor(t / F.lit(float(bucket_s))) * bucket_s).cast("long")
    # One-pixel buckets hold few points (output cardinality ~ input), so
    # the map-side partial SortAggregate reduces nothing — it only runs a
    # serial sort inside the scan tasks (a single-file input = ONE core).
    # Repartition on the group keys first: the one exchange now carries
    # raw rows of the same width and the sort-aggregate runs post-shuffle
    # on every core.
    return (
        df.repartition(F.col(key_col), bucket)
        .groupBy(F.col(key_col).alias("key"), bucket.alias("_bsec"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(by_time).alias("_f"),
            F.max(by_time).alias("_l"),
            F.min(by_value).alias("_lo"),
            F.max(by_value).alias("_hi"),
        )
        .select(
            "key",
            F.timestamp_seconds(F.col("_bsec"))
            .cast(df.schema[ts_col].dataType)
            .alias("bucket_ts"),
            "n",
            F.col("_f.v").alias("first_v"),
            F.col("_l.v").alias("last_v"),
            F.col("_lo.v").alias("min_v"),
            F.col("_hi.v").alias("max_v"),
            F.col("_f.t").alias("t_first"),
            F.col("_l.t").alias("t_last"),
            F.col("_lo.t").alias("t_min"),
            F.col("_hi.t").alias("t_max"),
        )
    )
