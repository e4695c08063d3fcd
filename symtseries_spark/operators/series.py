"""Per-series derived signals: counter rates, time-weighted averages,
value histograms, top-N per group.

These are the remaining verbs of a monitoring-grade rollup store
(PromQL's rate/increase, TimescaleDB's time_weight, dashboard heatmap
histograms, per-bucket leaderboards), expressed as window functions and
hash aggregations — no UDFs, no extra shuffles beyond the one hash
partition each already needs.

Scale notes: every operator here partitions by the series key (or
key+bucket), so frames grow with per-key series length only; histogram
and top-N shuffle one row per (bucket, bin) / (bucket, rank) — output
cardinality, not input cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(col):
    return F.col(col).cast("timestamp").cast("double")


def counter_rate(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple = (),
) -> DataFrame:
    """Monotonic-counter rate: per-second increase between consecutive
    samples of a key, with counter-RESET detection (value drop ⇒ the
    counter restarted; the increase since reset is the new value itself —
    PromQL ``rate``/``increase`` semantics).

    Adds ``delta`` (reset-corrected increase) and ``rate_per_s``; the
    first sample of each key has nulls. One lag window per key.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    dt = _epoch(ts_col) - F.lag(_epoch(ts_col)).over(w)
    inc = F.when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v).otherwise(
        F.col(value_col)
    )
    return df.select(
        "*",
        F.when(prev_v.isNotNull(), inc).alias("delta"),
        F.when(prev_v.isNotNull() & (dt > 0), inc / dt).alias("rate_per_s"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    tier_s: int = 3600,
    order_cols: tuple = (),
) -> DataFrame:
    """Time-weighted average per (key, bucket): each sample's value is
    weighted by how long it was the CURRENT value inside the bucket
    (last-observation-carried-forward weighting, clipped at the bucket
    edge — TimescaleDB ``time_weight('locf')`` semantics). The plain
    arithmetic mean over-weights bursts of fast samples; the TWA doesn't.

    The last sample of a bucket holds until the bucket's end. Buckets
    with a single sample get that value. One lead window + one hash agg.
    Pass ``order_cols`` when (key, ts) is not unique — duplicate
    timestamps otherwise make the hold assignment (and the result)
    nondeterministic.
    """
    t = _epoch(ts_col)
    bstart = F.floor(t / F.lit(float(tier_s))) * tier_s
    w = Window.partitionBy(key_col, bstart.cast("long")).orderBy(
        t, *[F.col(c) for c in order_cols]
    )
    nxt = F.lead(t).over(w)
    hold = F.coalesce(nxt, bstart + tier_s) - t
    weighted = df.select(
        F.col(key_col).alias("key"),
        bstart.cast("long").alias("_bsec"),
        (F.col(value_col) * hold).alias("_wv"),
        hold.alias("_w"),
    )
    return (
        weighted.groupBy("key", "_bsec")
        .agg(
            (F.sum("_wv") / F.sum("_w")).alias("twa"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "key",
            F.timestamp_seconds(F.col("_bsec"))
            .cast(df.schema[ts_col].dataType)
            .alias("bucket_ts"),
            "twa",
            "cnt",
        )
    )


def histogram_tier(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    tier_s: int = 86400,
    lo: float = 0.0,
    hi: float = 200.0,
    bins: int = 10,
) -> DataFrame:
    """Fixed-bin value histogram per time bucket — the heatmap tier a
    dashboard reads instead of raw points. Out-of-range values clamp to
    the edge bins (bin 0 / bin ``bins-1``); NULL and NaN values are
    EXCLUDED (Spark's floor(NaN)→0 and SQL engines' NaN-sorts-highest
    would otherwise classify unmeasured points as extreme ones).

    One hash agg on (bucket, bin): shuffle rows = buckets × bins.
    """
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    t = _epoch(ts_col)
    bsec = (F.floor(t / F.lit(float(tier_s))) * tier_s).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col))
        .groupBy(bsec.alias("_bsec"), bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.timestamp_seconds(F.col("_bsec"))
            .cast(df.schema[ts_col].dataType)
            .alias("bucket_ts"),
            "bin",
            (F.lit(lo) + F.col("bin") * width).alias("bin_lo"),
            "n",
        )
    )


def top_n_per_group(
    df: DataFrame,
    group_cols: tuple,
    order_col: str,
    n: int = 3,
    tiebreak_cols: tuple = (),
    descending: bool = True,
) -> DataFrame:
    """Top-N rows per group by ``order_col`` (leaderboard per bucket).

    row_number over a (group → order) window; with AQE the rank filter
    happens right after the per-group sort, so only N rows per group
    survive the stage. For very hot groups at extreme scale, pre-reduce
    with a per-partition partial top-N before the shuffle (not needed at
    bucket-sized groups).
    """
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )
