"""Time-series joins: as-of (nearest-preceding) join and sessionization.

The reference library has no join surface (it is a symbolization kernel),
but the north-rule engine — a rollup/downsample store over per-URL crawl
series — needs the classic time-series join vocabulary to be usable as a
replacement: "attach the latest rollup point at-or-before each event",
"stitch events into visit sessions".

``asof_join`` uses the union-window formulation instead of a range join:
both sides are unioned on (key, t) with a side marker, one ordered window
per key carries the last build-side row forward, and probe rows are
filtered back out. That is a SINGLE hash shuffle on the key (same
partitioning the rollup stages already produce, so AQE can often reuse
the exchange) and never materializes the O(probe × build) pair blow-up a
naive ``t_probe >= t_build`` range join creates. Skew note: one window
partition per key — for a pathological single hot key, pre-split the
probe side by coarse time bucket and replicate the build side per bucket
(same salting machinery as operators/skew.py); not needed for crawl
tables keyed by url/user.

``sessionize`` is the standard gap-based session assignment: a lag-window
flags gap starts, a running sum numbers sessions — two window passes over
one shuffle, all JVM-side, no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str = "key",
    probe_ts: str = "ts",
    build_ts: str = "ts",
    build_cols: Sequence[str] = ("value",),
    strict: bool = False,
    tolerance_s: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each probe row, the most recent build row
    with build_ts <= probe_ts (or < when ``strict``), per key.

    Returns all probe columns plus ``{prefix}ts`` and ``{prefix}{col}``
    for each of ``build_cols``; unmatched (or out-of-``tolerance_s``)
    probes get nulls, like an ASOF LEFT JOIN.

    The build side should be unique per (key, build_ts) — the standard
    as-of contract; ties are broken deterministically by the packed build
    struct ordering, but relying on that is unspecified behavior.

    Scale: one shuffle (hash on ``on``), window frames grow with per-key
    series length only. No range-join row explosion.
    """
    pcols = probe.columns
    clashes = [
        c for c in [f"{prefix}ts"] + [f"{prefix}{c}" for c in build_cols]
        if c in pcols
    ]
    if clashes:
        raise ValueError(
            f"asof_join output columns {clashes} collide with probe "
            f"columns; pass a different prefix= (e.g. when layering "
            f"multiple as-of joins)"
        )
    bstruct = F.struct(
        F.col(build_ts).alias("__bt"), *[F.col(c) for c in build_cols]
    )
    # Equality-join semantics on the key: a NULL key matches nothing.
    # The union-window formulation would otherwise group NULL keys into
    # one window partition and let a NULL-key probe pick up a NULL-key
    # build row; dropping NULL-key build rows up front leaves NULL-key
    # probes unmatched, like an ASOF LEFT JOIN (and the SQL oracle).
    build = build.filter(F.col(on).isNotNull())
    # side ordering at equal t: non-strict → build sorts BEFORE the probe
    # row (visible to it); strict → after (invisible).
    b = build.select(
        F.col(on).alias("__k"),
        F.col(build_ts).alias("__t"),
        F.lit(2 if strict else 0).alias("__side"),
        bstruct.alias("__b"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}") for c in pcols],
    )
    p = probe.select(
        F.col(on).alias("__k"),
        F.col(probe_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(b.schema["__b"].dataType).alias("__b"),
        *[F.col(c).alias(f"__p_{c}") for c in pcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        p.unionByName(b)
        .withColumn("__last", F.last("__b", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        in_tol = (
            F.col("__t").cast("timestamp").cast("double")
            - F.col("__last.__bt").cast("timestamp").cast("double")
        ) <= F.lit(float(tolerance_s))
        carried = carried.withColumn(
            "__last", F.when(in_tol, F.col("__last"))
        )
    out = [F.col(f"__p_{c}").alias(c) for c in pcols]
    out.append(F.col("__last.__bt").alias(f"{prefix}ts"))
    out += [F.col(f"__last.{c}").alias(f"{prefix}{c}") for c in build_cols]
    return carried.select(*out)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: float = 1800.0,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session indexes: a new session starts when the
    time since the previous event for the same key exceeds ``gap_s``.

    Adds ``session_idx`` (0-based per key, in time order). Deterministic
    tie-break within equal timestamps via ``order_cols``.
    """
    order = [F.col(ts)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.col(ts).cast("timestamp").cast("double") - F.lag(F.col(ts).cast("timestamp").cast("double")).over(w)
    is_start = F.when(
        gap.isNull() | (gap > F.lit(float(gap_s))), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.lit(1),
    )


def session_stats(
    sessions: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-session aggregate: bounds, duration, event count, value sum.

    One hash aggregation on (key, session_idx) — partial aggregation
    map-side, same key partitioning the sessionize window produced, so
    AQE typically elides the second exchange.
    """
    return sessions.groupBy(key, "session_idx").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(F.col(ts).cast("timestamp").cast("double")) - F.min(F.col(ts).cast("timestamp").cast("double"))).alias(
            "duration_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value).alias("sum_v"),
    )
