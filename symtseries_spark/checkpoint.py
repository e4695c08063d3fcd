"""Per-partition watermark + lineage checkpointing for resumable reruns.

The reference persists window state as a replayable script via its
lua_sandbox ``serialize_sax`` hook (/root/reference/lua/lua_sax.c:293-342).
The distributed analogue is a small checkpoint *table*:

    (partition_id int, tier string, high_watermark_ts timestamp,
     rows_in long, rows_out long, run_id string, updated_at timestamp)

Semantics:
  * Each rollup run reads the checkpoint, processes only input with
    ts > high_watermark (per time-partition), and overwrites exactly the
    output partitions it touched (idempotent overwrite-by-partition), then
    appends a new checkpoint generation.
  * ``latest_watermarks`` reduces the log to current state, so the log
    doubles as lineage/metrics history (rows_in/rows_out per run per tier).
  * A rerun with the same run_id is a no-op-equivalent: it recomputes the
    same partitions and overwrites them with identical bytes (deterministic
    pipeline), which is the idempotence property tests pin.

Partitioning note: "partition_id" here is the *time bucket partition*
(date of bucket_ts) — the unit of overwrite — not a shuffle partition id,
so the checkpoint stays valid across cluster sizes.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHECKPOINT_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType()),
        StructField("tier", StringType()),
        StructField("high_watermark_ts", TimestampType()),
        StructField("rows_in", LongType()),
        StructField("rows_out", LongType()),
        StructField("run_id", StringType()),
        StructField("updated_at", TimestampType()),
    ]
)


def read_checkpoints(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.exists(path):
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)
    return spark.read.parquet(path)


def latest_watermarks(cp: DataFrame) -> DataFrame:
    """Reduce the append-only log to the live watermark per (partition, tier)."""
    return cp.groupBy("partition_id", "tier").agg(
        F.max("high_watermark_ts").alias("high_watermark_ts")
    )


def filter_new_input(
    df: DataFrame, ts_col: str, watermarks: DataFrame, tier: str
) -> DataFrame:
    """Keep only rows strictly after the tier's global high watermark.

    The watermark table is tiny → collected to the driver and pushed down
    as a literal predicate so the scan itself prunes (partition pruning on
    a date-partitioned table; rowgroup stats pruning on plain parquet).
    """
    rows = watermarks.filter(F.col("tier") == tier).agg(
        F.min("high_watermark_ts")
    ).first()
    hw = rows[0] if rows else None
    if hw is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(hw))


def append_checkpoint(
    spark: SparkSession,
    path: str,
    tier: str,
    high_watermark_ts,
    rows_in: int,
    rows_out: int,
    run_id: str | None = None,
    partition_id: int = 0,
) -> str:
    run_id = run_id or uuid.uuid4().hex[:12]
    row = [
        (
            partition_id,
            tier,
            high_watermark_ts,
            rows_in,
            rows_out,
            run_id,
            dt.datetime.utcnow(),
        )
    ]
    spark.createDataFrame(row, CHECKPOINT_SCHEMA).write.mode("append").parquet(path)
    return run_id


def write_partitioned(
    df: DataFrame, path: str, tier: str, sort_within: tuple = ()
) -> None:
    """Idempotent overwrite-by-partition write of a rollup tier.

    Dynamic partition overwrite replaces exactly the (tier, bucket_date)
    partitions present in df — a rerun of the same input slice rewrites
    the same partitions with the same bytes and nothing else.

    ``sort_within``: extra within-partition sort columns appended after
    bucket_date. The writer itself requires a within-task sort by the
    partition columns; issuing (bucket_date, *sort_within) explicitly makes
    that requirement a satisfied prefix (no second, order-destroying sort)
    and guarantees written files are clustered/sorted by ``sort_within`` —
    the property downstream clustered=True readers rely on.
    """
    out = df.withColumn("bucket_date", F.to_date("bucket_ts"))
    if sort_within:
        out = out.sortWithinPartitions("bucket_date", *sort_within)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tier", "bucket_date")
        .parquet(path)
    )


def upsert_tier(spark, updates: DataFrame, path: str, tier: str) -> list:
    """Merge changed (key, bucket) rows into the partitioned tier store —
    the write half of CONTINUOUS-aggregate maintenance: ``updates``
    carries the current aggregate rows for the buckets an increment
    touched (e.g. one streaming epoch in update mode), and only the
    affected (tier, bucket_date) partitions are rewritten.

    New partition content = surviving old rows (anti-join on
    (key, bucket_ts)) ∪ updates; dynamic partition overwrite leaves every
    untouched date alone. The old rows are localCheckpoint-ed first so
    the overwrite never reads from the path it is rewriting.

    Returns the list of affected bucket_date values (driver-side, bounded
    by the watermark horizon — an epoch can only touch dates within it).
    """
    up = updates.withColumn("bucket_date", F.to_date("bucket_ts"))
    dates = [
        r["bucket_date"] for r in up.select("bucket_date").distinct().collect()
    ]
    if not dates:
        return dates
    up = up.drop("bucket_date")
    from pyspark.errors import AnalysisException

    try:
        existing = (
            spark.read.parquet(path)
            .filter(F.col("tier") == tier)
            .filter(F.col("bucket_date").isin(dates))  # partition prune
            .drop("bucket_date")
        )
        survivors = existing.join(
            up.select("key", "bucket_ts"), ["key", "bucket_ts"], "left_anti"
        ).localCheckpoint(eager=True)
        merged = survivors.unionByName(up)
    except AnalysisException as e:
        # ONLY a missing store means "first write". Any other analysis
        # error (schema drift, corrupt footer, ...) must surface — merging
        # `up` alone would silently drop every surviving old row in the
        # touched partitions.
        get_cls = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", lambda: None
        )
        err_cls = get_cls() or ""
        if "PATH_NOT_FOUND" not in str(err_cls) and "PATH_NOT_FOUND" not in str(e):
            raise
        merged = up
    write_partitioned(merged, path, tier)
    return dates


def upsert_tiers_increment(spark, updates_1m: DataFrame, path: str) -> None:
    """Apply a 1m-tier increment and re-derive the affected 1h/1d buckets
    — the full continuous-aggregate maintenance step.

    The 1h/1d tiers are recomputed ONLY for the touched bucket_dates, by
    re-cascading the (just-merged) 1m partials of those dates; since no
    1h/1d bucket spans a date boundary, rewriting whole affected date
    partitions is both correct and exactly partition-aligned.
    """
    from symtseries_spark.operators.rollup import rollup_cascade

    dates = upsert_tier(spark, updates_1m, path, "1m")
    if not dates:
        return
    t1m = (
        spark.read.parquet(path)
        .filter((F.col("tier") == "1m") & F.col("bucket_date").isin(dates))
        .drop("bucket_date")
    )
    t1h = rollup_cascade(t1m, "1h").localCheckpoint(eager=True)
    write_partitioned(t1h, path, "1h")
    t1d = rollup_cascade(t1h, "1d")
    write_partitioned(t1d, path, "1d")
