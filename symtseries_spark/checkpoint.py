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


def _path_exists(spark, path: str) -> bool:
    """Filesystem-truth existence probe via the Hadoop FS API (works for
    local paths, HDFS, and object stores alike)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _merge_tier(spark, updates: DataFrame, path: str, tier: str):
    """The merge half of upsert_tier: returns (dates, merged) where
    ``merged`` is the FULL post-merge content of the touched partitions,
    localCheckpoint-ed (eager) so it can be written AND re-consumed (the
    1h/1d re-cascade) without re-reading the store or replaying the
    epoch's aggregation.

    ``updates`` is checkpointed FIRST, before anything else touches it:
    the updates plan is the expensive side (in a streaming epoch it is
    the stateful aggregation itself), and the naive layout evaluated it
    three times per epoch — an emptiness probe, the touched-dates
    distinct, and the merged-rows checkpoint. One eager checkpoint up
    front means the dates scan, the anti-join and the merged checkpoint
    all read pinned rows, so the agg runs exactly once; the empty-epoch
    case falls out of the (now-cheap) dates collect, no separate
    isEmpty job needed."""
    up = updates.localCheckpoint(eager=True)
    dates = [
        r["bucket_date"]
        for r in up.select(F.to_date("bucket_ts").alias("bucket_date"))
        .distinct()
        .collect()
    ]
    if not dates:
        return dates, None
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
        )
        # checkpoint the merged rows too: the dynamic overwrite below must
        # never read from the store path it is rewriting (the survivors
        # side), and the re-cascade re-consumes them
        merged = survivors.unionByName(up).localCheckpoint(eager=True)
    except AnalysisException as e:
        # ONLY a missing store means "first write". Any other analysis
        # error (schema drift, corrupt footer, ...) must surface — merging
        # `up` alone would silently drop every surviving old row in the
        # touched partitions. The error-class/message match is belt; the
        # filesystem existence probe is suspenders for Spark versions /
        # locales whose missing-path error carries neither marker.
        get_cls = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", lambda: None
        )
        err_cls = get_cls() or ""
        missing = "PATH_NOT_FOUND" in str(err_cls) or "PATH_NOT_FOUND" in str(e)
        if not missing and not err_cls:
            missing = not _path_exists(spark, path)
        if not missing:
            raise
        merged = up  # already checkpointed — first write is updates-only
    return dates, merged


def upsert_tier(spark, updates: DataFrame, path: str, tier: str) -> list:
    """Merge changed (key, bucket) rows into the partitioned tier store —
    the write half of CONTINUOUS-aggregate maintenance: ``updates``
    carries the current aggregate rows for the buckets an increment
    touched (e.g. one streaming epoch in update mode), and only the
    affected (tier, bucket_date) partitions are rewritten.

    New partition content = surviving old rows (anti-join on
    (key, bucket_ts)) ∪ updates; dynamic partition overwrite leaves every
    untouched date alone. The merged rows are localCheckpoint-ed first so
    the overwrite never reads from the path it is rewriting.

    Returns the list of affected bucket_date values (driver-side, bounded
    by the watermark horizon — an epoch can only touch dates within it).
    """
    dates, merged = _merge_tier(spark, updates, path, tier)
    if merged is not None:
        write_partitioned(merged, path, tier)
    return dates


def upsert_tiers_increment(
    spark, updates_1m: DataFrame, path: str, timings: dict | None = None
) -> None:
    """Apply a 1m-tier increment and re-derive the affected 1h/1d buckets
    — the full continuous-aggregate maintenance step.

    The 1h/1d tiers are recomputed ONLY for the touched bucket_dates, by
    re-cascading the (just-merged) 1m partials of those dates; since no
    1h/1d bucket spans a date boundary, rewriting whole affected date
    partitions is both correct and exactly partition-aligned.

    Per-epoch job layout (the number that sets streaming throughput):
    the merged 1m rows are localCheckpoint-ed ONCE and feed both the 1m
    write and the 1h cascade — the store is never re-read within an
    epoch — and each tier's write overlaps the next tier's cascade
    compute (checkpointed inputs make concurrent consumption free):

        merge(ckpt) → [write 1m ∥ cascade 1h(ckpt) → [write 1h ∥
                       cascade 1d → write 1d]]

    ``timings``: optional dict filled with per-phase wall seconds.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    from symtseries_spark.operators.rollup import rollup_cascade

    def _mark(label, since):
        now = time.time()
        if timings is not None:
            timings[label] = round(now - since, 3)
        return now

    t0 = time.time()
    dates, merged_1m = _merge_tier(spark, updates_1m, path, "1m")
    t = _mark("merge_1m", t0)
    if not dates:
        return

    sc = spark.sparkContext

    def _write(df, tier):
        # distinct FAIR pools let the overlapped write/cascade pairs
        # interleave instead of queueing FIFO behind each other
        sc.setLocalProperty("spark.scheduler.pool", f"upsert_{tier}")
        try:
            write_partitioned(df, path, tier)
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(2) as pool:
        w1m = pool.submit(_write, merged_1m, "1m")
        t1h = rollup_cascade(merged_1m, "1h").localCheckpoint(eager=True)
        t = _mark("cascade_1h", t)
        w1h = pool.submit(_write, t1h, "1h")
        t1d = rollup_cascade(t1h, "1d").localCheckpoint(eager=True)
        t = _mark("cascade_1d", t)
        _write(t1d, "1d")
        t = _mark("write_1d", t)
        w1m.result()
        w1h.result()
    _mark("writes_drain", t)
    if timings is not None:
        timings["total"] = round(time.time() - t0, 3)
