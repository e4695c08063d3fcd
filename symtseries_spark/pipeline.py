"""The flagship end-to-end job: crawl pages → rollup tiers → iSAX index →
Gorilla-compressed chunks, with per-partition checkpointing.

This is the job the benchmark measures (rolled-up points/sec across all
three tiers) and the scaling-efficiency evidence runs at two parallelism
levels. Stage layout (one shuffle each, all else map-side):

  raw scan (column-pruned: url, warc_ts, text-length only)
    → salted 1m rollup  (shuffle on (url, bucket, salt))
    → WRITE 1m tier, read back             ← stage chaining goes through
    → 1h cascade (shuffle, 1/60 the rows)    the written tier table, not
    → 1d cascade                             .persist(): the columnar cache
    → window assembly + symbolization        build costs more than a parquet
    → index + compressed chunks              write and is exactly what a
                                             cluster job does between stages
                                             (each tier is a real table).

Counting output points reads parquet footers (metadata-only), so the
metric includes the sink write but not redundant rescans.
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symtseries_spark import checkpoint as CP
from symtseries_spark.config import EngineConfig
from symtseries_spark.operators.codecs import encode_chunks
from symtseries_spark.operators.index import build_index
from symtseries_spark.operators.rollup import rollup_cascade
from symtseries_spark.operators.skew import salted_rollup
from symtseries_spark.operators.symbolize import symbolize_windows


def _footer_rows(path: str) -> int:
    """Row count from parquet footers (driver-side walk, no Spark job)."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = 0
    for fp in glob.iglob(os.path.join(path, "**", "*.parquet"), recursive=True):
        total += pq.ParquetFile(fp).metadata.num_rows
    return total


def run_pipeline(
    spark: SparkSession,
    crawl: DataFrame,
    out_dir: str | None = None,
    cfg: EngineConfig | None = None,
    hot_keys: list | None = None,
    checkpoint_path: str | None = None,
    run_id: str | None = None,
) -> dict:
    """Run the full pipeline, persisting every stage output under out_dir
    (a TemporaryDirectory when not given). Returns metrics: rolled-up
    points per tier, words indexed, chunks written, wall sec, points/sec.
    """
    cfg = cfg or EngineConfig()
    tmp = None
    if out_dir is None:
        tmp = tempfile.mkdtemp(prefix="symtseries_pipeline_")
        out_dir = tmp
    t0 = time.time()
    timings: dict[str, float] = {}

    def _mark(label: str, since: float) -> float:
        now = time.time()
        timings[label] = round(now - since, 2)
        return now

    # column pruning happens here: only url, warc_ts, length(text) survive
    # into the shuffle; html bytes never leave the scan.
    src = crawl.select("url", "warc_ts", F.length("text").alias("text_len"))

    if checkpoint_path:
        wm = CP.latest_watermarks(CP.read_checkpoints(spark, checkpoint_path))
        src = CP.filter_new_input(src, "warc_ts", wm, "1m")

    rollup_path = f"{out_dir}/rollup"
    # cluster_by_key: the key repartition rides BETWEEN the two salted agg
    # phases, so the final agg is exchange-free and the written tier comes
    # out key-clustered for two shuffles total (salted partials + key) —
    # not three. Sorting by time within each file removes BOTH downstream
    # repartition+sorts (symbolization and chunk encoding read with
    # clustered=True). On a real warehouse this is the table's bucket/sort
    # spec.
    t1m = salted_rollup(
        src,
        "url",
        "warc_ts",
        F.col("text_len"),
        "1m",
        hot_keys=hot_keys,
        salt_buckets=cfg.salt_buckets,
        cluster_by_key=True,
    )
    _t = _mark("plan_rollup", t0)
    CP.write_partitioned(t1m, rollup_path, "1m", sort_within=("key", "bucket_ts"))
    _t = _mark("write_1m", _t)
    # clustered=True contract: the writer put each key in exactly ONE file
    # (hash repartition) with rows time-sorted, so a read split of exactly
    # one whole file keeps every (key, window/chunk) run contiguous. Spark
    # would happily SPLIT a large file at a row-group boundary mid-key,
    # silently yielding partial windows (NaN frames → wrong '#' words) and
    # duplicate chunk ids. Pin ONE FILE = ONE SPLIT: maxPartitionBytes just
    # above the largest file prevents splitting, and openCostInBytes at the
    # same value prevents Spark from COALESCING several files into one split
    # (a blanket-huge maxPartitionBytes packs every file into a single task
    # and serializes the consumers). On a warehouse this is the
    # bucketed-table property.
    import glob as _glob
    import os as _os

    max_file = max(
        (
            _os.path.getsize(p)
            for p in _glob.iglob(
                f"{rollup_path}/tier=1m/**/*.parquet", recursive=True
            )
        ),
        default=128 << 20,
    )
    _old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    _old_oc = spark.conf.get("spark.sql.files.openCostInBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_file + (1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(max_file + (1 << 20)))
    t1m_r = spark.read.parquet(rollup_path).filter(F.col("tier") == "1m")

    # The cascade chain, symbolization, and chunk encoding are independent
    # consumers of the written 1m tier — submit them as CONCURRENT Spark
    # jobs (threads share the SparkSession; the scheduler interleaves their
    # stages). This overlaps each job's serial phases (planning, commit)
    # with the others' compute, exactly like a multi-tenant cluster keeps
    # executors busy across jobs.
    def _cascades():
        # the 1h tier is ~1/60 of 1m — keep it in memory across the write so
        # the 1d cascade starts immediately instead of re-reading the sink
        t1h = rollup_cascade(t1m_r, "1h").persist()
        CP.write_partitioned(t1h, rollup_path, "1h")
        t1d = rollup_cascade(t1h, "1d")
        CP.write_partitioned(t1d, rollup_path, "1d")
        t1h.unpersist()

    def _index():
        sym = symbolize_windows(
            t1m_r, "1m", "1h", w=cfg.sax.w, c=cfg.sax.c, clustered=True
        )
        build_index(sym, tier="1h").write.mode("overwrite").parquet(
            f"{out_dir}/index"
        )

    def _chunks():
        encode_chunks(
            t1m_r, "1m", "text_len_avg", cfg.chunk_points, clustered=True
        ).write.mode("overwrite").parquet(f"{out_dir}/chunks")

    from concurrent.futures import ThreadPoolExecutor

    def _in_pool(name, fn):
        # one FAIR pool per consumer: with spark.scheduler.mode=FAIR the
        # root schedules POOLS fairly, but same-pool jobs still queue FIFO —
        # distinct pools are what let the three consumers' stages interleave
        # and fill each other's stage-transition bubbles.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        j0 = time.time()
        try:
            fn()
        finally:
            timings[f"job_{name}"] = round(time.time() - j0, 2)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    try:
        with ThreadPoolExecutor(3) as pool:
            futures = [
                pool.submit(_in_pool, name, f)
                for name, f in (
                    ("cascades", _cascades),
                    ("index", _index),
                    ("chunks", _chunks),
                )
            ]
            for fut in futures:
                fut.result()
    finally:
        # always restore the pinned one-file-per-split confs, even when a
        # consumer raises — they must not leak into the rest of the session
        if _old_mpb is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", _old_mpb)
        if _old_oc is None:
            spark.conf.unset("spark.sql.files.openCostInBytes")
        else:
            spark.conf.set("spark.sql.files.openCostInBytes", _old_oc)
    _t = _mark("consumers_concurrent", _t)

    # counts read parquet footers directly on the driver (pyarrow) — zero
    # Spark jobs, so the metric's fixed tail doesn't grow with job count
    n1m = _footer_rows(f"{rollup_path}/tier=1m")
    n1h = _footer_rows(f"{rollup_path}/tier=1h")
    n1d = _footer_rows(f"{rollup_path}/tier=1d")
    nwords = _footer_rows(f"{out_dir}/index")
    nchunks = _footer_rows(f"{out_dir}/chunks")
    _t = _mark("counts", _t)

    if checkpoint_path:
        hw = t1m_r.agg(F.max("bucket_ts")).first()[0]
        CP.append_checkpoint(
            spark, checkpoint_path, "1m", hw, n1m, n1m, run_id=run_id
        )

    if tmp:
        shutil.rmtree(tmp, ignore_errors=True)

    wall = time.time() - t0
    points = n1m + n1h + n1d
    return dict(
        points_1m=n1m,
        points_1h=n1h,
        points_1d=n1d,
        words=nwords,
        chunks=nchunks,
        wall_sec=wall,
        points_per_sec=points / wall if wall else 0.0,
        timings=timings,
    )
