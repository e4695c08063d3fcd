"""The flagship end-to-end job: crawl pages → rollup tiers → iSAX index →
Gorilla-compressed chunks, with per-partition checkpointing.

This is the job the benchmark measures (rolled-up points/sec across all
three tiers) and the scaling-efficiency evidence runs at two parallelism
levels. Stage layout (one shuffle each, all else map-side):

  raw scan (column-pruned: url, warc_ts, text-length only)
    → salted 1m rollup  (shuffle on (url, bucket, salt))
    → key-clustered, time-sorted 1m tier, materialized ONCE
    → FOUR concurrent jobs over it (FAIR pools):
        write 1m tier ∥ 1h→1d cascades ∥ symbolize+index ∥ Gorilla chunks

Handoff between the producer and the consumers (``handoff=``):

  * "memory" (default): the sorted 1m tier is persisted and eagerly
    materialized, then ALL FOUR jobs (including the 1m tier write) run
    concurrently against the cache. The tier write's task+commit time —
    previously a fully serial phase between producer and consumers — now
    overlaps consumer compute, and the three consumers share one in-memory
    copy instead of three file scans. The 1m tier of one ingest epoch is
    ~1/60 of the epoch's raw rows × a few numeric columns, so it fits
    cluster storage memory by construction; if it ever didn't,
    handoff="table" is the spill-safe fallback.
  * "table": write the 1m tier first, then run the three consumers against
    the written files (one-file-one-split pinned). This is the layout a
    multi-job warehouse uses when stages are separate applications.

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
    handoff: str | None = None,
) -> dict:
    """Run the full pipeline, persisting every stage output under out_dir
    (a TemporaryDirectory when not given). Returns metrics: rolled-up
    points per tier, words indexed, chunks written, wall sec, points/sec.

    ``handoff`` defaults to $SYMT_PIPELINE_HANDOFF or "memory" (see module
    docstring for the two strategies).
    """
    import os as _os

    if handoff is None:
        handoff = _os.environ.get("SYMT_PIPELINE_HANDOFF", "memory")
    if handoff not in ("memory", "table"):
        raise ValueError(f"handoff must be 'memory' or 'table', got {handoff!r}")
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
    # phases, so the final agg is exchange-free and the tier comes out
    # key-clustered for two shuffles total (salted partials + key) — not
    # three. The explicit (key, bucket_ts) in-partition sort makes every
    # (key, window/chunk) run contiguous AND time-ordered — the contract
    # both clustered=True consumers rely on. On a real warehouse this is
    # the table's bucket/sort spec.
    t1m = salted_rollup(
        src,
        "url",
        "warc_ts",
        F.col("text_len"),
        "1m",
        hot_keys=hot_keys,
        salt_buckets=cfg.salt_buckets,
        cluster_by_key=True,
    ).sortWithinPartitions("key", "bucket_ts")
    _t = _mark("plan_rollup", t0)

    _old_mpb = _old_oc = None
    _conf_pinned = False
    if handoff == "memory":
        # Materialize the sorted 1m tier ONCE, eagerly: the four concurrent
        # jobs below must share cached partitions, not race to compute them
        # (concurrent first-touch of an uncached RDD duplicates work).
        t1m.persist()
        t1m.count()
        t1m_r = t1m
        _t = _mark("materialize_1m", _t)

        def _write_1m():
            CP.write_partitioned(t1m_r, rollup_path, "1m",
                                 sort_within=("key", "bucket_ts"))
    else:
        CP.write_partitioned(t1m, rollup_path, "1m",
                             sort_within=("key", "bucket_ts"))
        _t = _mark("write_1m", _t)
        # clustered=True contract for a FILE handoff: the writer put each
        # key in exactly ONE file per date (hash repartition) with rows
        # time-sorted, so a read split of exactly one whole file keeps
        # every (key, window/chunk) run contiguous. Spark would happily
        # SPLIT a large file at a row-group boundary mid-key, silently
        # yielding partial windows (NaN frames → wrong '#' words) and
        # duplicate chunk ids. Pin ONE FILE = ONE SPLIT: maxPartitionBytes
        # just above the largest file prevents splitting, and
        # openCostInBytes at the same value prevents Spark from COALESCING
        # several files into one split. On a warehouse this is the
        # bucketed-table property. (The memory handoff needs none of this —
        # cached RDD partitions are exact.)
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
        _conf_pinned = True
        t1m_r = spark.read.parquet(rollup_path).filter(F.col("tier") == "1m")
        _write_1m = None

    # The cascade chain, symbolization, and chunk encoding are independent
    # consumers of the materialized 1m tier — submit them (plus, in memory
    # handoff, the tier write itself) as CONCURRENT Spark jobs (threads
    # share the SparkSession; the scheduler interleaves their stages). This
    # overlaps each job's serial phases (planning, commit) with the others'
    # compute, exactly like a multi-tenant cluster keeps executors busy
    # across jobs.
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
        # one FAIR pool per job: with spark.scheduler.mode=FAIR the root
        # schedules POOLS fairly, but same-pool jobs still queue FIFO —
        # distinct pools are what let the concurrent jobs' stages
        # interleave and fill each other's stage-transition bubbles.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        j0 = time.time()
        try:
            fn()
        finally:
            timings[f"job_{name}"] = round(time.time() - j0, 2)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    jobs = [
        ("cascades", _cascades),
        ("index", _index),
        ("chunks", _chunks),
    ]
    if _write_1m is not None:
        jobs.insert(0, ("write_1m", _write_1m))
    try:
        with ThreadPoolExecutor(len(jobs)) as pool:
            futures = [pool.submit(_in_pool, name, f) for name, f in jobs]
            for fut in futures:
                fut.result()
    finally:
        if handoff == "memory":
            t1m.unpersist()
        if _conf_pinned:
            # always restore the pinned one-file-per-split confs, even when
            # a consumer raises — they must not leak into the session
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
        # read the watermark from the WRITTEN tier (column-pruned scan of
        # one timestamp column) — t1m_r may be an already-unpersisted cache
        # whose recompute would replay the whole rollup
        hw = (
            spark.read.parquet(rollup_path)
            .filter(F.col("tier") == "1m")
            .agg(F.max("bucket_ts"))
            .first()[0]
        )
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
