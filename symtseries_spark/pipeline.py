"""The flagship end-to-end job: crawl pages → rollup tiers → iSAX index →
Gorilla-compressed chunks, with per-partition checkpointing.

This is the job the benchmark measures (rolled-up points/sec across all
three tiers) and the scaling-efficiency evidence runs at two parallelism
levels. Stage layout (one shuffle each, all else map-side):

  raw scan (column-pruned: url, warc_ts, text-length only)
    → salted 1m rollup  (shuffle on (url, bucket, salt))
    → 1h cascade        (shuffle on (url, hour) — 1/60 the rows)
    → 1d cascade        (shuffle on (url, day)  — 1/24 of that)
    → window assembly + symbolization (reuses the 1m partitioning)
    → index + compressed chunks (map-side from cached tier frames)
"""

from __future__ import annotations

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


def run_pipeline(
    spark: SparkSession,
    crawl: DataFrame,
    out_dir: str | None = None,
    cfg: EngineConfig | None = None,
    hot_keys: list | None = None,
    checkpoint_path: str | None = None,
    run_id: str | None = None,
) -> dict:
    """Run the full pipeline; persist outputs when out_dir is given.

    Returns metrics: rolled-up points per tier, words indexed, chunks
    written, wall seconds, points/sec.
    """
    cfg = cfg or EngineConfig()
    t0 = time.time()

    # column pruning happens here: only url, warc_ts, length(text) survive
    # into the shuffle; html bytes never leave the scan.
    src = crawl.select("url", "warc_ts", F.length("text").alias("text_len"))

    if checkpoint_path:
        wm = CP.latest_watermarks(CP.read_checkpoints(spark, checkpoint_path))
        src = CP.filter_new_input(src, "warc_ts", wm, "1m")

    t1m = salted_rollup(
        src,
        "url",
        "warc_ts",
        F.col("text_len"),
        "1m",
        hot_keys=hot_keys,
        salt_buckets=cfg.salt_buckets,
    )
    t1m = t1m.persist()
    t1h = rollup_cascade(t1m, "1h").persist()
    t1d = rollup_cascade(t1h, "1d")

    sym = symbolize_windows(t1m, "1m", "1h", w=cfg.sax.w, c=cfg.sax.c)
    index = build_index(sym, tier="1h")
    chunks = encode_chunks(t1m, "1m", "text_len_avg", cfg.chunk_points)

    metrics = {}
    if out_dir:
        CP.write_partitioned(t1m, f"{out_dir}/rollup", "1m")
        CP.write_partitioned(t1h, f"{out_dir}/rollup", "1h")
        CP.write_partitioned(t1d, f"{out_dir}/rollup", "1d")
        index.write.mode("overwrite").parquet(f"{out_dir}/index")
        chunks.write.mode("overwrite").parquet(f"{out_dir}/chunks")
        n1m = spark.read.parquet(f"{out_dir}/rollup").filter("tier='1m'").count()
        n1h = spark.read.parquet(f"{out_dir}/rollup").filter("tier='1h'").count()
        n1d = spark.read.parquet(f"{out_dir}/rollup").filter("tier='1d'").count()
        nwords = spark.read.parquet(f"{out_dir}/index").count()
        nchunks = spark.read.parquet(f"{out_dir}/chunks").count()
    else:
        n1m, n1h, n1d = t1m.count(), t1h.count(), t1d.count()
        nwords = index.count()
        nchunks = chunks.count()

    if checkpoint_path:
        hw = t1m.agg(F.max("bucket_ts")).first()[0]
        rows_in = n1m  # proxy; raw row count would force a second scan
        CP.append_checkpoint(
            spark, checkpoint_path, "1m", hw, rows_in, n1m, run_id=run_id
        )

    t1m.unpersist()
    t1h.unpersist()
    wall = time.time() - t0
    points = n1m + n1h + n1d
    metrics.update(
        points_1m=n1m,
        points_1h=n1h,
        points_1d=n1d,
        words=nwords,
        chunks=nchunks,
        wall_sec=wall,
        points_per_sec=points / wall if wall else 0.0,
    )
    return metrics
