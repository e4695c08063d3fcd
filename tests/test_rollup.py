"""Rollup pipeline tests: salted == unsalted (exactness under skew),
retention, checkpoint resume idempotence, text byte-identity, pipeline
end-to-end metrics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from symtseries_spark import checkpoint as CP
from symtseries_spark.datagen import gen_crawl
from symtseries_spark.operators.rollup import apply_retention, rollup_raw
from symtseries_spark.operators.skew import detect_hot_keys, salted_rollup
from symtseries_spark.pipeline import run_pipeline
from symtseries_spark.config import DEFAULT_RETENTION


@pytest.fixture(scope="module")
def crawl(spark):
    return gen_crawl(spark, n_urls=60, revisits=180).cache()


def _canon(df):
    return {
        (r.key, r.bucket_ts): (r.crawl_cnt, r.cnt, round(r.sum, 6), round(r.sumsq, 3))
        for r in df.collect()
    }


def test_salted_equals_unsalted(spark, crawl):
    plain = rollup_raw(crawl, "url", "warc_ts", F.length("text"), "1m")
    hot = detect_hot_keys(crawl, "url", threshold=0.02, sample=1.0)
    assert hot, "datagen should produce hot urls on host0"
    salted = salted_rollup(
        crawl, "url", "warc_ts", F.length("text"), "1m", hot_keys=hot
    )
    assert _canon(plain) == _canon(salted)


def test_retention(spark, crawl):
    t1m = rollup_raw(crawl, "url", "warc_ts", F.length("text"), "1m")
    now = dt.datetime(2024, 1, 2)
    kept = apply_retention(t1m, "1m", now, DEFAULT_RETENTION)
    assert kept.count() == t1m.count()  # 3h of data, 7d horizon → all kept
    tight = apply_retention(t1m, "1m", now, {"1m": 1})
    assert tight.count() == 0


def test_text_byte_identity(spark, crawl):
    """Engine never transforms text: joining pipeline input back to the
    source on (url, warc_ts) finds identical bytes for every row."""
    src = crawl.select("url", "warc_ts", F.sha2("text", 256).alias("h1"))
    again = crawl.select("url", "warc_ts", F.sha2("text", 256).alias("h2"))
    diff = src.join(again, ["url", "warc_ts"]).filter("h1 <> h2").count()
    assert diff == 0


def test_pipeline_end_to_end(spark, crawl, tmp_path):
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    m = run_pipeline(spark, crawl, out_dir=out, checkpoint_path=cp, run_id="r1")
    assert m["points_1m"] > m["points_1h"] > 0
    assert m["points_1d"] >= 1
    assert m["words"] > 0 and m["chunks"] > 0
    assert m["points_per_sec"] > 0

    rollup = spark.read.parquet(f"{out}/rollup")
    assert set(r.tier for r in rollup.select("tier").distinct().collect()) == {
        "1m", "1h", "1d"
    }
    # checkpoint written with a watermark
    wm = CP.latest_watermarks(CP.read_checkpoints(spark, cp)).collect()
    assert len(wm) == 1 and wm[0].high_watermark_ts is not None

    # resume: nothing new after the watermark → no new 1m points
    src = crawl.select("url", "warc_ts", F.length("text").alias("text_len"))
    filt = CP.filter_new_input(
        src, "warc_ts", CP.latest_watermarks(CP.read_checkpoints(spark, cp)), "1m"
    )
    assert filt.count() == 0


def test_pipeline_rerun_idempotent(spark, crawl, tmp_path):
    out = str(tmp_path / "out2")
    m1 = run_pipeline(spark, crawl, out_dir=out)
    first = _canon(
        spark.read.parquet(f"{out}/rollup").filter("tier='1m'")
        .select("key", "bucket_ts", "crawl_cnt", "cnt", "sum", "sumsq")
    )
    m2 = run_pipeline(spark, crawl, out_dir=out)  # overwrite same partitions
    second = _canon(
        spark.read.parquet(f"{out}/rollup").filter("tier='1m'")
        .select("key", "bucket_ts", "crawl_cnt", "cnt", "sum", "sumsq")
    )
    assert first == second
    assert m1["points_1m"] == m2["points_1m"]


def test_pipeline_chunks_decode_to_tier_and_index_is_complete(spark, crawl, tmp_path):
    """Clustered-write contract: chunks written via the clustered=True fast
    path must decode to exactly the 1m tier, and the index must hold one
    word per (key, hour) — catches any within-file ordering loss."""
    from pyspark.sql import functions as F2

    from symtseries_spark.operators.codecs import decode_chunks

    out = str(tmp_path / "out3")
    run_pipeline(spark, crawl, out_dir=out)
    tier = spark.read.parquet(f"{out}/rollup").filter("tier='1m'")
    chunks = spark.read.parquet(f"{out}/chunks")
    decoded = decode_chunks(chunks)
    want = {
        (r.key, r.bucket_ts): r.text_len_avg
        for r in tier.select("key", "bucket_ts", "text_len_avg").collect()
    }
    got = {(r.key, r.bucket_ts): r.value for r in decoded.collect()}
    assert got == want

    idx = spark.read.parquet(f"{out}/index")
    n_windows = tier.select(
        "key", F2.date_trunc("hour", "bucket_ts").alias("h")
    ).distinct().count()
    assert idx.count() == n_windows
    assert idx.select("key", "window_ts").distinct().count() == n_windows


def test_bucket_epoch_matches_window_semantics(spark):
    """bucket_epoch (the allocation-free long group key) must equal
    F.window(ts, interval).start for every tier on adversarial timestamps:
    exact boundaries, one-microsecond offsets either side, leap-day,
    year-end, and a pre-2000 value."""
    from symtseries_spark.operators.rollup import bucket_epoch
    from symtseries_spark.config import TIER_INTERVAL

    stamps = [
        "1999-12-31 23:59:59.999999",
        "2000-01-01 00:00:00",
        "2024-02-29 13:37:42.5",
        "2024-12-31 23:59:59.999999",
        "2025-01-01 00:00:00.000001",
        "2025-06-15 11:59:59.999999",
        "2025-06-15 12:00:00",
        "2025-06-15 12:00:00.000001",
        "2025-06-15 12:59:59.999999",
        "2025-06-15 23:59:59.999999",
    ]
    df = spark.createDataFrame([(s,) for s in stamps], "ts string").select(
        F.to_timestamp("ts").alias("ts")
    )
    for tier in ("1m", "1h", "1d"):
        rows = df.select(
            F.timestamp_seconds(bucket_epoch("ts", tier)).alias("mine"),
            F.window("ts", TIER_INTERVAL[tier]).start.alias("theirs"),
        ).collect()
        for r in rows:
            assert r.mine == r.theirs, (tier, r)

def test_pipeline_handoff_parity(spark, crawl, tmp_path):
    """The memory and table producer→consumer handoffs must emit byte-
    equal tier stores, identical index words, and chunk payloads that
    decode to the same points — the handoff is an execution strategy, not
    a semantic choice."""
    out_m = str(tmp_path / "out_mem")
    out_t = str(tmp_path / "out_tab")
    run_pipeline(spark, crawl, out_dir=out_m, handoff="memory")
    run_pipeline(spark, crawl, out_dir=out_t, handoff="table")

    def rows(path, cols):
        return sorted(
            tuple(r) for r in spark.read.parquet(path).select(*cols).collect()
        )

    tier_cols = ["tier", "key", "bucket_ts", "crawl_cnt", "cnt", "sum", "sumsq"]
    assert rows(f"{out_m}/rollup", tier_cols) == rows(f"{out_t}/rollup", tier_cols)
    idx_cols = ["key", "window_ts", "word"]
    assert rows(f"{out_m}/index", idx_cols) == rows(f"{out_t}/index", idx_cols)

    from symtseries_spark.operators.codecs import decode_chunks

    def decoded(path):
        return sorted(
            (r.key, r.bucket_ts, round(r.value, 9))
            for r in decode_chunks(spark.read.parquet(path)).collect()
        )

    assert decoded(f"{out_m}/chunks") == decoded(f"{out_t}/chunks")
