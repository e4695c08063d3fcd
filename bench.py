#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The headline is the north-rule metric: rolled-up points/sec through the
full crawl pipeline (1m→1h→1d tiers + iSAX words + Gorilla chunks) on a
deterministic synthetic crawl table sized to the SF.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from symtseries_spark.session import get_spark  # noqa: E402
from symtseries_spark.datagen import gen_crawl  # noqa: E402
from symtseries_spark.pipeline import run_pipeline  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_data")

#: crawl-table size per SF: urls × 1440 one-minute revisits (one day)
CRAWL_URLS = {"0.001": 60, "0.01": 400, "0.1": 2500}


def _host_snapshot() -> dict:
    """CPU-time counters + 1-min load, for disclosing how contended the
    shared-VM host was DURING the bench (hypervisor steal shows up as the
    `steal` field of /proc/stat; it is CPU time taken from this VM by
    co-tenants and is invisible to per-process accounting)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # user nice system idle iowait irq softirq steal
        vals = [int(x) for x in parts[1:9]]
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        return {"total": sum(vals), "steal": vals[7], "iowait": vals[4],
                "load1": load1}
    except Exception:
        return {}


def _host_report(a: dict, b: dict) -> dict:
    """Steal/iowait as % of all CPU time elapsed between two snapshots."""
    if not a or not b or b.get("total", 0) <= a.get("total", 0):
        return {}
    dt = b["total"] - a["total"]
    return {
        "steal_pct": round(100.0 * (b["steal"] - a["steal"]) / dt, 2),
        "iowait_pct": round(100.0 * (b["iowait"] - a["iowait"]) / dt, 2),
        "load1_start": a["load1"],
        "load1_end": b["load1"],
    }


def _sf_of(path: str) -> str:
    base = os.path.basename(path.rstrip("/"))
    return base.replace("sf", "") if base.startswith("sf") else "0.1"


def _crawl_path(sf: str) -> str:
    return os.path.join(BENCH_DATA, f"crawl_sf{sf}.parquet")


def ensure_crawl(spark, sf: str) -> str:
    path = _crawl_path(sf)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        n_urls = CRAWL_URLS.get(sf, 2500)
        gen_crawl(spark, n_urls=n_urls, revisits=1440).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def bench_pipeline(spark, sf: str) -> tuple[float, float, dict]:
    """(cold_sec, warm_sec, metrics-of-warm-run).

    Cold = the FIRST full-input pipeline run in this JVM (includes
    whole-stage-codegen compilation, JIT, and Python-UDF worker spawn —
    what a one-shot job pays). Warm = an identical second run (what a
    long-running cluster amortizes to). Both are recorded in the JSON so
    cross-round comparisons stay like-for-like (r2 verdict #6): r1's
    pipeline number was cold, r2's was warm."""
    path = ensure_crawl(spark, sf)
    out = os.path.join(BENCH_DATA, f"out_sf{sf}")
    crawl = spark.read.parquet(path)
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    run_pipeline(spark, crawl, out_dir=out)
    cold = time.time() - t0
    # warm = min of post-JIT runs (the shared-VM host shows bursty
    # co-tenant contention — hypervisor CPU steal up to ~7% of a bench
    # run's CPU time, and identical back-to-back runs observed swinging
    # 8-31 s on the r4 code; best-of-N recovers the machine-limited
    # number — same rationale as the adaptive per-query repeats below).
    # ADAPTIVE: 3 runs when the two best agree within 15%, up to 5 when
    # they don't — this entry is the noisiest (the only write-heavy
    # multi-job one). The returned metrics dict is the one from the SAME
    # run as the min wall, so the per-consumer breakdown matches the
    # reported warm total. All raw samples go into the JSON.
    warms = []
    while len(warms) < 5:
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        m = run_pipeline(spark, crawl, out_dir=out)
        warms.append((time.time() - t0, m))
        walls = sorted(w for w, _ in warms)
        if len(warms) >= 3 and walls[1] <= 1.15 * walls[0]:
            break
    wall, m = min(warms, key=lambda x: x[0])
    m["warm_runs"] = [round(w, 3) for w, _ in warms]
    return cold, wall, m


def bench_incremental(spark, sf: str) -> dict:
    """The continuous-aggregate maintenance path (VERDICT r3 #7): seed the
    tier store from the full crawl table, then time an upsert of ~1% new
    input landing in a NEW date partition. Work must scale with the
    touched dates, not the store size — this is the number that makes the
    'resumable reruns' claim quantitative."""
    import glob

    from symtseries_spark import checkpoint as CP
    from symtseries_spark.operators.rollup import rollup_raw
    from symtseries_spark.pipeline import _footer_rows

    path = ensure_crawl(spark, sf)
    crawl = spark.read.parquet(path)
    store = os.path.join(BENCH_DATA, f"inc_store_sf{sf}")
    shutil.rmtree(store, ignore_errors=True)

    t0 = time.time()
    seed = rollup_raw(crawl, "url", "warc_ts", F.length("text"), "1m")
    CP.upsert_tiers_increment(spark, seed, store)
    seed_sec = time.time() - t0

    # ~1% new input: 15 more one-minute revisits per url, deterministically
    # generated and shifted one day past the seed's span (append-mostly
    # time series: new data lands in new date partitions)
    n_urls = CRAWL_URLS.get(sf, 2500)
    new = gen_crawl(spark, n_urls=n_urls, revisits=15).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    upd = rollup_raw(new, "url", "warc_ts", F.length("text"), "1m")
    t0 = time.time()
    CP.upsert_tiers_increment(spark, upd, store)
    inc_sec = time.time() - t0

    all_dates = sorted(
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(os.path.join(store, "tier=1m", "bucket_date=*"))
    )
    touched = all_dates[-1]
    inc_points = sum(
        _footer_rows(os.path.join(store, f"tier={t}", f"bucket_date={touched}"))
        for t in ("1m", "1h", "1d")
    )
    return {
        "seed_sec": round(seed_sec, 3),
        "sec": round(inc_sec, 3),
        "new_points": inc_points,
        "new_points_per_sec": round(inc_points / inc_sec, 1) if inc_sec else 0.0,
        "touched_dates": 1,
        "store_dates": len(all_dates),
    }


def bench_streaming_tiers(spark, sf: str) -> dict:
    """One availableNow epoch of the TRUE streaming continuous-aggregate
    path over the crawl table (VERDICT r3 #8): watermarked update-mode 1m
    rollup → foreachBatch upsert into the partitioned tier store with
    partial 1h/1d re-cascade. Min-of-3 full epochs, each against a FRESH
    store + checkpoint (the same host-noise policy as every other entry —
    nothing is amortized across runs); per-phase upsert timings of the
    min run are disclosed so the epoch cost stays decomposable
    (merge / cascade / write vs streaming-agg + microbatch framework)."""
    import glob

    from symtseries_spark.pipeline import _footer_rows
    from symtseries_spark.streaming.ingest import streaming_tiers

    path = ensure_crawl(spark, sf)
    runs = []
    # adaptive like the other entries: 3 full epochs, a 4th only when the
    # two best disagree by >20% (each epoch is expensive — fresh store +
    # checkpoint — so the noisy-window budget is one extra sample)
    while len(runs) < 4:
        store = os.path.join(BENCH_DATA, f"stream_store_sf{sf}")
        cp = os.path.join(BENCH_DATA, f"stream_cp_sf{sf}")
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(cp, ignore_errors=True)

        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        ).parquet(path)
        phases: dict = {}
        writer = streaming_tiers(
            stream, store, "url", "warc_ts", F.length("text"), cp,
            timings_out=phases,
        )
        t0 = time.time()
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        runs.append((time.time() - t0, phases))
        walls = sorted(r for r, _ in runs)
        if len(runs) >= 3 and walls[1] <= 1.20 * walls[0]:
            break
    sec, phases = min(runs, key=lambda x: x[0])
    dates = len(glob.glob(os.path.join(store, "tier=1m", "bucket_date=*")))
    points = _footer_rows(store)
    upsert_total = sum(p.get("total", 0.0) for p in phases.values())
    return {
        "sec": round(sec, 3),
        "runs": [round(r, 3) for r, _ in runs],
        "points": points,
        "points_per_sec": round(points / sec, 1) if sec else 0.0,
        "partitions_rewritten_dates": dates,
        "upsert_phases": phases,
        "agg_framework_sec": round(sec - upsert_total, 3),
    }


def bench_word_index_build(spark) -> dict:
    """Build cost of the stored daily-words index (verdict r4 #4): the
    1m→1h rollup + symbolization that every word-level query used to pay
    per call now runs ONCE here; sax_discords_daily below reads the
    store. Forced rebuild so the build cost is measured and disclosed
    every round, never amortized away silently."""
    path = E._ann_index_dir(SF_DIR, "words1d", "w12c8_1h", src="events.parquet")
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    E._daily_words_stored(spark, SF_DIR)
    return {"build_sec": round(time.time() - t0, 3)}


def bench_promoted_iter_probe(spark) -> dict:
    """Stored recursively-promoted index (verdict r4 #8): time the build
    once, then the partition-pruned probe (min-of-3), plus one ad-hoc
    run of the same lookup that re-derives words + promotion per call —
    the pair quantifies what storing the index buys."""
    import numpy as np

    from symtseries_spark.operators.index import (
        build_promoted_index_iter,
        promoted_lookup_iter,
        promoted_lookup_iter_indexed,
        read_promoted_meta,
    )

    path = os.path.join(BENCH_DATA, "promoted_iter_idx")
    shutil.rmtree(path, ignore_errors=True)
    words = E._daily_words(spark, SF_DIR).persist()
    try:
        t0 = time.time()
        hot = (
            words.groupBy("word")
            .count()
            .orderBy(F.col("count").desc(), F.col("word"))
            .first()
        )
        probe = (
            words.filter(F.col("word") == hot.word)
            .orderBy("key", "window_ts")
            .select("series")
            .first()
        )
        seg0 = next((i for i, ch in enumerate(hot.word) if ch != "#"), 0)
        segs = (seg0, seg0 + 1) if seg0 + 1 < len(hot.word) else (seg0,)
        build_promoted_index_iter(
            words, path, segs, threshold=20, w=12, c=8, n=24,
            extra_meta={"probe": [float(x) for x in probe.series]},
        )
        build = round(time.time() - t0, 3)
    finally:
        words.unpersist()

    qs_arr = np.array(read_promoted_meta(path)["probe"], dtype=float)
    runs = []
    for _ in range(3):
        t0 = time.time()
        promoted_lookup_iter_indexed(spark, path, qs_arr).write.format(
            "noop"
        ).mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))

    # ad-hoc comparison: same lookup with per-call derivation + promotion
    t0 = time.time()
    promoted_lookup_iter(
        E._daily_words(spark, SF_DIR), qs_arr, w=12, c=8, n=24,
        segments=segs, threshold=20,
    ).write.format("noop").mode("overwrite").save()
    adhoc = round(time.time() - t0, 3)
    return {
        "build_sec": build,
        "probe_sec": min(runs),
        "probe_runs": runs,
        "adhoc_sec": adhoc,
    }


def main() -> None:
    sf = _sf_of(SF_DIR)
    spark = get_spark("symtseries-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    host0 = _host_snapshot()

    cold, warm, pm = bench_pipeline(spark, sf)
    timings["rollup_pipeline"] = round(warm, 3)

    headline = [
        "rollup_1m",
        "rollup_1h",
        "gapfill_1h",
        "sax_words_daily",
        "mindist_topk_daily",
        "gorilla_roundtrip_1h",
        "minhash_dupes_docs",
        "embedding_topk",
        "dedup_exact_docs",
        "asof_rollup_1h",
        "user_sessions_30m",
        "m4_downsample_1h",
        "sax_discords_daily",
    ]
    widx = bench_word_index_build(spark)

    qs = E.queries()
    all_runs: dict[str, list] = {}
    for name in headline:
        # timed runs per query, report the MIN (noise-robust: the shared-VM
        # host shows bursty co-tenant contention — hypervisor steal up to
        # ~7% of CPU time measured across a single bench run — and
        # best-of-N is the standard way to recover the machine-limited
        # number). ADAPTIVE repeats: 3 runs when the two best samples
        # agree within 15% (quiet window), up to 5 when they don't (i.e.
        # extra samples are spent exactly when a contention burst hit).
        # All raw samples are recorded in queries_runs for honesty.
        runs = []
        while len(runs) < 5:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            if len(runs) >= 3 and sorted(runs)[1] <= 1.15 * min(runs):
                break
        all_runs[name] = runs
        timings[name] = min(runs)

    inc = bench_incremental(spark, sf)
    timings["incremental_rerun_1pct"] = inc["sec"]
    st = bench_streaming_tiers(spark, sf)
    timings["streaming_tiers_epoch"] = st["sec"]
    pp = bench_promoted_iter_probe(spark)
    timings["promoted_iter_probe"] = pp["probe_sec"]

    total = round(sum(timings.values()), 3)
    points = pm["points_1m"] + pm["points_1h"] + pm["points_1d"]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "pipeline_points": points,
        "pipeline_points_per_sec": round(points / timings["rollup_pipeline"], 1),
        "pipeline_counts": {
            k: pm[k] for k in ("points_1m", "points_1h", "points_1d", "words", "chunks")
        },
        # cold = first full run in the JVM (codegen/JIT/worker spawn
        # included); "rollup_pipeline" above is the min of three warm runs
        # (raw per-query samples in queries_runs)
        "timing_method": "min_of_3",
        "rollup_pipeline_cold": round(cold, 3),
        "rollup_pipeline_warm_runs": pm.get("warm_runs", []),
        # shared-VM contention DURING this bench run (see _host_snapshot):
        # steal_pct is hypervisor CPU theft by co-tenant VMs — the noise
        # floor every wall-clock above sits on
        "host": _host_report(host0, _host_snapshot()),
        "incremental": inc,
        "streaming_tiers": st,
        "words_index": widx,
        "promoted_iter_probe": pp,
        "queries_runs": all_runs,
        "pipeline_consumer_secs": {
            k: v for k, v in pm.get("timings", {}).items()
            if k.startswith("job_")
        },
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
