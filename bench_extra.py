#!/usr/bin/env python
"""Extra isolation benchmarks (guide §1.4: noop-sink per-piece timing).

NOT part of the frozen driver contract — bench.py is the measured surface.
Usage: python bench_extra.py <probe> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from symtseries_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label, fn, n=2):
    runs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    print(f"{label:40s} min={min(runs):8.3f}  runs={runs}", flush=True)


def probe_gapfill(spark):
    import __spark_entry__ as E
    from symtseries_spark.operators.gapfill import dense_spine, gapfill

    sc = spark.sparkContext

    r = E._events_rollup(spark, SF_DIR, "1h")
    timeit(spark, "rollup_1h only", lambda: noop(r))

    spine = dense_spine(r, "1h")
    timeit(spark, "spine (explode)", lambda: noop(spine))

    joined = spine.join(
        r.select("key", "bucket_ts", F.col("text_len_avg").alias("value")),
        ["key", "bucket_ts"], "left")
    timeit(spark, "spine+join", lambda: noop(joined))

    g = gapfill(r.withColumn("text_len_avg", F.round("text_len_avg", 6)),
                "1h", value_col="text_len_avg", methods=("locf",))
    timeit(spark, "gapfill locf only", lambda: noop(g))

    g2 = gapfill(r.withColumn("text_len_avg", F.round("text_len_avg", 6)),
                 "1h", value_col="text_len_avg", methods=("locf", "linear"))
    timeit(spark, "gapfill locf+linear", lambda: noop(g2))

    q = E.q_gapfill_1h(spark, SF_DIR)
    timeit(spark, "q_gapfill_1h full", lambda: noop(q))
    with open("/tmp/gapfill_explain.txt", "w") as f:
        f.write(q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"))
    print("plan written to /tmp/gapfill_explain.txt")


def _explain(df, path):
    with open(path, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def probe_heads(spark):
    """Time every headline query (noop sink) + dump formatted plans."""
    import __spark_entry__ as E

    names = [
        "rollup_1m", "rollup_1h", "gapfill_1h", "sax_words_daily",
        "mindist_topk_daily", "gorilla_roundtrip_1h", "minhash_dupes_docs",
        "embedding_topk", "dedup_exact_docs", "asof_rollup_1h",
        "user_sessions_30m", "m4_downsample_1h", "sax_discords_daily",
    ]
    qs = E.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        _explain(df, f"/tmp/plan_{name}.txt")
        timeit(spark, name, lambda df=df: noop(df), n=3)


def probe_mindist(spark):
    import __spark_entry__ as E
    from symtseries_spark.operators.index import build_index, knn_query

    words = E._daily_words(spark, SF_DIR)
    timeit(spark, "daily_words", lambda: noop(words))
    r = E._events_rollup(spark, SF_DIR, "1h")
    timeit(spark, "rollup_1h", lambda: noop(r))
    idx = build_index(words, "1d")
    timeit(spark, "build_index", lambda: noop(idx))
    q = knn_query(idx, "DDDDAAAADDDD", 8, k=20, n_query=24)
    timeit(spark, "knn_full", lambda: noop(q))


def probe_gorilla(spark):
    import __spark_entry__ as E
    from symtseries_spark.operators.codecs import decode_chunks, encode_chunks

    r = E._events_rollup(spark, SF_DIR, "1h")
    timeit(spark, "rollup_1h", lambda: noop(r))
    chunks = encode_chunks(r, "1h", "text_len_avg", chunk_points=256)
    timeit(spark, "encode", lambda: noop(chunks))
    dec = decode_chunks(chunks)
    timeit(spark, "encode+decode", lambda: noop(dec))


def probe_minhash(spark):
    import shutil
    import __spark_entry__ as E
    from symtseries_spark.operators import dedup as D

    docs = E._docs(spark, SF_DIR)
    path = E._ann_index_dir(SF_DIR, "mhsig", "p64k5", src="documents.parquet")
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    sig0 = E._minhash_sig(spark, SF_DIR)
    print(f"{'sig build (cold)':40s} {time.time()-t0:8.3f}", flush=True)
    timeit(spark, "sig read", lambda: noop(sig0))
    q = D.minhash_lsh_dupes(docs, threshold=0.5, sig=sig0)
    _explain(q, "/tmp/plan_minhash_lsh.txt")
    timeit(spark, "lsh_dupes (stored sig)", lambda: noop(q), n=3)


def probe_discords(spark):
    import __spark_entry__ as E

    w = E._daily_words_stored(spark, SF_DIR)
    timeit(spark, "stored words read", lambda: noop(w))
    q = E.queries()["sax_discords_daily"](spark, SF_DIR)
    timeit(spark, "discords full", lambda: noop(q), n=3)


PROBES = {
    "gapfill": probe_gapfill,
    "heads": probe_heads,
    "mindist": probe_mindist,
    "gorilla": probe_gorilla,
    "minhash": probe_minhash,
    "discords": probe_discords,
}


def main():
    probe = sys.argv[1]
    spark = get_spark("symtseries-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    PROBES[probe](spark)
    spark.stop()


if __name__ == "__main__":
    main()
