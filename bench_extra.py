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


PROBES = {"gapfill": probe_gapfill}


def main():
    probe = sys.argv[1]
    spark = get_spark("symtseries-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    PROBES[probe](spark)
    spark.stop()


if __name__ == "__main__":
    main()
