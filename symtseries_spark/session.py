"""SparkSession factory tuned for the engine.

All knobs here are scale-oriented defaults: AQE on (runtime coalescing +
skew-join splitting), Arrow batching for pandas UDFs, and a shuffle
partition count that AQE can shrink. On a real cluster these come from
spark-submit conf; locally they make local[N] behave like a miniature
cluster.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

#: FAIR pool weights ∝ measured consumer work (cascade tiers : iSAX index :
#: chunk encode ≈ 1 : 2 : 3 serial wall on the r2 ladder). Equal-weight
#: pools let the heaviest consumer straggle alone at the end of the phase;
#: work-proportional shares make the three consumers finish together.
#: write_1m is the memory-handoff pipeline's concurrent tier write — light
#: (cache → parquet, no compute), weight 1.
POOL_WEIGHTS = {"cascades": 1, "index": 2, "chunks": 3, "write_1m": 1}


def _allocation_file() -> str:
    env = os.environ.get("SYMT_POOL_WEIGHTS")  # e.g. "1,1,1" for an A/B
    weights = dict(POOL_WEIGHTS)
    if env:
        for name, w in zip(POOL_WEIGHTS, env.split(",")):
            weights[name] = int(w)
    pools = "\n".join(
        f'  <pool name="{name}">\n'
        f"    <schedulingMode>FIFO</schedulingMode>\n"
        f"    <weight>{w}</weight>\n"
        f"    <minShare>0</minShare>\n"
        f"  </pool>"
        for name, w in weights.items()
    )
    xml = f'<?xml version="1.0"?>\n<allocations>\n{pools}\n</allocations>\n'
    path = os.path.join(
        tempfile.gettempdir(),
        f"symtseries_fair_allocation_{'_'.join(map(str, weights.values()))}.xml",
    )
    with open(path, "w") as f:
        f.write(xml)
    return path


def get_spark(
    app_name: str = "symtseries-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches: the vectorized UDF kernels (symbolize, encode,
        # signatures) amortize their per-batch numpy setup over 64k rows
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # FAIR scheduling lets concurrently-submitted jobs (the pipeline's
        # cascade/index/chunks consumers) interleave tasks, filling the
        # stage-transition bubbles that FIFO leaves idle at high core counts
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", _allocation_file())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
