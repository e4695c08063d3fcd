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

#: FAIR pool weights ∝ measured consumer work. Re-tuned for the round-4
#: memory handoff (consumers read the cached 1m tier, not files): the
#: cascade chain — two dependent shuffles + two partitioned writes — is
#: now the longest critical path and straggled alone under the old
#: 1:2:3 split (3.6 s vs 2.7 s peers at local[32]); cascades-heavy
#: weights bring all four jobs' finishes within ~0.3 s of each other and
#: cut the warm pipeline wall ~1.6×. write_1m (cache → parquet, no
#: compute) stays light. Override with SYMT_POOL_WEIGHTS="c,i,ch,w" for
#: A/B runs.
POOL_WEIGHTS = {"cascades": 3, "index": 2, "chunks": 2, "write_1m": 1}


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
