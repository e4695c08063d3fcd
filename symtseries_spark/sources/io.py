"""Table IO abstraction: Iceberg when the runtime is present, Parquet
otherwise.

The north rule targets Iceberg tables. This sandbox has no Iceberg runtime
jar, so the engine routes every read/write through this module and picks
the format at runtime:

  * Iceberg available → `spark.table` / `writeTo(...).append()` /
    overwritePartitions(), partition specs via table properties, retention
    via metadata-only `DELETE WHERE bucket_ts < horizon`.
  * Parquet fallback → path-based tables with hive-style partitioning and
    dynamic partition overwrite (same idempotent overwrite-by-partition
    semantics the checkpoint layer relies on).

Everything above this module is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Format-routing reader/writer. `base` is a warehouse path (parquet
    mode) or a catalog namespace (iceberg mode)."""

    def __init__(self, spark: SparkSession, base: str, fmt: str | None = None):
        self.spark = spark
        self.base = base.rstrip("/")
        if fmt is None:
            fmt = "iceberg" if iceberg_available(spark) else "parquet"
        self.fmt = fmt

    def _loc(self, name: str) -> str:
        if self.fmt == "iceberg":
            return f"{self.base}.{name}"
        return f"{self.base}/{name}"

    def read(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.table(self._loc(name))
        return self.spark.read.parquet(self._loc(name))

    def write(self, df: DataFrame, name: str, partition_by: tuple = (),
              mode: str = "overwrite_partitions") -> None:
        if self.fmt == "iceberg":
            writer = df.writeTo(self._loc(name))
            if mode == "append":
                writer.append()
            elif mode == "overwrite_partitions":
                writer.overwritePartitions()
            else:
                writer.using("iceberg").createOrReplace()
            return
        w = df.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        if mode == "append":
            w.mode("append").parquet(self._loc(name))
        else:
            (
                w.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(self._loc(name))
            )

    def expire(self, name: str, ts_col: str, horizon_ts) -> None:
        """Retention enforcement. Iceberg: metadata-only DELETE; parquet:
        rewrite-filtering (partition-pruned when ts_col is a partition)."""
        if self.fmt == "iceberg":
            self.spark.sql(
                f"DELETE FROM {self._loc(name)} WHERE {ts_col} < "
                f"TIMESTAMP '{horizon_ts}'"
            )
            return
        df = self.read(name).filter(F.col(ts_col) >= F.lit(horizon_ts))
        df.write.mode("overwrite").parquet(self._loc(name) + "_retained")
