#!/usr/bin/env python
"""spark-submit entry point for the rollup pipeline.

Cluster usage (the north-rule packaging):

    bash scripts/make_pyfiles.sh                       # builds dist/symtseries_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/symtseries_spark.zip \
        scripts/submit_job.py \
        --input  <crawl table path> \
        --output <warehouse path> \
        --checkpoint <checkpoint table path>

Local smoke: spark-submit --master 'local[8]' --py-files dist/symtseries_spark.zip \
    scripts/submit_job.py --input .bench_data/crawl_sf0.01.parquet --output /tmp/out
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    # getOrCreate: master/conf come from spark-submit, not hard-coded here
    spark = SparkSession.builder.appName("symtseries-rollup").getOrCreate()
    from symtseries_spark.pipeline import run_pipeline

    crawl = spark.read.parquet(args.input)
    metrics = run_pipeline(
        spark,
        crawl,
        out_dir=args.output,
        checkpoint_path=args.checkpoint,
        run_id=args.run_id,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
