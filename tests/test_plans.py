"""Plan-property regression tests: the physical plans the engine depends on
at scale must not silently regress (docs/PLANS.md is the audit record)."""

from pyspark.sql import functions as F

import __spark_entry__ as E
from symtseries_spark.plans import assert_plan


def test_rollup_plan_properties(spark, sf_dir):
    plan = assert_plan(
        E.q_rollup_1m(spark, sf_dir),
        contains=("HashAggregate", "partial_"),
    )
    # column pruning: scan must read only the three needed columns
    assert "ReadSchema: struct<ts:timestamp" in plan
    assert "props" not in plan and "event_type" not in plan


def test_join_is_broadcast(spark, sf_dir):
    assert_plan(
        E.q_nation_revenue(spark, sf_dir),
        contains=("BroadcastHashJoin",),
        absent=("SortMergeJoin",),
    )


def test_topk_avoids_global_sort(spark, sf_dir):
    assert_plan(
        E.q_mindist_topk_daily(spark, sf_dir),
        contains=("TakeOrderedAndProject",),
    )


def test_retention_filter_pushed(spark, sf_dir):
    plan = assert_plan(E.q_retention_1m(spark, sf_dir), contains=("PushedFilters",))
    assert "IsNotNull(ts)" in plan
