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


def test_clustered_rollup_costs_two_exchanges(spark):
    """cluster_by_key fuses the key repartition into the salted agg: the
    executed plan must contain exactly TWO exchanges (salted partials +
    key), never a third for the final agg."""
    from symtseries_spark.operators.skew import salted_rollup

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:05", 3.0), ("b", "2024-01-01 00:01:07", 4.0)],
        "url string, ts string, v double",
    ).select("url", F.to_timestamp("ts").alias("ts"), "v")
    out = salted_rollup(
        df, "url", "ts", F.col("v"), "1m", hot_keys=["a"], cluster_by_key=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan


def test_mindist_scan_udf_runs_per_distinct_word(spark, sf_dir):
    """The mindist Arrow UDF must be evaluated on the DISTINCT vocabulary
    and broadcast-joined back — not once per index row."""
    plan = assert_plan(
        E.q_mindist_topk_daily(spark, sf_dir),
        contains=("BroadcastHashJoin",),
    )
    # the UDF eval sits above an aggregate (the distinct), i.e. in the
    # small per-word branch, and the join brings it back to the index rows
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_asof_join_is_single_window_shuffle(spark):
    """asof_join must stay the union-window shape: a Window over ONE
    key-hash Exchange of the union — never a range join (BroadcastNestedLoop
    / CartesianProduct), whose probe x build blow-up is the scale trap."""
    from symtseries_spark.operators.joins import asof_join

    probe = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 5.0)], "key long, ts string, v double"
    ).select("key", F.to_timestamp("ts").alias("ts"), "v")
    build = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "key long, ts string, b double"
    ).select("key", F.to_timestamp("ts").alias("ts"), "b")
    out = asof_join(probe, build, on="key", build_cols=("b",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_m4_downsample_is_partial_agg_no_window(spark, sf_dir):
    """M4 compiles to a partial+final aggregate over packed structs.
    Spark lowers struct min/max to SortAggregate (structs aren't mutable
    hash-buffer types). Round 6 moves the whole aggregate POST-shuffle
    (repartition on the group keys first): pixel buckets hold few points,
    so the map-side partial reduced nothing and only ran a serial sort
    inside the scan tasks. The scale property that matters still holds —
    exactly ONE exchange, carrying rows of the same width as the output
    cardinality — where the row_number window formulation would sort the
    shuffled rows under three different orderings."""
    plan = assert_plan(
        E.q_m4_downsample_1h(spark, sf_dir),
        contains=("partial_min", "partial_max"),
        absent=("Window",),
    )
    # exactly one exchange node in the plan tree: the partial->final
    # boundary (formatted plans repeat the node name in the detail block,
    # so count tree entries only)
    assert plan.count("+- Exchange") == 1, plan


def test_histogram_shuffles_output_cardinality(spark, sf_dir):
    """Histogram tier: partial aggregation must happen map-side (shuffle
    carries (bucket, bin) partials, not raw events)."""
    assert_plan(
        E.q_value_histogram_daily(spark, sf_dir),
        contains=("HashAggregate", "partial_"),
        absent=("Window",),
    )


def test_daily_discords_fused_plan(spark, sf_dir):
    """The fused discord plan must stay join-free: one collect_list agg
    exchange + one pinned repartition feed a single Arrow UDF — no pair
    join, no day-count join, no rank window (all fused into the UDF)."""
    plan = assert_plan(
        E.q_sax_discords_daily(spark, sf_dir),
        contains=("ArrowEvalPython",),
        absent=("SortMergeJoin", "BroadcastHashJoin", "Window"),
    )
    # exchanges: collect_list shuffle + explicit key repartition, nothing
    # else (formatted explain mentions each node twice — tree line +
    # detail header — so count the numbered detail headers only)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan
