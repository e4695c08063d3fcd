"""Unit semantics for per-series derived signals (operators/series.py)."""

import datetime as dt

from pyspark.sql import Row

from symtseries_spark.operators.series import (
    counter_rate,
    histogram_tier,
    time_weighted_avg,
    top_n_per_group,
)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def test_counter_rate_reset_detection(spark):
    rows = [Row(key=1, ts=_ts(0), value=10.0, event_id=1),
            Row(key=1, ts=_ts(10), value=25.0, event_id=2),
            Row(key=1, ts=_ts(20), value=5.0, event_id=3)]  # reset!
    out = {
        r["event_id"]: (r["delta"], r["rate_per_s"])
        for r in counter_rate(
            spark.createDataFrame(rows), "key", "ts", "value", ("event_id",)
        ).collect()
    }
    assert out[1] == (None, None)          # first sample: no predecessor
    assert out[2] == (15.0, 1.5)           # monotonic increase
    assert out[3] == (5.0, 0.5)            # reset: increase = new value


def test_time_weighted_avg_locf_weighting(spark):
    # t=0 v=0 holds 1800s, t=1800 v=10 holds to bucket end (1800s) -> TWA 5;
    # arithmetic mean of a burst (0,0,0,10 in last second) would be 2.5,
    # TWA stays ~0 - pin the hold-until-next semantics instead
    rows = [Row(key=1, ts=_ts(0), value=0.0),
            Row(key=1, ts=_ts(1800), value=10.0)]
    out = time_weighted_avg(
        spark.createDataFrame(rows), "key", "ts", "value", 3600
    ).collect()
    assert len(out) == 1
    assert out[0]["twa"] == 5.0
    assert out[0]["cnt"] == 2


def test_histogram_clamps_to_edge_bins(spark):
    rows = [Row(ts=_ts(0), value=-50.0),   # below lo -> bin 0
            Row(ts=_ts(1), value=15.0),    # bin 1
            Row(ts=_ts(2), value=1e9)]     # above hi -> top bin
    out = {
        r["bin"]: (r["bin_lo"], r["n"])
        for r in histogram_tier(
            spark.createDataFrame(rows), "ts", "value", 86400, 0.0, 200.0, 20
        ).collect()
    }
    assert out[0] == (0.0, 1)
    assert out[1] == (10.0, 1)
    assert out[19] == (190.0, 1)


def test_top_n_per_group_rank_and_ties(spark):
    rows = [Row(g=1, v=5.0, id=1), Row(g=1, v=5.0, id=2),
            Row(g=1, v=9.0, id=3), Row(g=1, v=1.0, id=4),
            Row(g=2, v=2.0, id=5)]
    out = top_n_per_group(
        spark.createDataFrame(rows), ("g",), "v", n=2, tiebreak_cols=("id",)
    ).collect()
    got = {(r["g"], r["rank"]): r["id"] for r in out}
    # ties on v=5.0 break by id ascending
    assert got == {(1, 1): 3, (1, 2): 1, (2, 1): 5}
