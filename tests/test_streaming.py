"""Structured Streaming tests: watermarked rollup and per-key stateful SAX
words, driven by a file source in micro-batches."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark import kernel as K
from symtseries_spark.streaming.ingest import stateful_words, streaming_rollup


def _write_batches(spark, path, batches):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows).coalesce(1).write.mode(
            "append"
        ).parquet(path)


def test_streaming_rollup_file_source(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(key="a", ts=base + dt.timedelta(seconds=30 * i), value=float(i))
        for i in range(8)
    ]
    _write_batches(spark, src, [rows])

    stream = spark.readStream.schema(
        "key string, ts timestamp, value double"
    ).parquet(src)
    agg = streaming_rollup(stream, "key", "ts", F.col("value"), "1m")
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")  # only watermark-closed windows emit
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits nothing until the watermark passes — drive a second
    # batch far in the future to close the first windows
    late = [Row(key="a", ts=base + dt.timedelta(hours=2), value=0.0)]
    _write_batches(spark, src, [late])
    q2 = (
        agg.writeStream.format("memory")
        .queryName("rollup_sink2")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = {
        (r.key, r.bucket_ts): (r.crawl_cnt, r.sum)
        for r in spark.sql("select * from rollup_sink2").collect()
    }
    # minutes 0..3 hold values (0,1), (2,3), (4,5), (6,7)
    assert got[("a", base)] == (2, 1.0)
    assert got[("a", base + dt.timedelta(minutes=1))] == (2, 5.0)
    assert got[("a", base + dt.timedelta(minutes=3))] == (2, 13.0)


def test_streaming_rollup_equals_batch_rollup(spark, tmp_path):
    """The streaming twin of the window==batch law (r2 verdict #7):
    streaming_rollup over a file source (complete mode, one availableNow
    epoch) must produce EXACTLY rollup_raw over a batch read of the same
    files — same buckets, same partial triples, null values included."""
    from symtseries_spark.operators.rollup import rollup_raw

    src = str(tmp_path / "parity_src")
    base = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(9)
    rows = []
    for key in ("a", "b", "c"):
        for i in range(50):
            v = None if i % 11 == 7 else float(np.round(rng.normal() * 10, 3))
            rows.append(
                Row(key=key,
                    ts=base + dt.timedelta(seconds=int(rng.randint(0, 3600))),
                    value=v)
            )
    # two files so the stream sees multiple input splits in the epoch
    _write_batches(spark, src, [rows[:70], rows[70:]])

    stream = spark.readStream.schema(
        "key string, ts timestamp, value double"
    ).parquet(src)
    agg = streaming_rollup(stream, "key", "ts", F.col("value"), "1m")
    q = (
        agg.writeStream.format("memory")
        .queryName("parity_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.bucket_ts): (r.crawl_cnt, r.cnt, r.sum, r.sumsq)
        for r in spark.sql("select * from parity_sink").collect()
    }

    batch = rollup_raw(
        spark.read.parquet(src), "key", "ts", F.col("value"), "1m"
    )
    want = {
        (r.key, r.bucket_ts): (r.crawl_cnt, r.cnt, r.sum, r.sumsq)
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k in want:
        g, e = got[k], want[k]
        assert g[0] == e[0] and g[1] == e[1], k
        for gg, ee in zip(g[2:], e[2:]):
            if ee is None:
                assert gg is None
            else:
                assert gg == pytest.approx(ee, rel=1e-12), k


def test_stateful_words_matches_batch_law(spark, tmp_path):
    """Streaming per-key ring words == batch symbolization of the trailing n
    values (the reference's window==batch equivalence law), across multiple
    micro-batches."""
    src = str(tmp_path / "word_src")
    n, w, c = 8, 4, 4
    base = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(2)
    all_vals = {"a": [], "b": []}

    batches = []
    for b in range(3):
        rows = []
        for key in ("a", "b"):
            for j in range(3):  # 3 values per key per batch
                v = float(np.round(rng.normal(), 3))
                all_vals[key].append(v)
                rows.append(
                    Row(
                        key=key,
                        ts=base + dt.timedelta(minutes=b * 10 + j),
                        value=v,
                    )
                )
        batches.append(rows)

    _write_batches(spark, src, batches[:1])
    stream = spark.readStream.schema(
        "key string, ts timestamp, value double"
    ).parquet(src)
    words = stateful_words(stream, n, w, c)
    q = (
        words.writeStream.format("memory")
        .queryName("words_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _write_batches(spark, src, batches[1:])
    q2 = (
        words.writeStream.format("memory")
        .queryName("words_sink_final")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    final = {
        r.key: r
        for r in spark.sql(
            "select * from words_sink_final"
        ).collect()
    }
    for key in ("a", "b"):
        vals = all_vals[key]
        # trailing-n with NaN left-padding (ring started all-NaN)
        tail = np.full(n, np.nan)
        take = vals[-n:]
        tail[n - len(take):] = take
        expect = K.symbols_to_string(K.symbolize(tail, w, c), c)
        assert final[key].word == expect
        assert final[key].n_seen == 9


def test_stateful_words_per_append_emission(spark, tmp_path):
    """emit='append' returns the word after EVERY appended value — the
    reference's sts_append_value return contract (symtseries.c:481-492) —
    matching a sequential reference replay across micro-batches."""
    src = str(tmp_path / "word_src_append")
    n, w, c = 8, 4, 4
    base = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(6)
    seq = {"a": [], "b": []}
    batches = []
    for b in range(3):
        rows = []
        for key in ("a", "b"):
            for j in range(3):
                v = float(np.round(rng.normal(), 3))
                seq[key].append(v)
                rows.append(
                    Row(key=key, ts=base + dt.timedelta(minutes=b * 10 + j),
                        value=v)
                )
        batches.append(rows)
    _write_batches(spark, src, batches)

    stream = spark.readStream.schema(
        "key string, ts timestamp, value double"
    ).parquet(src)
    words = stateful_words(stream, n, w, c, emit="append")
    q = (
        words.writeStream.format("memory")
        .queryName("append_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.n_seen): r.word
        for r in spark.sql("select * from append_sink").collect()
    }
    # sequential reference replay: ring starts all-NaN, word after each append
    for key, vals in seq.items():
        ring = np.full(n, np.nan)
        for i, v in enumerate(vals):
            ring = np.concatenate([ring[1:], [v]])
            expect = K.symbols_to_string(K.symbolize(ring, w, c), c)
            assert got[(key, i + 1)] == expect, (key, i + 1)
    assert len(got) == sum(len(v) for v in seq.values())


def test_streaming_sessions_equals_batch_sessionize(spark, tmp_path):
    """One availableNow epoch of streaming_sessions (native session_window)
    over a file source must produce the same session set as the batch
    sessionize + session_stats path on the same rows — same per-key
    session bounds, counts, sums, durations."""
    from symtseries_spark.operators.joins import session_stats, sessionize
    from symtseries_spark.streaming.ingest import streaming_sessions

    src = str(tmp_path / "sess_src")
    base = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(3)
    rows = []
    for key in ("a", "b"):
        t = 0.0
        for _ in range(60):
            # a mix of intra-session (< 30 min) and session-breaking gaps;
            # fractional seconds keep gaps off the exact 1800 s boundary
            t += float(rng.choice([5.5, 120.25, 900.125, 2500.75]))
            rows.append(
                Row(key=key, ts=base + dt.timedelta(seconds=t),
                    value=float(rng.randint(0, 10)))
            )
    _write_batches(spark, src, [rows[:70], rows[70:]])

    stream = spark.readStream.schema(
        "key string, ts timestamp, value double"
    ).parquet(src)
    agg = streaming_sessions(stream, "key", "ts", F.col("value"))
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_v"], r["duration_s"]
        )
        for r in spark.sql("SELECT * FROM sess_sink").collect()
    }

    batch = session_stats(
        sessionize(spark.read.parquet(src), "key", "ts", 1800.0), "key"
    )
    want = {
        (r["key"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_v"], r["duration_s"]
        )
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 10  # the gap mix actually split sessions


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    """Redelivered ids within the watermark horizon are dropped: the
    deduped stream over files containing duplicates equals the batch
    distinct-by-id set."""
    from symtseries_spark.streaming.ingest import streaming_dedup

    src = str(tmp_path / "dedup_src")
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, ts=base + dt.timedelta(seconds=10 * i),
            value=float(i))
        for i in range(40)
    ]
    # second batch redelivers half of the first plus 10 new events
    redelivered = rows[20:40] + [
        Row(event_id=i, ts=base + dt.timedelta(seconds=10 * i),
            value=float(i))
        for i in range(40, 50)
    ]
    _write_batches(spark, src, [rows, redelivered])

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, value double"
    ).parquet(src)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["event_id"], r["value"])
        for r in spark.sql("SELECT * FROM dedup_sink").collect()
    ]
    assert len(got) == len(set(got)) == 50  # every id exactly once


def test_streaming_tiers_converge_to_batch_rollup(spark, tmp_path):
    """Continuous-aggregate law: after each availableNow epoch (including
    a restart from checkpoint and late data revising an earlier bucket),
    the incrementally-maintained 1m/1h/1d store equals the batch
    rollup_all_tiers over everything ingested so far."""
    from symtseries_spark.operators.rollup import rollup_all_tiers
    from symtseries_spark.streaming.ingest import streaming_tiers

    src = str(tmp_path / "tiers_src")
    store = str(tmp_path / "tiers_store")
    ckpt = str(tmp_path / "tiers_ckpt")
    base = dt.datetime(2024, 1, 1)

    def _rows(spec):
        return [
            Row(key=k, ts=base + dt.timedelta(seconds=s), value=v)
            for k, s, v in spec
        ]

    batch1 = _rows(
        [("a", 10, 1.0), ("a", 70, 2.0), ("a", 3700, 3.0),
         ("b", 20, 5.0), ("b", 90000, 7.0)]  # b spans two dates
    )
    # batch2: new buckets PLUS a late row revising a's very first minute
    # and a brand-new key. The watermark below is 30 days so the restart's
    # checkpointed watermark (batch1 max ts - delay) still admits them —
    # with a tight watermark the engine CORRECTLY drops them as too-late
    # (that eviction is the bounded-state contract, not a bug).
    batch2 = _rows(
        [("a", 15, 10.0), ("a", 90100, 4.0), ("c", 30, 9.0)]
    )

    def _run_epoch():
        stream = spark.readStream.schema(
            "key string, ts timestamp, value double"
        ).parquet(src)
        q = (
            streaming_tiers(
                stream, store, "key", "ts", F.col("value"), ckpt,
                watermark="30 days",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def _store_state():
        got = spark.read.parquet(store)
        return {
            (r["tier"], r["key"], r["bucket_ts"]): (
                r["crawl_cnt"], r["cnt"],
                round(r["sum"], 6), round(r["sumsq"], 6),
                round(r["text_len_avg"], 6),
            )
            for r in got.collect()
        }

    def _batch_state(rows):
        df = spark.createDataFrame(rows)
        tiers = rollup_all_tiers(df, "key", "ts", F.col("value"))
        out = {}
        for tier, tdf in tiers.items():
            for r in tdf.collect():
                out[(tier, r["key"], r["bucket_ts"])] = (
                    r["crawl_cnt"], r["cnt"],
                    round(r["sum"], 6), round(r["sumsq"], 6),
                    round(r["text_len_avg"], 6),
                )
        return out

    _write_batches(spark, src, [batch1])
    _run_epoch()
    assert _store_state() == _batch_state(batch1)

    _write_batches(spark, src, [batch2])
    _run_epoch()  # restart from checkpoint, processes only batch2 files
    assert _store_state() == _batch_state(batch1 + batch2)
