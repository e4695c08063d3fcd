"""Gorilla + delta-of-delta codec round-trip tests (property + known vectors
+ the Spark encode_chunks/decode_chunks surface)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators import codecs as C


def test_clz_ctz():
    xs = np.array([0, 1, 2, 3, 0x8000000000000000, 0xFFFFFFFFFFFFFFFF, 1 << 32],
                  dtype=np.uint64)
    assert list(C._clz64(xs)) == [64, 63, 62, 62, 0, 0, 31]
    assert list(C._ctz64(xs)) == [64, 0, 1, 0, 63, 0, 32]


def test_timestamps_round_trip_regular():
    ts = np.arange(0, 1440) * 60_000_000 + 1_700_000_000_000_000
    enc = C.encode_timestamps(ts)
    assert np.array_equal(C.decode_timestamps(enc, len(ts)), ts)
    # regular cadence → dod==0 → ~1 bit/point after the 16-byte header
    assert len(enc) < 16 + 1440 // 8 + 8


def test_timestamps_round_trip_irregular():
    rng = np.random.RandomState(3)
    deltas = rng.randint(-(10**12), 10**12, size=500)
    ts = np.cumsum(np.concatenate([[1_700_000_000_000_000], deltas]))
    enc = C.encode_timestamps(ts)
    assert np.array_equal(C.decode_timestamps(enc, len(ts)), ts)


def test_timestamps_edge_sizes():
    for ts in ([123], [123, 456], [0, 0, 0], [5, 4, 3, 100]):
        a = np.array(ts, dtype=np.int64)
        assert np.array_equal(C.decode_timestamps(C.encode_timestamps(a), len(a)), a)


def test_values_round_trip_property():
    rng = np.random.RandomState(7)
    cases = [
        rng.normal(size=1000),
        np.repeat(3.14159, 500),  # constant → all-zero xors
        np.round(rng.normal(size=300), 1),  # repeated mantissa patterns
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1e308, 2.0]),
        rng.normal(size=1) * 100,
        np.arange(100, dtype=np.float64),
    ]
    for vals in cases:
        enc = C.encode_values(vals)
        dec = C.decode_values(enc, len(vals))
        assert np.array_equal(
            dec.view(np.uint64), np.ascontiguousarray(vals).view(np.uint64)
        ), "bit-exact round trip required (NaN payloads included)"


def test_values_compress_stable_series():
    vals = np.repeat(42.5, 2000)
    enc = C.encode_values(vals)
    assert len(enc) < 8 + 2000 // 8 + 8  # ~1 bit per repeated point


def test_spark_chunk_round_trip(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    rng = np.random.RandomState(11)
    for k in ("a", "b"):
        for m in range(0, 200, 3):  # gappy 1m buckets
            rows.append(
                Row(
                    key=k,
                    tier="1m",
                    bucket_ts=base + dt.timedelta(minutes=m),
                    text_len_avg=float(np.round(rng.normal(100, 10), 2)),
                )
            )
    rollup = spark.createDataFrame(rows)
    chunks = C.encode_chunks(rollup, "1m", "text_len_avg", chunk_points=64)
    cl = chunks.collect()
    assert all(r.ts_codec == "dod-s" and r.val_codec == "gorilla-s" for r in cl)
    assert sum(r.n_points for r in cl) == len(rows)
    decoded = C.decode_chunks(chunks)
    got = {
        (r.key, r.bucket_ts): r.value for r in decoded.collect()
    }
    want = {(r.key, r.bucket_ts): r.text_len_avg for r in rows}
    assert got == want
    # compression actually compresses vs raw 16B/point
    raw = 16 * len(rows)
    packed = sum(len(r.ts_payload) + len(r.val_payload) for r in cl)
    assert packed < raw


def test_values_vec_round_trip_property():
    rng = np.random.RandomState(9)
    cases = [
        rng.normal(size=1000),
        np.repeat(3.14159, 500),
        np.round(rng.normal(size=300), 1),
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1e308, 2.0]),
        rng.normal(size=1) * 100,
        np.arange(100, dtype=np.float64),
    ]
    for vals in cases:
        enc = C.encode_values_vec(vals)
        dec = C.decode_values(enc, len(vals))
        assert np.array_equal(
            dec.view(np.uint64), np.ascontiguousarray(vals).view(np.uint64)
        )


def test_split_codecs_batch_round_trip_property():
    """gorilla-s / dod-s: many mixed-shape chunks decode in ONE vectorized
    pass and round-trip exactly (incl. single-point, constant, huge-jump)."""
    from symtseries_spark.operators.codecs import (
        _codes_timestamps_split,
        _codes_values_split,
        _pack_groups,
        decode_timestamps_split_batch,
        decode_values_split_batch,
    )

    rng = np.random.RandomState(7)
    vchunks = []
    for n in [1, 2, 3, 17, 256, 1440]:
        v = rng.normal(size=n) * rng.choice([1.0, 1e7, 1e-7])
        v[rng.rand(n) < 0.4] = v[0]  # repeats exercise the xor==0 path
        vchunks.append(v)
    vchunks.append(np.full(64, -2.5))
    vchunks.append(np.array([0.0]))
    vp = _pack_groups([_codes_values_split(v) for v in vchunks])
    ns = np.array([len(v) for v in vchunks])
    got = decode_values_split_batch(vp, ns)
    assert np.array_equal(got, np.concatenate(vchunks))

    base = 1_700_000_000_000_000
    tchunks = []
    for n in [1, 2, 5, 500]:
        deltas = rng.choice(
            [60_000_000] * 8 + [120_000_000, 3_600_000_000, 61_234_567],
            size=max(n - 1, 0),
        )
        tchunks.append(
            (base + np.concatenate([[0], np.cumsum(deltas)]))[:n].astype(np.int64)
        )
    tchunks.append(np.array([0, 10**15, 10**15 + 1, 2 * 10**15], dtype=np.int64))
    tp = _pack_groups([_codes_timestamps_split(t) for t in tchunks])
    tn = np.array([len(t) for t in tchunks])
    tgot = decode_timestamps_split_batch(tp, tn)
    assert np.array_equal(tgot, np.concatenate(tchunks))


def test_split_codec_roundtrip_hypothesis():
    """Fuzz the split-layout codecs: decode∘encode must be the identity for
    arbitrary float64 payloads (subnormals, ±0.0, huge magnitudes, long
    equal runs) and arbitrary non-decreasing µs timestamps."""
    from hypothesis import given, settings, strategies as st

    from symtseries_spark.operators.codecs import (
        _codes_timestamps_split,
        _codes_values_split,
        _pack_groups,
        decode_timestamps_split_batch,
        decode_values_split_batch,
    )

    floats = st.one_of(
        st.floats(allow_nan=False, width=64),
        st.just(0.0),
        st.just(-0.0),
        st.floats(min_value=-1e-300, max_value=1e-300, allow_nan=False),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(floats, min_size=1, max_size=130))
    def check_values(vals):
        v = np.asarray(vals, dtype=np.float64)
        blob = _pack_groups([_codes_values_split(v)])[0]
        out = decode_values_split_batch([blob], np.array([len(v)]))
        assert v.view(np.uint64).tolist() == np.asarray(out).view(np.uint64).tolist()

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=130
        ),
        st.integers(min_value=0, max_value=1 << 50),
    )
    def check_ts(deltas, t0):
        ts = t0 + np.cumsum(np.asarray(deltas, dtype=np.int64))
        blob = _pack_groups([_codes_timestamps_split(ts)])[0]
        out = decode_timestamps_split_batch([blob], np.array([len(ts)]))
        assert ts.tolist() == list(out)

    check_values()
    check_ts()


def test_batch_split_encoders_match_per_group():
    """The cross-group batch encoders must be BIT-IDENTICAL to mapping the
    per-group encoders over every (start, end) slice — randomized group
    layouts, equal-run-heavy values, irregular timestamps."""
    from symtseries_spark.operators.codecs import (
        _codes_timestamps_split,
        _codes_timestamps_split_batch,
        _codes_values_split,
        _codes_values_split_batch,
        _pack_groups,
    )

    rng = np.random.RandomState(42)
    for _ in range(15):
        G = rng.randint(1, 40)
        lens = rng.randint(1, 60, size=G)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        ends = np.cumsum(lens)
        n = int(ends[-1])
        v = rng.randn(n)
        v[rng.rand(n) < 0.3] = 1.5
        ts = np.cumsum(
            rng.choice([60_000_000, 60_000_000, 61_000_000, 120_000_000, 1], size=n)
        ).astype(np.int64)
        ref_v = _pack_groups(
            [_codes_values_split(v[s:e]) for s, e in zip(starts, ends)]
        )
        assert ref_v == _codes_values_split_batch(v, starts, ends)
        ref_t = _pack_groups(
            [_codes_timestamps_split(ts[s:e]) for s, e in zip(starts, ends)]
        )
        assert ref_t == _codes_timestamps_split_batch(ts, starts, ends)
