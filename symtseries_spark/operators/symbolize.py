"""Spark-side iSAX symbolization: series assembly + Arrow-vectorized UDFs.

Pipeline shape (batch engine):
  rollup tier rows (key, bucket_ts, value)
    → assemble_series: fixed-length array<double> per (key, coarse window),
      missing buckets become NaN (pure built-in map/sequence/transform —
      no shuffle beyond the one groupBy, no Python)
    → sax_word udf: one Arrow batch → one numpy (B, n) matrix →
      kernel.symbolize_batch → SAX strings. No per-row Python anywhere;
      the only Python cost is one vectorized numpy pass per Arrow batch.

The word column is the canonical index key; the symbols stay recoverable
from the string (kernel.string_to_symbols), so we don't store both.

Reference semantics reproduced bit-for-bit: sts_from_double_array
(/root/reference/src/symtseries.c:515-532) — see kernel.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from symtseries_spark import kernel as K
from symtseries_spark.config import TIERS

_TRUNC_UNIT = {"1m": "minute", "1h": "hour", "1d": "day"}


def _letters_lut(c: int) -> np.ndarray:
    """uint8 symbol → unicode letter lookup ('A' lowest … sentinel '#')."""
    lut = np.array([chr(ord("A") + (c - s - 1)) for s in range(c)] + ["#"], dtype="U1")
    return lut


def _strings_from_symbols(syms: np.ndarray, c: int) -> np.ndarray:
    """(B, w) uint8 → (B,) U-w strings, fully vectorized."""
    B, w = syms.shape
    chars = _letters_lut(c)[syms]
    return np.ascontiguousarray(chars).view(f"U{w}").reshape(B)


def _symbols_from_strings(words: np.ndarray, c: int) -> np.ndarray:
    """(B,) strings of equal length w → (B, w) uint8 symbols, vectorized."""
    w = len(words[0])
    codes = np.asarray(words, dtype=f"U{w}").view(np.uint32).reshape(len(words), w)
    syms = (c - 1 - (codes - ord("A"))).astype(np.int64)
    syms[codes == ord("#")] = c
    return syms.astype(np.uint8)


def sax_word_udf(n: int, w: int, c: int):
    """pandas UDF: array<double> (length ≤ n, NaN-padded on the left) → word."""
    K.validate_nwc(n, w, c)

    @pandas_udf(StringType())
    def _sax(series: pd.Series) -> pd.Series:
        if len(series) == 0:
            return pd.Series([], dtype=object)
        vals = series.to_numpy()
        try:  # fast path: uniform length-n arrays stack without copying rows
            X = np.stack(vals).astype(np.float64, copy=False)
            if X.ndim != 2 or X.shape[1] != n:
                raise ValueError
        except ValueError:  # ragged: NaN-pad on the left (trailing-n rule)
            X = np.full((len(vals), n), np.nan)
            for i, s in enumerate(vals):
                a = np.asarray(s, dtype=np.float64)
                X[i, n - min(len(a), n):] = a[-n:] if len(a) > n else a
        syms = K.symbolize_batch(X, w, c)
        return pd.Series(_strings_from_symbols(syms, c))

    return _sax


MINDIST_SCHEMA = StructType(
    [
        StructField("d", DoubleType()),
        StructField("above", DoubleType()),
        StructField("below", DoubleType()),
    ]
)


def mindist_udf(query_word: str, c: int, n_query: int = 0, n_cand: int | None = None):
    """pandas UDF: word-string column → struct(d, above, below) vs the query.

    The query word is captured in the UDF closure → shipped once per task
    (broadcast semantics). n_cand defaults to the wildcard rule (candidates'
    n taken as the query's, or w when both 0) unless given.
    """
    q = K.string_to_symbols(query_word, c)

    @pandas_udf(MINDIST_SCHEMA)
    def _mind(words: pd.Series) -> pd.DataFrame:
        if len(words) == 0:
            return pd.DataFrame({"d": [], "above": [], "below": []})
        cands = _symbols_from_strings(words.to_numpy(), c)
        nb = np.full(len(words), n_cand if n_cand is not None else 0, dtype=np.int64)
        d, above, below = K.mindist_batch(q, cands, c, n_query, nb)
        return pd.DataFrame({"d": d, "above": above, "below": below})

    return _mind


def assemble_series(
    rollup: DataFrame,
    tier: str,
    window_tier: str,
    value_col: str = "text_len_avg",
) -> DataFrame:
    """Fixed-length series per (key, window): (key, window_ts, series).

    n = window/bucket ratio (e.g. 1m buckets over 1h windows → n=60).
    Missing buckets surface as NaN so the kernel's '#' semantics apply
    exactly as the reference's unfilled ring slots do.
    """
    n = TIERS[window_tier] // TIERS[tier]
    wnd = F.date_trunc(_TRUNC_UNIT[window_tier], "bucket_ts")
    off = (
        (F.unix_timestamp("bucket_ts") - F.unix_timestamp(wnd)) / TIERS[tier]
    ).cast("int")
    entries = rollup.select(
        "key",
        wnd.alias("window_ts"),
        off.alias("off"),
        F.col(value_col).cast("double").alias("v"),
    )
    m = F.map_from_entries(F.collect_list(F.struct("off", "v")))
    series = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.coalesce(m[i], F.lit(float("nan"))),
    )
    return entries.groupBy("key", "window_ts").agg(series.alias("series"))


def symbolize_windows(
    rollup: DataFrame,
    tier: str,
    window_tier: str,
    w: int,
    c: int,
    value_col: str = "text_len_avg",
) -> DataFrame:
    """rollup tier → (key, window_ts, series, word, n, w, c)."""
    n = TIERS[window_tier] // TIERS[tier]
    ser = assemble_series(rollup, tier, window_tier, value_col)
    udf = sax_word_udf(n, w, c)
    return ser.select(
        "key",
        "window_ts",
        "series",
        udf("series").alias("word"),
        F.lit(n).alias("n"),
        F.lit(w).alias("w"),
        F.lit(c).cast("tinyint").alias("c"),
    )
