"""iSAX-word inverted index + similarity queries (ANN / mindist range).

Index model: a DataFrame ``(word, w, c, n, tier, key, window_ts)`` — one row
per symbolized window — written out partitioned/bucketed by ``word`` so both
query modes prune:

  * exact-word candidates (the iSAX "approximate search" step) is an
    equi-join on (word, w, c) → with bucketing, a shuffle-free lookup; the
    tiny query set is always broadcast.
  * mindist range/k-NN search exploits the *lower-bound* property (the whole
    point of SAX): compute mindist(query, word) per index row with one
    vectorized Arrow pass, prune rows whose lower bound exceeds the radius /
    running k-th best, and only then (optionally) refine survivors against
    their raw series.

Per-segment cardinality promotion (iSAX 2.0, Camerra et al. 2010 — the
feature the reference marks TODO at /root/reference/include/symtseries.h:32)
is provided by ``promote_words``: hot words are split by re-symbolizing one
segment at doubled cardinality, which subdivides an overfull bucket without
touching the rest of the index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from symtseries_spark import kernel as K
from symtseries_spark.operators.symbolize import (
    MINDIST_SCHEMA,
    _strings_from_symbols,
    _symbols_from_strings,
    mindist_lb_udf,
    mindist_udf,
)


def build_index(symbolized: DataFrame, tier: str = "1h") -> DataFrame:
    """Symbolized windows → index rows (word, w, c, n, frame_full, tier, key,
    window_ts). frame_full (a per-frame fully-finite bitmask, 0 when absent)
    is what lets exact kNN / exact range prune with a TRUE lower bound."""
    cols = [
        "word",
        "w",
        "c",
        "n",
        (
            F.col("frame_full")
            if "frame_full" in symbolized.columns
            else F.lit(0).cast("long").alias("frame_full")
        ),
        F.lit(tier).alias("tier"),
        "key",
        "window_ts",
    ]
    return symbolized.select(*cols)


def write_index(index: DataFrame, path: str, buckets: int = 64) -> None:
    """Persist the index partitioned by word hash.

    `repartition(word)` co-locates equal words so exact-match lookups touch
    few files; at cluster scale this would be a bucketed/Iceberg table with
    a sort order on word.
    """
    index.repartition(buckets, "word").write.mode("overwrite").parquet(path)


def exact_candidates(index: DataFrame, query_word: str, w: int, c: int) -> DataFrame:
    """iSAX approximate search: rows whose word equals the query's word."""
    return index.filter(
        (F.col("word") == query_word) & (F.col("w") == w) & (F.col("c") == c)
    )


def mindist_scan(
    index: DataFrame,
    query_word: str,
    c: int,
    n_query: int = 0,
) -> DataFrame:
    """Annotate every compatible index row with mindist(query, word).

    Catalyst prunes to the (w, c)-compatible slice first; the UDF then runs
    over the DISTINCT words only (mindist is a function of the word, not
    the row) and the per-word results broadcast-join back — per-query UDF
    cost is proportional to the vocabulary (bounded by c^w, practically
    thousands), not the corpus row count.
    """
    w = len(query_word)
    compat = index.filter((F.col("w") == w) & (F.col("c") == c))
    m = mindist_udf(query_word, c, n_query)(F.col("word"))
    per_word = (
        compat.select("word")
        .distinct()
        .withColumn("mindist", m["d"])
        .withColumn("mindist_above", m["above"])
        .withColumn("mindist_below", m["below"])
    )
    return compat.join(F.broadcast(per_word), "word")


def range_query(
    index: DataFrame, query_word: str, c: int, radius: float, n_query: int = 0
) -> DataFrame:
    """All index rows whose *lower bound* distance ≤ radius.

    Because mindist lower-bounds the true Euclidean distance, rows filtered
    out here can never be true matches — no false dismissals (SAX
    guarantee). Survivors may be refined with refine_topk/exact distance.
    """
    return mindist_scan(index, query_word, c, n_query).filter(
        F.col("mindist") <= radius
    )


def knn_query(
    index: DataFrame, query_word: str, c: int, k: int, n_query: int = 0
) -> DataFrame:
    """Top-k index rows by mindist lower bound (candidate set for exact kNN).

    orderBy(limit k) compiles to TakeOrderedAndProject — per-partition
    top-k heaps + single-driver merge of k·P rows, no global sort shuffle.
    """
    return (
        mindist_scan(index, query_word, c, n_query)
        .orderBy(F.col("mindist").asc(), F.col("key").asc(), F.col("window_ts").asc())
        .limit(k)
    )


def znorm_query(query_series: np.ndarray) -> np.ndarray:
    """z-normalize the query with the kernel's semantics: population std
    over finite values, STAT_EPS stationary guard → all-zero vector."""
    q = np.asarray(query_series, dtype=np.float64)
    qz = q.copy()
    fin = np.isfinite(qz)
    if fin.any():
        sd = qz[fin].std()
        if sd < K.STAT_EPS:
            qz[fin] = 0.0
        else:
            qz[fin] = (qz[fin] - qz[fin].mean()) / sd
    return qz


def euclid_udf(query_series: np.ndarray):
    """pandas UDF: series → z-normalized Euclidean distance to the query.

    Mirrors the symbolizer's semantics exactly (population std over finite
    values, STAT_EPS stationary guard → zero vector, non-finite positions
    contribute 0) so kernel.mindist_lb_batch is a valid lower bound of it.
    """
    qz = znorm_query(query_series)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _euclid(series: pd.Series) -> pd.Series:
        if len(series) == 0:
            return pd.Series([], dtype=np.float64)
        X = np.stack(series.to_numpy()).astype(np.float64, copy=False)
        Xf = np.where(np.isfinite(X), X, np.nan)
        mu = np.nanmean(Xf, axis=1, keepdims=True)
        sd = np.nanstd(Xf, axis=1, keepdims=True)
        stationary = sd < K.STAT_EPS
        sd = np.where(stationary, 1.0, sd)
        Z = np.where(
            np.isfinite(X), np.where(stationary, 0.0, (X - mu) / sd), np.nan
        )
        diff = np.where(np.isfinite(Z) & np.isfinite(qz), Z - qz, 0.0)
        return pd.Series(np.sqrt((diff * diff).sum(axis=1)))

    return _euclid


def refine_knn(
    candidates: DataFrame,
    series_df: DataFrame,
    query_series: np.ndarray,
    k: int,
) -> DataFrame:
    """Exact refinement: join candidates back to raw series and rank by true
    z-normalized Euclidean distance. candidates ≪ index, so the join
    broadcasts the candidate side. Deterministic (key, window_ts) tiebreak."""
    joined = series_df.join(
        F.broadcast(candidates.select("key", "window_ts")), ["key", "window_ts"]
    )
    return (
        joined.withColumn("euclid", euclid_udf(query_series)("series"))
        .orderBy(F.col("euclid").asc(), F.col("key").asc(), F.col("window_ts").asc())
        .limit(k)
    )


def with_frame_full(df: DataFrame, w: int, n: int) -> DataFrame:
    """Ensure a ``frame_full`` bitmask column exists.

    symbolize_windows emits it natively; for ad-hoc word tables it is
    derived JVM-side from the series column (w forall-expressions), or 0
    when no series is stored (lower bound degrades to 0 — still valid).
    """
    if "frame_full" in df.columns:
        return df
    if "series" not in df.columns or w > 63:
        return df.withColumn("frame_full", F.lit(0).cast("long"))
    fs = n // w
    bits = [
        F.when(
            F.forall(
                F.slice("series", f * fs + 1, fs), lambda x: ~F.isnan(x)
            ),
            F.lit(1 << f).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for f in range(w)
    ]
    mask = bits[0]
    for b in bits[1:]:
        mask = mask + b
    return df.withColumn("frame_full", mask)


def lower_bound_scan(
    index: DataFrame, query_series: np.ndarray, w: int, c: int
) -> DataFrame:
    """Annotate every (w, c)-compatible index row with ``mindist_lb`` — the
    bound-safe lower bound of the refine distance.

    The bound is a function of (word, frame_full) alone, so the Arrow UDF
    runs over the DISTINCT pairs and broadcast-joins back: per-query UDF
    cost scales with the vocabulary, not the corpus."""
    q = np.asarray(query_series, dtype=np.float64)
    qword = K.symbols_to_string(K.symbolize(q, w, c), c)
    fs = len(q) // w
    q_frame_full = K.frame_full_mask(q, w)
    compat = with_frame_full(
        index.filter((F.col("w") == w) & (F.col("c") == c)), w, len(q)
    )
    lb = mindist_lb_udf(qword, c, fs, q_frame_full)(
        F.col("word"), F.col("frame_full")
    )
    per_pair = (
        compat.select("word", "frame_full").distinct().withColumn("mindist_lb", lb)
    )
    return compat.join(F.broadcast(per_pair), ["word", "frame_full"])


def exact_knn(
    index_with_series: DataFrame,
    query_series: np.ndarray,
    w: int,
    c: int,
    k: int,
    probe_factor: int = 4,
) -> DataFrame:
    """Exact k-NN with no false dismissals (the classic SAX multi-step
    search, but pruned with a VALID lower bound — the reference-parity
    mindist over-estimates whenever '#' sentinels appear and must not
    prune; see kernel.mindist_lb_batch):

      1. one vectorized lower-bound pass over the index,
      2. refine the best ``probe_factor·k`` candidates to exact distance,
      3. τ = k-th best exact distance (∞ if fewer than k refined); every
         row with lb > τ is provably farther than the current answer set,
         so the final refine touches only rows with lb ≤ τ — a set that
         provably contains the true top-k (euclid ≤ τ ⇒ lb ≤ τ).

    Two Arrow refine passes worst case; the second touches only rows the
    lower bound could not prune.
    """
    q = np.asarray(query_series, dtype=np.float64)
    scan = lower_bound_scan(index_with_series, q, w, c).persist()
    try:
        nprobe = max(k * probe_factor, k)
        probe = scan.orderBy(
            F.col("mindist_lb").asc(), F.col("key").asc(), F.col("window_ts").asc()
        ).limit(nprobe)
        top = refine_knn(probe, index_with_series, q, k).collect()
        tau = max(r.euclid for r in top) if len(top) >= k else float("inf")
        survivors = scan.filter(F.col("mindist_lb") <= tau)
        return refine_knn(survivors, index_with_series, q, k)
    finally:
        scan.unpersist()


def range_query_exact(
    index_with_series: DataFrame,
    query_series: np.ndarray,
    w: int,
    c: int,
    radius: float,
) -> DataFrame:
    """ALL windows whose true z-normalized Euclidean distance ≤ radius.

    lower-bound prune (no false dismissals: euclid ≤ r ⇒ lb ≤ r) + exact
    refine of the survivors. Equals the brute-force scan by construction —
    pinned by tests/test_index.py.
    """
    q = np.asarray(query_series, dtype=np.float64)
    survivors = lower_bound_scan(index_with_series, q, w, c).filter(
        F.col("mindist_lb") <= radius
    )
    joined = index_with_series.join(
        survivors.select("key", "window_ts"), ["key", "window_ts"], "left_semi"
    )
    return joined.withColumn("euclid", euclid_udf(q)("series")).filter(
        F.col("euclid") <= radius
    )


def promoted_query_word(
    query_series: np.ndarray, w: int, c: int, segment: int
) -> tuple[str, str]:
    """(base word, promoted word) for a query series: the promoted form has
    ``segment`` re-symbolized at cardinality 2c (lowercase-tagged), matching
    promote_words' split convention."""
    q = np.asarray(query_series, dtype=np.float64)
    base = K.symbols_to_string(K.symbolize(q, w, c), c)
    fine = K.symbols_to_string(
        K.symbolize(q, w, 2 * c)[segment : segment + 1], 2 * c
    ).lower()
    return base, base[:segment] + fine + base[segment + 1 :]


def promoted_lookup(
    symbolized: DataFrame,
    query_series: np.ndarray,
    w: int,
    c: int,
    n: int,
    segment: int = 0,
    threshold: int = 20,
) -> DataFrame:
    """Exact-word lookup that DESCENDS into promoted sub-buckets (the point
    of iSAX 2.0 splitting, reference TODO symtseries.h:32): cold buckets
    match on the base word; hot (split) buckets additionally require the
    query's finer 2c segment letter — so a hot bucket's lookup touches only
    ~1/2 of its rows instead of the whole overfull bucket.

    This is the AD-HOC form (promotion recomputed over the input). The
    scale path is build_promoted_index + promoted_lookup_indexed: promotion
    is index maintenance, not query work.
    """
    qword, qprom = promoted_query_word(query_series, w, c, segment)
    promoted = promote_words(
        symbolized, segment, threshold=threshold, w=w, c=c, n=n
    )
    in_bucket = promoted.filter(F.col("word") == qword)
    return in_bucket.filter(
        (F.col("word_promoted") == F.col("word"))  # cold: whole bucket
        | (F.col("word_promoted") == qprom)  # hot: matching sub-bucket
    )


def build_promoted_index(
    symbolized: DataFrame,
    path: str,
    segment: int,
    threshold: int,
    w: int,
    c: int,
    n: int,
    extra_meta: dict | None = None,
) -> None:
    """Materialize the iSAX-2.0-promoted inverted index (the index-
    maintenance step the reference marks TODO at symtseries.h:32).

    Promotion (groupBy-count to find hot words + the 2c re-symbolization
    UDF over hot rows) runs ONCE here; the table is written partitioned by
    the base word's 2-symbol prefix — an iSAX-tree-style top split with at
    most (c+1)² directories, so a lookup is partition pruning + a word
    equality filter, never a corpus scan. Build parameters (and any caller
    extras, e.g. a stored probe) land in ``_promoted_meta.json`` inside the
    index dir (the ``_`` prefix hides it from the parquet reader).
    """
    import json
    import os

    promoted = promote_words(
        symbolized, segment, threshold=threshold, w=w, c=c, n=n
    )
    idx = promoted.select(
        "key",
        "window_ts",
        "word",
        "word_promoted",
        F.substring("word", 1, 2).alias("prefix"),
    )
    # shuffle onto the partition column first: one file per prefix dir
    idx.repartition("prefix").write.mode("overwrite").partitionBy(
        "prefix"
    ).parquet(path)
    meta = {"segment": segment, "threshold": threshold, "w": w, "c": c, "n": n}
    meta.update(extra_meta or {})
    with open(os.path.join(path, "_promoted_meta.json"), "w") as f:
        json.dump(meta, f)


def read_promoted_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_promoted_meta.json")) as f:
        return json.load(f)


def promoted_lookup_indexed(
    spark, path: str, query_series: np.ndarray
) -> DataFrame:
    """Sub-bucket descent against a STORED promoted index: the probe words
    are pure driver-side kernel math (no Spark jobs), the scan filter hits
    the ``prefix`` partition column (pruned directory read, plan shows
    PartitionFilters), and hot buckets return only the matching 2c
    sub-bucket — same semantics as :func:`promoted_lookup`, none of its
    per-query recompute."""
    meta = read_promoted_meta(path)
    qword, qprom = promoted_query_word(
        query_series, meta["w"], meta["c"], meta["segment"]
    )
    idx = spark.read.parquet(path)
    return idx.filter(
        (F.col("prefix") == qword[:2])
        & (F.col("word") == qword)
        & (
            (F.col("word_promoted") == F.col("word"))
            | (F.col("word_promoted") == qprom)
        )
    ).drop("prefix")


# ---------------------------------------------------------------------------
# iSAX 2.0 per-segment cardinality promotion
# ---------------------------------------------------------------------------


def promote_words(
    symbolized: DataFrame,
    segment: int,
    hot_words: DataFrame | None = None,
    threshold: int | None = None,
    w: int | None = None,
    c: int | None = None,
    n: int | None = None,
) -> DataFrame:
    """Split overfull word buckets by doubling one segment's cardinality.

    For rows whose word is 'hot' (bucket size > threshold), re-symbolize
    PAA segment ``segment`` from the stored raw series at cardinality 2c and
    append ``word_promoted`` = word with that segment's letter replaced by
    the finer 2c letter (lowercase-tagged to keep cardinalities
    distinguishable in one string column). Cold rows keep their word.

    This reproduces the iSAX 2.0 node-split idea as a pure DataFrame
    transform: no global rebuild, only hot buckets are rewritten.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    if hot_words is None:
        counts = symbolized.groupBy("word", "w", "c").count()
        threshold = threshold or 0
        hot_words = counts.filter(F.col("count") > threshold).select("word", "w", "c")

    tagged = symbolized.join(
        F.broadcast(hot_words.withColumn("_hot", F.lit(True))),
        ["word", "w", "c"],
        "left",
    ).withColumn("_hot", F.coalesce("_hot", F.lit(False)))

    def make_udf(w: int, c: int, n: int):
        @pandas_udf(StringType())
        def _promote(series: pd.Series, words: pd.Series) -> pd.Series:
            if len(series) == 0:
                return pd.Series([], dtype=object)
            X = np.stack(series.to_numpy()).astype(np.float64, copy=False)
            syms2c = K.symbolize_batch(X, w, 2 * c)  # same PAA, finer alphabet
            seg_letters = _strings_from_symbols(
                syms2c[:, segment : segment + 1], 2 * c
            )
            out = []
            for word, fine in zip(words.to_numpy(), seg_letters):
                out.append(
                    word[:segment] + fine.lower() + word[segment + 1 :]
                )
            return pd.Series(out)

        return _promote

    # w, c, n are constant per call in our engine (fixed SaxConfig); callers
    # MUST pass them explicitly — inferring them would run a driver-side
    # .first() job mid-plan.
    if w is None or c is None or n is None:
        raise ValueError("promote_words requires explicit (w, c, n)")
    udf = make_udf(int(w), int(c), int(n))
    return tagged.withColumn(
        "word_promoted",
        F.when(F.col("_hot"), udf(F.col("series"), F.col("word"))).otherwise(
            F.col("word")
        ),
    ).drop("_hot")


# ---------------------------------------------------------------------------
# iterative multi-segment promotion (recursive iSAX-2.0 descent)
# ---------------------------------------------------------------------------


def fine_word_udf(w: int, c: int):
    """pandas UDF: series → the FULL cardinality-2c word, lowercase-tagged.

    One vectorized symbolization yields every segment's fine letter at
    once, so the iterative splitter below is pure column string surgery —
    the UDF runs exactly once regardless of descent depth."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _fine(series: pd.Series) -> pd.Series:
        if len(series) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(series.to_numpy()).astype(np.float64, copy=False)
        syms = K.symbolize_batch(X, w, 2 * c)
        return pd.Series(_strings_from_symbols(syms, 2 * c)).str.lower()

    return _fine


def promote_words_iter(
    symbolized: DataFrame,
    threshold: int,
    w: int,
    c: int,
    n: int,
    segments: tuple = (0, 1),
) -> DataFrame:
    """RECURSIVE iSAX-2.0 promotion (reference TODO symtseries.h:32,
    extended past promote_words' single split): when a promoted sub-bucket
    is still over ``threshold``, split the NEXT segment — one descent round
    per entry of ``segments``, in order.

    Round r groups rows by their current ``word_promoted``; buckets with
    count > threshold get segment ``segments[r]`` refined to its 2c
    lowercase letter (taken from the once-computed full fine word). Cold
    buckets are never touched, so a row's lowercase-letter count IS its
    bucket's descent depth.

    Scale: the per-round hot set is a broadcast (vocabulary-bounded: at
    most #hot-buckets rows), the refinement is JVM string surgery, and the
    only Python is the single fine-word UDF pass. Each round adds one
    hash-aggregate over the rows — keep ``segments`` to the few levels a
    real skew profile needs (depth 2-3), not all w.
    """
    if not segments:
        raise ValueError("segments must name at least one split level")
    if len(set(segments)) != len(segments):
        raise ValueError(f"segments must be distinct, got {segments!r}")
    for s in segments:
        if not (0 <= int(s) < w):
            raise ValueError(f"segment {s} out of range for w={w}")
    cur = symbolized.withColumn(
        "_fine", fine_word_udf(int(w), int(c))(F.col("series"))
    ).withColumn("word_promoted", F.col("word"))
    # the fine word feeds every round — without a checkpoint the UDF chain
    # would re-run once per descent level's aggregate
    cur = cur.localCheckpoint(eager=False)
    for seg in segments:
        seg = int(seg)
        hot = (
            cur.groupBy("word_promoted")
            .count()
            .filter(F.col("count") > int(threshold))
            .select("word_promoted", F.lit(True).alias("_hot"))
        )
        refined = F.concat(
            F.substring("word_promoted", 1, seg),
            F.substring("_fine", seg + 1, 1),
            F.substring("word_promoted", seg + 2, w - seg - 1),
        )
        cur = (
            cur.join(F.broadcast(hot), "word_promoted", "left")
            .withColumn(
                "word_promoted",
                F.when(F.coalesce("_hot", F.lit(False)), refined).otherwise(
                    F.col("word_promoted")
                ),
            )
            .drop("_hot")
        )
    return cur.drop("_fine")


def promoted_query_words_iter(
    query_series: np.ndarray, w: int, c: int, segments: tuple = (0, 1)
) -> list:
    """The query's refinement chain [base, depth-1 word, depth-2 word, …]
    matching promote_words_iter's split convention. A bucket split to
    depth d matches the query iff its word_promoted equals chain[d]."""
    q = np.asarray(query_series, dtype=np.float64)
    base = K.symbols_to_string(K.symbolize(q, w, c), c)
    fine = K.symbols_to_string(K.symbolize(q, w, 2 * c), 2 * c).lower()
    words = [base]
    cur = base
    for seg in segments:
        seg = int(seg)
        cur = cur[:seg] + fine[seg] + cur[seg + 1 :]
        words.append(cur)
    return words


def build_promoted_index_iter(
    symbolized: DataFrame,
    path: str,
    segments: tuple,
    threshold: int,
    w: int,
    c: int,
    n: int,
    extra_meta: dict | None = None,
) -> None:
    """Materialize the RECURSIVELY promoted inverted index: like
    build_promoted_index, but buckets still hot after a split descend into
    the next segment (promote_words_iter). Same storage layout — one row
    per window, partitioned by the base word's 2-symbol prefix — so a
    lookup stays partition pruning + word equality; the descent depth only
    changes the word_promoted values, never the layout."""
    import json
    import os

    promoted = promote_words_iter(
        symbolized, threshold, w=w, c=c, n=n, segments=tuple(segments)
    )
    idx = promoted.select(
        "key",
        "window_ts",
        "word",
        "word_promoted",
        F.substring("word", 1, 2).alias("prefix"),
    )
    idx.repartition("prefix").write.mode("overwrite").partitionBy(
        "prefix"
    ).parquet(path)
    meta = {
        "segments": [int(s) for s in segments],
        "threshold": threshold,
        "w": w,
        "c": c,
        "n": n,
    }
    meta.update(extra_meta or {})
    with open(os.path.join(path, "_promoted_meta.json"), "w") as f:
        json.dump(meta, f)


def promoted_lookup_iter_indexed(
    spark, path: str, query_series: np.ndarray
) -> DataFrame:
    """Multi-level descent against a STORED recursively-promoted index:
    probe words are driver-side kernel math, the scan prunes on the
    ``prefix`` partition column, and a bucket split to depth d matches iff
    its word_promoted equals the query's depth-d refinement — one IN over
    the refinement chain."""
    meta = read_promoted_meta(path)
    chain = promoted_query_words_iter(
        query_series, meta["w"], meta["c"], tuple(meta["segments"])
    )
    idx = spark.read.parquet(path)
    return idx.filter(
        (F.col("prefix") == chain[0][:2])
        & (F.col("word") == chain[0])
        & F.col("word_promoted").isin(chain)
    ).drop("prefix")


def promoted_lookup_iter(
    symbolized: DataFrame,
    query_series: np.ndarray,
    w: int,
    c: int,
    n: int,
    segments: tuple = (0, 1),
    threshold: int = 20,
) -> DataFrame:
    """Exact-word lookup that descends promoted sub-buckets to ANY depth:
    a bucket split d times matches iff its word_promoted equals the
    query's depth-d refinement — so the filter is one IN over the (depth+1)-
    element refinement chain. Cold buckets match on the base word
    (chain[0]); each extra split halves (in expectation) the rows a hot
    bucket's lookup touches."""
    chain = promoted_query_words_iter(query_series, w, c, segments)
    promoted = promote_words_iter(symbolized, threshold, w, c, n, segments)
    return promoted.filter(F.col("word") == chain[0]).filter(
        F.col("word_promoted").isin(chain)
    )
