"""Deduplication operators for web-text corpora.

Five tiers, cheapest first — each is a standalone operator so a pipeline
can ladder them:

  * exact_dedup        — hash-groupBy on xxhash64(text): one shuffle.
  * ngram_jaccard_pairs— exact n-gram Jaccard over candidate pairs.
  * minhash_lsh_dupes  — MinHash signatures + banded LSH: near-dup pairs
                         without the quadratic join; candidate pairs only
                         where a band bucket collides.
  * simhash_dupes      — 64-bit SimHash + Hamming-ball matching via
                         4-way table split (Charikar 2002 / Manku 2007).
  * embedding_dupes    — cosine near-dup over an embedding column (see
                         similarity.py for the ANN machinery).

All signature computation is vectorized numpy inside Arrow batches
(mapInPandas / pandas_udf); all joins are DataFrame equi-joins so Catalyst
chooses broadcast vs shuffle. No per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text.

    Phase 1 shuffles ONLY (id, 8-byte xxhash64) pairs to find multi-doc
    hash groups; unique-hash docs are decided right there. Phase 2 resolves
    the multi-doc groups (true duplicates + the vanishingly rare collisions)
    with an exact group-by on (hash, text) — full documents shuffle only for
    members of those groups, a tiny fraction of a deduplicated corpus. The
    multi-hash set is broadcast (bounded by the number of duplicate groups).
    """
    ids = docs.select(F.col(id_col).alias("_id"), F.xxhash64(F.col(text_col)).alias("_h"))
    groups = ids.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_n"), F.min("_id").alias("_keep")
    )
    singles = groups.filter(F.col("_n") == 1).select(F.col("_keep").alias(id_col))
    multi_h = groups.filter(F.col("_n") > 1).select("_h")
    multi_docs = docs.withColumn("_h", F.xxhash64(F.col(text_col))).join(
        F.broadcast(multi_h), "_h", "left_semi"
    )
    multi_keep = (
        multi_docs.groupBy("_h", text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    keep = singles.unionByName(multi_keep)
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _mix64(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 avalanche finalizer (public constants).

    Polynomial rolling hashes of overlapping shingles are heavily
    correlated (adjacent windows share k-1 bytes); without avalanche
    mixing, SimHash bit votes concentrate and MinHash minima collide
    across unrelated documents. One mix pass makes every shingle hash
    effectively uniform in 2^64.
    """
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _hash_shingles(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Per text: uint64 hashes of its k-character shingles (vectorized per
    batch via numpy polynomial rolling hash + avalanche mix)."""
    out = []
    for t in texts.fillna(""):  # loop over batch rows; inner work is numpy
        b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < k:
            out.append(_mix64(np.array([0], dtype=np.uint64)))
            continue
        # rolling polynomial hash of every k-byte window
        base = np.uint64(1099511628211)
        powers = base ** np.arange(k, dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        h = _mix64((windows * powers).sum(axis=1))
        out.append(np.unique(h))
    return out


def minhash_udf(num_perm: int = 64, k: int = 5, seed: int = 1):
    """text → array<long> MinHash signature (num_perm universal hashes).

    Vectorized across the whole Arrow batch: all texts' bytes concatenate
    into one array, ONE sliding-window polynomial-hash pass produces every
    shingle hash, windows crossing document boundaries are masked, and the
    per-document minima come from ``np.minimum.reduceat`` — no per-row
    Python beyond the byte-concatenation itself.
    """
    rng = np.random.RandomState(seed)
    A = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    B = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k, dtype=np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def _minhash(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        encoded = [t.encode("utf-8", "ignore") for t in texts.fillna("")]
        lens = np.array([len(b) for b in encoded], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        if offsets[-1] == 0:
            # every text in the batch is empty/null: emit the per-permutation
            # sentinel signature directly (the pos/doc/searchsorted machinery
            # below would index out of bounds on an all-empty blob)
            sent = (B % np.uint64(_MERSENNE)).astype(np.int64)
            return pd.Series([sent.copy() for _ in range(len(texts))])
        blob = np.frombuffer(b"".join(encoded) + b"\0" * k, dtype=np.uint8)

        # one global rolling-hash pass over every k-byte window
        windows = np.lib.stride_tricks.sliding_window_view(
            blob[: offsets[-1] + k - 1], k
        ).astype(np.uint64)
        h = _mix64(windows @ powers)  # (W,) uint64, avalanche-mixed

        # a window starting at global position i belongs to the doc whose
        # span contains [i, i+k); mark cross-boundary and short-doc windows
        W = offsets[-1] if offsets[-1] else 1
        pos = np.arange(W)
        doc = np.searchsorted(offsets, pos, side="right") - 1
        valid = pos + k <= offsets[doc + 1]
        h = h[:W]

        sigs = np.empty((len(texts), num_perm), dtype=np.int64)
        MAXU = np.iinfo(np.uint64).max
        MOD = np.uint64(_MERSENNE)
        n_docs = len(texts)
        starts = np.minimum(offsets[:-1], max(W - 1, 0))
        for p in range(num_perm):
            vals = (A[p] * h + B[p]) % MOD
            vals = np.where(valid, vals, MAXU)
            if W:
                mins = np.minimum.reduceat(vals, starts)
            else:
                mins = np.full(n_docs, MAXU, np.uint64)
            # zero-length docs share a start with their neighbor → override;
            # docs shorter than k have only invalid windows → already MAXU
            mins = np.where(lens == 0, MAXU, mins)
            # sentinel for "no shingle": hash of the single 0-shingle
            # (matches the previous per-row implementation for short docs)
            sentinel = (A[p] * np.uint64(0) + B[p]) % MOD
            mins = np.where(mins == MAXU, sentinel, mins)
            sigs[:, p] = mins.astype(np.int64)
        return pd.Series(list(sigs))

    return _minhash


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    k: int = 5,
) -> DataFrame:
    """(id, sig) MinHash signature table — computed once, reused by both
    the banded join and the estimate step."""
    return docs.select(
        F.col(id_col).alias("id"),
        minhash_udf(num_perm, k)(F.col(text_col)).alias("sig"),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    max_bucket: int = 256,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: (id_a, id_b).

    signature → `bands` band-hashes → explode → self-join per (band, hash)
    bucket. Scale discipline:
      * the pair-space dedup is a ``.distinct()`` on (id_a, id_b) ONLY —
        signatures are re-attached afterwards, so the widest shuffle moves
        16-byte pairs, never 64-long arrays;
      * buckets larger than ``max_bucket`` are dropped before the join
        (a hot band bucket is quadratic in its size — at web scale one
        degenerate bucket, e.g. boilerplate-only pages, melts the stage;
        Manku-style systems cap exactly like this and the dropped mass is
        logged via the bucket-count aggregate).
    """
    rows_per_band = num_perm // bands
    if sig is None:
        sig = minhash_signatures(docs, text_col, id_col, num_perm, k)
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        "sig",
                        b * rows_per_band + 1,
                        rows_per_band,
                    ).cast("string")
                ),
            )
        ).alias("band", "bucket"),
    )
    if max_bucket:
        from pyspark.sql import Window

        cnt = F.count(F.lit(1)).over(
            Window.partitionBy("band", "bucket")
        )
        banded = banded.withColumn("_bn", cnt).filter(
            F.col("_bn") <= max_bucket
        ).drop("_bn")
    left = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    right = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_dupes(
    docs: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    max_bucket: int = 256,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs whose estimated Jaccard (signature agreement) ≥ threshold.

    Signatures join back onto the (narrow) candidate pairs — at scale the
    candidate side is small, so Catalyst/AQE broadcasts it against the
    signature table instead of shuffling signatures through the pair dedup.

    The signature table feeds THREE plan branches (banding + two pair
    rejoins). The scale path is to pass ``sig`` as a STORED signature table
    (computed once per corpus snapshot, exactly like the ANN indexes — see
    the entry's _minhash_sig). When ``sig`` is None this function persists
    a self-computed one; that cache is owned by the returned plan and lives
    until the session drops it — callers who care should pass sig.
    """
    if sig is None:
        sig = minhash_signatures(docs, text_col, id_col, num_perm, k).persist()
    pairs = minhash_lsh_candidates(
        docs, text_col, id_col, num_perm, bands, k, max_bucket, sig=sig
    )
    withA = pairs.join(
        sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    )
    withB = withA.join(
        sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b"
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            lambda x: x == 1,
        )
    ) / F.lit(num_perm)
    return (
        withB.withColumn("jaccard_est", agree)
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", k: int = 5
) -> DataFrame:
    """Exact character-k-gram Jaccard for verified dedup decisions.

    Joins candidate pairs back to texts (candidates ≪ corpus → broadcast)
    and computes exact Jaccard vectorized per Arrow batch.
    """
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        ha = _hash_shingles(ta, k)
        hb = _hash_shingles(tb, k)
        out = np.empty(len(ha))
        for i, (x, y) in enumerate(zip(ha, hb)):
            inter = np.intersect1d(x, y, assume_unique=True).size
            out[i] = inter / (x.size + y.size - inter) if (x.size + y.size) else 0.0
        return pd.Series(out)

    d = docs.select(F.col(id_col), F.col(text_col))
    withA = pairs.join(
        d.withColumnRenamed(id_col, "id_a").withColumnRenamed(text_col, "text_a"),
        "id_a",
    )
    withB = withA.join(
        d.withColumnRenamed(id_col, "id_b").withColumnRenamed(text_col, "text_b"),
        "id_b",
    )
    return withB.withColumn("jaccard", _jac("text_a", "text_b")).drop(
        "text_a", "text_b"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_udf(k: int = 8):
    """text → 64-bit SimHash over k-gram hashes (Charikar 2002).

    Fully vectorized across the Arrow batch (same global sliding-window
    pass as minhash_udf): ONE rolling-hash pass over the concatenated
    bytes, avalanche mix (murmur3 fmix64 — without it adjacent windows'
    hashes correlate and the signature space collapses to a few hundred
    values corpus-wide), then per-document frequency-weighted bit votes
    via 64 ``np.add.reduceat`` passes — repeated shingles vote with their
    multiplicity, per Charikar/Manku. No per-row Python.
    """
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k, dtype=np.uint64)

    @pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=np.int64)
        encoded = [t.encode("utf-8", "ignore") for t in texts.fillna("")]
        lens = np.array([len(b) for b in encoded], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        n_docs = len(texts)
        if offsets[-1] == 0:
            return pd.Series(np.zeros(n_docs, dtype=np.int64))
        blob = np.frombuffer(b"".join(encoded) + b"\0" * k, dtype=np.uint8)
        windows = np.lib.stride_tricks.sliding_window_view(
            blob[: offsets[-1] + k - 1], k
        ).astype(np.uint64)
        h = _mix64(windows @ powers)

        W = offsets[-1]
        pos = np.arange(W)
        doc = np.searchsorted(offsets, pos, side="right") - 1
        valid = pos + k <= offsets[doc + 1]
        h = h[:W]
        starts = np.minimum(offsets[:-1], W - 1)
        n_valid = np.add.reduceat(valid.astype(np.int64), starts)
        n_valid = np.where(lens == 0, 0, n_valid)

        sim = np.zeros(n_docs, dtype=np.uint64)
        for b in range(64):
            bit = (((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)) & valid
            ones = np.add.reduceat(bit, starts)
            ones = np.where(lens == 0, 0, ones)
            votes = 2 * ones - n_valid
            sim |= (votes > 0).astype(np.uint64) << np.uint64(b)
        return pd.Series(sim.astype(np.int64))

    return _simhash


def simhash_dupes(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_bucket: int = 256,
    verify_threshold: float | None = 0.6,
    verify_k: int = 5,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming, verified
    by exact n-gram Jaccard.

    Candidate generation uses the Manku et al. (WWW 2007) table-split
    trick: split the 64-bit hash into (max_hamming+1) blocks; any pair
    within distance d must agree exactly on ≥1 block (pigeonhole), so
    candidates come from equi-joins on block values — never a cross join.
    Scale discipline mirrors minhash_lsh_candidates: block buckets larger
    than ``max_bucket`` are dropped (a degenerate block value is quadratic
    in its bucket size), the pair dedup shuffles (id_a, id_b, 8-byte sims)
    only, and every surviving pair is VERIFIED with exact character-k-gram
    Jaccard (``ngram_jaccard``) so a SimHash collision can never emit a
    false near-duplicate.
    """
    nblocks = max_hamming + 1
    width = 64 // nblocks
    sh = docs.select(
        F.col(id_col).alias("id"), simhash_udf(k)(F.col(text_col)).alias("sim")
    )
    blocks = sh.select(
        "id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.shiftrightunsigned(F.col("sim"), b * width),
                        F.lit(1 << width),
                    )
                    for b in range(nblocks)
                ]
            )
        ).alias("block", "val"),
    )
    if max_bucket:
        from pyspark.sql import Window

        cnt = F.count(F.lit(1)).over(Window.partitionBy("block", "val"))
        blocks = blocks.withColumn("_bn", cnt).filter(
            F.col("_bn") <= max_bucket
        ).drop("_bn")
    left = blocks.select(F.col("id").alias("id_a"), F.col("sim").alias("sim_a"),
                         "block", "val")
    right = blocks.select(F.col("id").alias("id_b"), F.col("sim").alias("sim_b"),
                          "block", "val")
    cand = (
        left.join(right, ["block", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    pairs = (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    if verify_threshold is None:
        return pairs
    verified = ngram_jaccard(pairs, docs, id_col, text_col, verify_k)
    return verified.filter(F.col("jaccard") >= verify_threshold).select(
        "id_a", "id_b", "hamming", F.round("jaccard", 6).alias("jaccard")
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: the step that
    turns verified dup PAIRS into dedup GROUPS (keep one representative per
    component, drop the rest) — the standard last stage of a web-corpus
    dedup pipeline.

    Min-label propagation with pointer jumping: each round (a) every node
    takes the min label over itself and its neighbors, (b) labels chase
    their own label's label (path halving), giving O(log n) rounds on
    chain-shaped components instead of O(diameter). Each round is two
    hash-shuffle joins on ids only — labels are (node, label) longs, no
    payloads ride along. Convergence is checked with one count() action
    per round (inherent to any iterative fixpoint on Spark; same pattern
    GraphX/GraphFrames use).

    Returns (id, cluster_id) with cluster_id = min node id reachable.
    Isolated nodes keep cluster_id = their own id.

    Cache contract: the returned DataFrame is backed by the final round's
    persisted labels (unpersisting it before consumption would recompute
    the whole iteration chain through already-unpersisted intermediates).
    The CALLER owns that cache — materialize once, then ``.unpersist()``
    it; same ownership rule as the stored-signature path in
    minhash_lsh_dupes.
    """
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("s"), F.col(src_col).alias("d")
            )
        )
        .distinct()
    )
    sym.persist()
    # Seed labels from nodes ∪ edge endpoints: an endpoint missing from
    # `nodes` must still carry its own id as a candidate min label and be
    # visible to the convergence check from round 1 — otherwise propagation
    # through it can converge prematurely / to the wrong min. The final
    # select restricts the answer back to `nodes`, so extra endpoints only
    # participate in propagation, never in the output row set.
    node_ids = nodes.select(F.col(id_col).alias("n"))
    seed = node_ids.unionByName(sym.select(F.col("s").alias("n"))).distinct()
    labels = seed.select("n", F.col("n").alias("lbl"))
    try:
        for _ in range(max_iter):
            # (a) neighbor-min: msg(d) = lbl(s) for every edge s->d
            msgs = sym.join(
                labels.withColumnRenamed("n", "s"), "s"
            ).select(F.col("d").alias("n"), "lbl")
            new = (
                labels.unionByName(msgs)
                .groupBy("n")
                .agg(F.min("lbl").alias("lbl"))
            )
            # `new` feeds BOTH sides of the pointer-jump self-join —
            # persist it so the neighbor-min aggregation runs once
            new.persist()
            # (b) pointer jump: lbl(n) <- lbl(lbl(n))
            jump = new.alias("x").join(
                new.select(
                    F.col("n").alias("lbl"), F.col("lbl").alias("lbl2")
                ).alias("y"),
                "lbl",
                "left",
            ).select(
                F.col("n"), F.coalesce("lbl2", "lbl").alias("lbl")
            )
            jump.persist()
            changed = (
                jump.alias("a")
                .join(labels.alias("b"), "n")
                .filter(F.col("a.lbl") != F.col("b.lbl"))
                .count()
            )
            new.unpersist()
            labels.unpersist()
            labels = jump
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels.join(node_ids, "n").select(
        F.col("n").alias(id_col), F.col("lbl").alias("cluster_id")
    )
