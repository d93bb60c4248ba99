"""Deduplication operators for large-scale training-data pipelines.

* :func:`exact_dedup` — content-hash groupBy; shuffles only
  (key, id) pairs, never document bodies. At 100 TB this is the
  canonical first pass: the 16-byte hash column is ~0.1% of the
  data volume.
* :func:`minhash_signatures` / :func:`lsh_candidate_pairs` /
  :func:`near_dup_pairs` — MinHash + banded LSH (Broder 1997;
  Leskovec et al. MMDS ch.3) over character shingles, vectorized in
  numpy inside ``mapInPandas``; candidate generation is a groupBy
  on (band, band_hash) so Spark's Exchange does the bucketing; the
  final exact-Jaccard verification touches only candidate pairs.
* :func:`simhash64` — Charikar 2002 bitwise fingerprint, vectorized;
  near-dup = small Hamming distance, bucketable by bit blocks.

Band/row defaults (64 bands × 2 rows = 128 hashes) give
P[caught | J=0.6] = 1-(1-0.6^2)^64 ≈ 1-6e-13 — effectively exact
recall at the 0.6 threshold once candidates are verified.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.text import normalized_text

_MERSENNE = np.uint64((1 << 61) - 1)
_SHINGLE_P = np.uint64(1099511628211)


def _mod_mersenne(v: np.ndarray) -> np.ndarray:
    """v % (2^61-1) for uint64 v via the Mersenne mask-shift identity
    (v & M) + (v >> 61), one conditional subtract — bit-identical to
    ``v % _MERSENNE`` (any v < 2^64 needs at most one fold) at a
    fraction of the divide cost."""
    t = (v & _MERSENNE) + (v >> np.uint64(61))
    return np.where(t >= _MERSENNE, t - _MERSENNE, t)


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the min-id representative per exact content group.
    Hash first so the shuffle carries (hash, id), not content."""
    key = F.sha2(F.col(content_col), 256).alias("__ckey")
    return (
        df.select(key, F.col(id_col))
        .groupBy("__ckey")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# shingles + minhash (numpy, per Arrow batch)
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-gram hashes of a normalized string, vectorized:
    polynomial hash over a sliding window via stride tricks."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    with np.errstate(over="ignore"):
        h = np.zeros(len(b) - k + 1, dtype=np.uint64)
        for i in range(k):
            h = h * _SHINGLE_P + b[i : len(b) - k + 1 + i]
    return np.unique(h)


def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_hashes, dtype=np.uint64)
    return a, b


def _signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min over shingles of (a*x + b) mod (2^61-1), per hash fn."""
    with np.errstate(over="ignore"):
        x = _mod_mersenne(shingles)
        vals = _mod_mersenne(a[:, None] * x[None, :] + b[:, None])
    return vals.min(axis=1)


def minhash_signatures(
    df: DataFrame,
    content_col: str,
    id_col: str,
    num_hashes: int = 128,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>) per document.

    Stays with the per-document numpy kernel DELIBERATELY: a fully
    flattened multi-doc pass (concatenate all texts, one sliding
    hash, lexsort shingle dedup, segmented ``minimum.reduceat``) was
    built and MEASURED SLOWER at every doc-size regime — 0.65x on
    the real sf0.1 corpus (297-char docs), 0.48x on 40-char docs,
    1.17x best-case on dense synthetic 400-char docs (BENCH/NOTES.md
    round-4 §2). The kernel is arithmetic-bound (128 hash fns x
    shingles dominates at ~5.5 ns/element either way) and the
    per-doc (num_hashes, ~300)-element matrices are L1/L2-resident,
    which the flattened layout forfeits. Per-doc Python overhead is
    ~10% of wall time — not the bottleneck."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a, b = _minhash_params(num_hashes, seed)
        for pdf in batches:
            sigs = [
                _signature(_shingle_hashes(t, shingle_k), a, b).astype(np.int64)
                for t in pdf["__norm"]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    prepared = df.select(
        F.col(id_col), normalized_text(F.col(content_col)).alias("__norm")
    )
    return prepared.mapInPandas(compute, schema=f"{id_col} long, signature array<long>")


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, bands: int = 64, rows_per_band: int = 2
) -> DataFrame:
    """Emit distinct (id_a < id_b) pairs sharing ≥1 LSH band bucket.

    Banding is relational: explode signatures into (band, band_key)
    rows, groupBy-bucket (one Exchange), pair within buckets. Bucket
    pairing is quadratic per bucket — acceptable because real
    buckets are tiny; a hot bucket indicates near-identical spam
    which exact-dedup upstream should have removed."""
    sliced = sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.slice(
                    F.col("signature"), i * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band", "band_sig"),
    ).select(
        id_col, "band", F.xxhash64(F.col("band_sig").cast("string")).alias("bkey")
    )
    left = sliced.alias("l")
    right = sliced.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def exact_jaccard_pairs(
    pairs: DataFrame,
    df: DataFrame,
    content_col: str,
    id_col: str,
    shingle_k: int = 3,
) -> DataFrame:
    """Join candidate pairs back to content and compute EXACT k-gram
    Jaccard, vectorized per batch. Returns (id_a, id_b, jaccard)."""
    docs = df.select(
        F.col(id_col), normalized_text(F.col(content_col)).alias("__norm")
    )
    joined = (
        pairs.join(docs.withColumnsRenamed({id_col: "id_a", "__norm": "na"}), "id_a")
        .join(docs.withColumnsRenamed({id_col: "id_b", "__norm": "nb"}), "id_b")
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jac = np.empty(len(pdf))
            for i, (ta, tb) in enumerate(zip(pdf["na"], pdf["nb"])):
                sa = _shingle_hashes(ta, shingle_k)
                sb = _shingle_hashes(tb, shingle_k)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                jac[i] = inter / (len(sa) + len(sb) - inter)
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": jac}
            )

    return joined.mapInPandas(compute, schema="id_a long, id_b long, jaccard double")


def near_dup_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.6,
    num_hashes: int = 128,
    bands: int = 64,
    shingle_k: int = 3,
    prefilter_margin: float = 0.25,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-verified: returns
    pairs with true k-gram Jaccard >= threshold.

    Three stages, each cheaper than the last is selective:
    1. banded LSH candidate join (recall control);
    2. JVM-side signature-agreement prefilter: estimated Jaccard =
       matching-component fraction, computed with codegen'd
       ``zip_with`` — no Python. Character shingles make random
       same-language pairs overlap heavily (J ~ 0.4), so banding
       alone floods the verifier; the estimate at
       ``threshold - prefilter_margin`` separates true pairs from
       that noise by ~7 sigma with 128 components (Chernoff:
       P[est < t-0.25 | J >= t] < 1e-12), so the exact output is
       unchanged;
    3. exact per-pair shingle Jaccard in Python for the survivors.

    Signatures are persisted (they feed both the band join and the
    prefilter); Spark evicts them LRU after the query completes.
    """
    sigs = minhash_signatures(
        df, content_col, id_col, num_hashes, shingle_k
    ).persist()
    cands = lsh_candidate_pairs(sigs, id_col, bands, num_hashes // bands)
    pre_t = max(0.0, threshold - prefilter_margin)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("__sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("__sb"))
    est_match = F.size(
        F.filter(
            F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda v: v
        )
    ) / F.lit(float(num_hashes))
    pre = (
        cands.join(sa, "id_a").join(sb, "id_b")
        .filter(est_match >= pre_t)
        .select("id_a", "id_b")
    )
    verified = exact_jaccard_pairs(pre, df, content_col, id_col, shingle_k)
    return verified.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# near-dup clustering: pairs -> components -> canonical survivors
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components of the undirected pair graph — the step
    that turns near-duplicate PAIRS into duplicate CLUSTERS (pairs
    are not transitive: A~B and B~C usually means A,B,C are one
    cluster even when A~C is below threshold).

    Returns ``(node, component)`` where ``component`` is the minimum
    node id in the component — a deterministic canonical id.

    Algorithm: iterative min-label propagation with pointer jumping,
    pure DataFrame ops (no driver-side graph):

    * edge step — every node takes the min label over itself and its
      neighbors (join edges→labels, groupBy min: one shuffle keyed
      by node id);
    * pointer-jumping step — ``label(v) ← label(label(v))`` (one
      self-join), which collapses label chains geometrically, so
      convergence is O(log diameter) rounds rather than O(diameter).

    Each round ends with ONE ``localCheckpoint`` (of the
    pointer-jumped labels): it truncates the iterative lineage
    (otherwise the plan doubles per round) and materializes the
    round's result. Superseded rounds' Python references drop on
    reassignment, so Spark's ContextCleaner reclaims their blocks
    (verified empirically: blocks free once the Dataset is
    unreachable and a GC cycle runs); peak retention is two rounds
    of (node, label) longs. On a cluster with a configured
    checkpoint dir, ``DataFrame.checkpoint`` is the fault-tolerant
    alternative; executor loss during the loop then re-reads state
    instead of recomputing the chain.

    Raises ``RuntimeError`` if ``max_iterations`` is exhausted
    before the fixed point — partially-converged labels are WRONG
    answers (over-segmented clusters), never returned silently.
    With pointer jumping, 25 rounds cover any component diameter up
    to ~2^25, so hitting the cap indicates a pathological input.

    Convergence detection is free of an extra join: labels only ever
    decrease, so the label sum is strictly decreasing until the
    fixed point (label constant across every edge = component min);
    the sum is tracked as ``decimal(38,0)`` so 10^12 64-bit ids
    cannot overflow the accumulator.

    Scale shape: shuffles carry only (node, label) longs — never
    document bodies; near-dup clusters are shallow (diameter a few
    hops), so the loop typically terminates in 3-4 rounds.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    converged = False
    for _ in range(max_iterations):
        msgs = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), F.col("label"))
        merged = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        ptr = merged.select(
            F.col("node").alias("__pnode"), F.col("label").alias("__plabel")
        )
        # one checkpoint per round (the jumped labels) — checkpointing
        # `merged` too would double the materialized blocks for no
        # lineage benefit
        jumped = (
            merged.join(ptr, merged["label"] == ptr["__pnode"], "left")
            .select(
                F.col("node"),
                F.coalesce("__plabel", "label").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        s = jumped.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = jumped  # drops the prior round's reference
        if prev_sum is not None and s == prev_sum:
            converged = True
            break
        prev_sum = s
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach the label fixed point "
            f"within {max_iterations} iterations; partial labels would "
            "over-segment clusters. Raise max_iterations (pointer "
            "jumping needs ~log2(component diameter) rounds)."
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_keep_canonical(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every near-duplicate except the canonical (min-id)
    member of its component; rows not in any pair survive untouched.
    The join carries only (id, component) — the document bodies
    stream through a single broadcast-or-shuffle hash join."""
    comp = connected_components(pairs, id_a, id_b)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64_batch(texts: pd.Series, seed: int = 42) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (Charikar 2002): sum
    ±1 per bit weighted by token frequency, sign → bit. Token
    hashes are md5-derived (stable across processes) then
    xxhash-mixed; repeated tokens within a partition are hashed
    once via a module-level cache."""
    import hashlib

    from cuckoo_filter_spark.hashing import xxhash64_u64

    bit_pos = np.arange(64, dtype=np.uint64)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            out[i] = 0
            continue
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        th = np.array(
            [int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "little")
             for u in uniq],
            dtype=np.uint64,
        )
        th = xxhash64_u64(th, seed=seed)
        bits = ((th[:, None] >> bit_pos[None, :]) & 1).astype(np.int64)
        weights = (2 * bits - 1) * counts[:, None]
        sim_bits = (weights.sum(axis=0) > 0).astype(np.uint64)
        out[i] = np.uint64((sim_bits << bit_pos).sum(dtype=np.uint64)).view(np.int64)
    return out


def simhash64(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "simhash": simhash64_batch(pdf["__norm"]),
            })

    prepared = df.select(
        F.col(id_col), normalized_text(F.col(content_col)).alias("__norm")
    )
    return prepared.mapInPandas(compute, schema=f"{id_col} long, simhash long")


def simhash_near_pairs(
    sim_df: DataFrame, id_col: str, max_hamming: int = 3, blocks: int = 4
) -> DataFrame:
    """Hamming-ball pairing via the block trick: two hashes within
    Hamming distance d < blocks must agree exactly on ≥1 of the
    `blocks` (64/blocks)-bit blocks → bucket-join per block, verify
    distance with bit_count (JVM-side). Recall is guaranteed only
    for max_hamming < blocks (pigeonhole); pass blocks accordingly.
    blocks must divide 64."""
    if 64 % blocks:
        raise ValueError("blocks must divide 64")
    if max_hamming >= blocks:
        raise ValueError("need max_hamming < blocks for guaranteed recall")
    width = 64 // blocks
    bmask = (1 << width) - 1
    sliced = sim_df.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), width * i).bitwiseAND(F.lit(bmask))
            for i in range(blocks)
        ])).alias("block", "bval"),
    )
    l, r = sliced.alias("l"), sliced.alias("r")
    cand = (
        l.join(r, (F.col("l.block") == F.col("r.block"))
               & (F.col("l.bval") == F.col("r.bval"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                F.col("l.simhash").alias("ha"), F.col("r.simhash").alias("hb"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
