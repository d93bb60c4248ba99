"""Misra-Gries summary guarantees + two-pass exact heavy hitters."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.core.misra_gries import MisraGries
from cuckoo_filter_spark.operators import frequency


def _zipf_stream(n, vocab, seed):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, n).astype(np.uint64)
    return np.minimum(ranks, vocab).astype(np.uint64)


def test_mg_bounds_and_completeness():
    stream = _zipf_stream(200_000, 5000, 1)
    k = 128
    mg = MisraGries(k)
    for chunk in np.array_split(stream, 17):
        mg.add_many(chunk)
    true = {int(v): int(c) for v, c in zip(*np.unique(stream, return_counts=True))}
    assert mg.total == len(stream)
    assert mg.shed <= mg.total // (k + 1)
    est = mg.estimate_many(np.array(list(true), dtype=np.uint64))
    for (v, t), e in zip(true.items(), est):
        assert e <= t                   # never overcounts
        assert t - e <= mg.shed         # bounded undercount
    # completeness: every item with true count > shed is a candidate
    cand = set(int(x) for x in mg.candidates()[0])
    for v, t in true.items():
        if t > mg.shed:
            assert v in cand


def test_mg_merge_matches_single_and_order_invariant_bounds():
    stream = _zipf_stream(120_000, 3000, 2)
    k = 64
    parts = np.array_split(stream, 8)
    rng = np.random.default_rng(3)
    true = {int(v): int(c) for v, c in zip(*np.unique(stream, return_counts=True))}
    for _ in range(3):
        order = rng.permutation(8)
        sks = []
        for i in order:
            sk = MisraGries(k)
            sk.add_many(parts[i])
            sks.append(sk)
        acc = sks[0]
        for sk in sks[1:]:
            acc.merge_in_place(sk)
        assert acc.total == len(stream)
        assert acc.shed <= acc.total // (k + 1)
        est = acc.estimate_many(np.array(list(true), dtype=np.uint64))
        for (v, t), e in zip(true.items(), est):
            assert e <= t and t - e <= acc.shed
        cand = set(int(x) for x in acc.candidates()[0])
        for v, t in true.items():
            if t > acc.shed:
                assert v in cand


def test_mg_weighted_and_roundtrip():
    mg = MisraGries(4)
    mg.add_many(np.array([1, 2, 3], dtype=np.uint64),
                np.array([10, 5, 1], dtype=np.int64))
    mg.add_many(np.array([4, 5], dtype=np.uint64),
                np.array([7, 2], dtype=np.int64))
    rt = MisraGries.from_bytes(mg.to_bytes())
    assert rt.total == mg.total and rt.shed == mg.shed
    assert np.array_equal(rt.keys, mg.keys)
    assert np.array_equal(rt.counts, mg.counts)


def test_heavy_hitters_exact_matches_naive(spark):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    weights = np.array([50] * 5 + [1] * 195, dtype=np.float64)
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=30, p=weights)) for _ in range(300)
    ]
    docs = spark.createDataFrame(pd.DataFrame({"text": texts}))
    toks = frequency.whitespace_tokens(docs, "text")
    total = toks.count()
    thr = 0.02
    got = {
        (r.token, r.cnt)
        for r in frequency.heavy_hitters_exact(toks, "token", thr).collect()
    }
    want = {
        (r.token, r.cnt)
        for r in toks.groupBy("token").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= thr * total).collect()
    }
    assert got == want and len(want) >= 5


def test_mg_property_random_chunking_and_merge_trees():
    """Property test: for random streams, random chunkings, and
    random merge trees, the Misra-Gries invariants hold — never
    overcounts, undercount ≤ shed ≤ n/(k+1), candidates complete
    above shed, total conserved."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(0, 300), min_size=1, max_size=3000),
        st.integers(2, 6),     # number of partitions
        st.integers(4, 64),    # capacity
        st.randoms(),
    )
    def check(items, nparts, cap, rnd):
        stream = np.array(items, dtype=np.uint64)
        cuts = sorted(rnd.sample(range(len(stream) + 1), k=min(nparts - 1, len(stream))))
        parts = np.split(stream, cuts)
        sks = []
        for p in parts:
            sk = MisraGries(cap)
            # feed each partition in random sub-chunks
            if len(p) > 1:
                sub = sorted(rnd.sample(range(1, len(p)), k=min(2, len(p) - 1)))
                for chunk in np.split(p, sub):
                    sk.add_many(chunk)
            else:
                sk.add_many(p)
            sks.append(sk)
        rnd.shuffle(sks)           # random merge order
        acc = sks[0]
        for sk in sks[1:]:
            acc.merge_in_place(sk)
        true = dict(zip(*np.unique(stream, return_counts=True)))
        assert acc.total == len(stream)
        assert acc.shed <= acc.total // (cap + 1)
        est = acc.estimate_many(np.array(list(true), dtype=np.uint64))
        cand = set(int(x) for x in acc.candidates()[0])
        for (v, t), e in zip(true.items(), est):
            assert e <= t and t - e <= acc.shed
            if t > acc.shed:
                assert int(v) in cand

    check()
