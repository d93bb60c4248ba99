"""End-to-end distributed cuckoo-filter tests (SURVEY §5.4,
FIXTURES.md §2/§4): build over the Iceberg-shaped table, zero false
negatives, FPR ≤ ε, shard-routed contains/delete, merge
associativity across partition orderings, skew handling.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.config import CuckooConfig
from cuckoo_filter_spark.core.cuckoo import CuckooFilter
from cuckoo_filter_spark.hashing import key_from_content, keys_to_unsigned
from cuckoo_filter_spark.operators.membership import (
    DistributedCuckooFilter, ShardedCuckooFilter,
)
from cuckoo_filter_spark.sources.repo_table import (
    repo_files_from_documents, synthetic_repo_files,
)

N_ROWS = 20_000
CAPACITY = 32_768
CFG = CuckooConfig(bits_per_tag=16, bucket_size=4)


@pytest.fixture(scope="module")
def repo_df(spark):
    df = synthetic_repo_files(spark, N_ROWS, num_partitions=8).persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def merged(spark, repo_df):
    return DistributedCuckooFilter.build(repo_df, "key", CAPACITY, CFG)


def test_key_invariant_vs_hashlib(repo_df):
    """Per-row invariant: Spark-derived key == sha256(content) prefix
    (BASELINE.json input_hint)."""
    rows = repo_df.select("content", "key").limit(50).collect()
    for r in rows:
        expect = key_from_content(r.content)
        signed = expect - (1 << 64) if expect >= 1 << 63 else expect
        assert r.key == signed


def test_merged_zero_false_negatives(spark, repo_df, merged):
    out = merged.contains(repo_df.select("key"), "key")
    n_found = out.filter(F.col("member")).count()
    assert n_found == N_ROWS
    assert merged.filter.occupied == N_ROWS
    assert merged.filter.failures == 0


def test_merged_fpr_bound(spark, merged):
    """Probe keys from a range disjoint from any sha256-derived key
    workload (fresh synthetic contents never inserted)."""
    probes = synthetic_repo_files(spark, 50_000, num_partitions=4, seed=777)
    out = merged.contains(probes.select("key"), "key")
    fp = out.filter(F.col("member")).count()
    alpha = merged.filter.occupied / merged.filter.slot_capacity
    eps = CFG.theoretical_fpr(alpha)
    assert fp / 50_000 <= 2.5 * eps + 1e-4


def test_sharded_build_and_contains(spark, repo_df):
    sharded = ShardedCuckooFilter.build(repo_df, "key", CAPACITY, 8, CFG).persist()
    m = sharded.metrics().collect()[0]
    assert m["rows"] == N_ROWS
    assert m["occupied"] == N_ROWS
    assert m["failures"] == 0
    assert m["num_shards"] == 8
    out = sharded.contains(repo_df.select("key"))
    assert out.filter(F.col("member")).count() == N_ROWS

    # negatives through the same routed path
    probes = synthetic_repo_files(spark, 30_000, num_partitions=4, seed=999)
    neg = sharded.contains(probes.select("key"))
    fpr = neg.filter(F.col("member")).count() / 30_000
    assert fpr <= 2.5 * CFG.theoretical_fpr(0.95)


def test_sharded_delete_then_query(spark, repo_df):
    sharded = ShardedCuckooFilter.build(repo_df, "key", CAPACITY, 8, CFG).persist()
    evens = repo_df.filter(F.pmod(F.col("key"), 2) == 0).select("key").persist()
    odds = repo_df.filter(F.pmod(F.col("key"), 2) != 0).select("key").persist()
    n_even, n_odd = evens.count(), odds.count()

    results, updated = sharded.delete(evens)
    # regression (ADVICE r1): shard geometry is unchanged by deletes,
    # so the packed JVM fast path must survive the functional update
    assert updated.shard_num_buckets == sharded.shard_num_buckets is not None
    assert results.filter(F.col("ok")).count() == n_even
    # all remaining keys still found (zero false negatives survive delete)
    still = updated.contains(odds)
    assert still.filter(F.col("member")).count() == n_odd
    # occupancy dropped exactly
    assert updated.total_occupied() == n_odd
    # deleting the same keys again: (almost) none left — false
    # positives against remaining fingerprints may delete a few
    again, _ = updated.delete(evens)
    assert again.filter(F.col("ok")).count() <= int(0.01 * n_even) + 5


def test_contains_broadcast_matches_routed(spark, repo_df):
    """The stacked-broadcast probe path must agree bit-for-bit with
    the shuffle-routed path (same shards, same probes)."""
    sharded = ShardedCuckooFilter.build(repo_df, "key", CAPACITY, 8, CFG).persist()
    probes = (
        repo_df.select("key")
        .unionByName(
            synthetic_repo_files(spark, 10_000, num_partitions=4, seed=555)
            .select("key")
        )
        .persist()
    )
    routed = sharded.contains(probes).withColumnRenamed("member", "a")
    bcast = sharded.contains_broadcast(probes).withColumnRenamed("member", "b")
    diff = routed.join(bcast, "key").filter(F.col("a") != F.col("b")).count()
    assert diff == 0
    assert bcast.filter(F.col("b")).count() >= N_ROWS  # zero FN


def test_merge_associativity_spark(spark, repo_df):
    """north_rule gate: per-partition shards merged in random orders
    give identical membership answers (FIXTURES.md §4)."""
    import pandas as pd

    def partial(iterator):
        flt = CuckooFilter(CAPACITY, CFG)
        got = False
        for pdf in iterator:
            got = True
            flt.insert_many(keys_to_unsigned(pdf["key"].to_numpy(np.int64)))
        if got:
            yield pd.DataFrame({"blob": [flt.to_bytes()]})

    blobs = [
        r.blob
        for r in repo_df.select("key").repartition(16, "key")
        .mapInPandas(partial, "blob binary").collect()
    ]
    assert len(blobs) == 16
    probe_rows = repo_df.select("key").limit(2000).collect()
    probes = keys_to_unsigned(np.array([r.key for r in probe_rows], dtype=np.int64))
    rng = np.random.default_rng(42)
    ref = None
    for _ in range(5):
        order = rng.permutation(16)
        merged = CuckooFilter.merge_blobs([blobs[i] for i in order])
        assert merged.failures == 0
        ans = merged.contains_many(probes)
        assert ans.all()  # all probes were inserted
        if ref is None:
            ref = ans
        assert (ans == ref).all()


def test_skewed_input_build(spark, repo_df):
    """~30% of rows share one repo (Zipf fixture). Building from a
    repo-partitioned (maximally skewed) layout must still balance:
    shard routing is by key hash, so shard row counts stay within
    2x of each other (FIXTURES.md skewed_partitions)."""
    skewed = repo_df.repartition(8, "repo")
    sharded = ShardedCuckooFilter.build(skewed, "key", CAPACITY, 8, CFG)
    rows = [r["rows"] for r in sharded.shards.select("rows").collect()]
    assert max(rows) <= 2 * min(rows)
    assert sum(rows) == N_ROWS


def test_documents_view_keys(spark):
    df = repo_files_from_documents(spark, "/root/testdata/sf0.001")
    rows = df.select("content", "key").limit(20).collect()
    for r in rows:
        expect = key_from_content(r.content)
        signed = expect - (1 << 64) if expect >= 1 << 63 else expect
        assert r.key == signed


def test_merged_build_empty_input(spark):
    filt = DistributedCuckooFilter.build(
        spark.createDataFrame([], "key long"), "key", 4096, CFG
    )
    assert filt.filter.occupied == 0
    import numpy as np

    assert not filt.filter.contains_many(
        np.arange(1, 100, dtype=np.uint64)
    ).any()


def test_delete_broadcast_matches_routed(spark, repo_df):
    """delete_broadcast (zero-sort, broadcast state) must agree with
    the cogroup-routed delete: same per-key outcomes, same surviving
    membership, untouched shards pass through with metrics intact."""
    sharded = ShardedCuckooFilter.build(repo_df, "key", CAPACITY, 8, CFG).persist()
    # delete only keys of ~half the shards so some shards are untouched
    evens = repo_df.filter(F.pmod(F.xxhash64("key"), 4) == 0).select("key")
    n_even = evens.count()
    odds = repo_df.join(evens, "key", "left_anti").select("key")

    r1, f1 = sharded.delete(evens)
    r2, f2 = sharded.delete_broadcast(evens)
    assert f2.shard_num_buckets == sharded.shard_num_buckets
    ok1 = {(r.key, r.ok) for r in r1.collect()}
    ok2 = {(r.key, r.ok) for r in r2.collect()}
    assert ok1 == ok2 and len(ok2) == n_even
    assert f1.total_occupied() == f2.total_occupied()
    m2 = f2.metrics().collect()[0]
    assert m2["num_shards"] == 8 and m2["rows"] == repo_df.count()
    # surviving keys all still found through the new filter
    still = f2.contains(odds)
    assert still.filter(~F.col("member")).count() == 0
    f1.release()
    f2.release()


def test_delete_scalar_mode(spark, repo_df):
    """per_key=False must produce the same new filter and success
    count as the default mode, without per-key result columns (the
    reference's deleteMany contract: scalar return, outcomes stay in
    kernel memory — benchmark_common.cuh:287)."""
    sharded = ShardedCuckooFilter.build(repo_df, "key", CAPACITY, 8, CFG).persist()
    n = repo_df.count()
    res_none, f2 = sharded.delete(repo_df, per_key=False)
    assert res_none is None
    assert f2.delete_success_count() == n
    assert f2.total_occupied() == 0
    assert "del_keys" not in f2._delete_src.columns
    r1, f1 = sharded.delete(repo_df)
    assert f1.delete_success_count() == n
    assert r1.filter(F.col("ok")).count() == n
    f1.release()
    f2.release()


def test_delete_broadcast_state_cached(spark, repo_df):
    """Two delete_broadcast calls against the SAME filter snapshot
    reuse one collected+broadcast state (regression: every call
    re-collected and re-broadcast the full shard state)."""
    sharded = ShardedCuckooFilter.build(repo_df, "key", CAPACITY, 8, CFG).persist()
    evens = repo_df.filter(F.pmod(F.xxhash64("key"), 4) == 0).select("key")
    odds = repo_df.filter(F.pmod(F.xxhash64("key"), 4) == 1).select("key")
    r1, f1 = sharded.delete_broadcast(evens)
    state_after_first = sharded._del_state
    assert state_after_first is not None
    r2, f2 = sharded.delete_broadcast(odds)
    assert sharded._del_state is state_after_first  # no re-broadcast
    assert r1.count() == evens.count() and r2.count() == odds.count()
    sharded.release()
    assert sharded._del_state is None


def test_sharded_counts_exact(spark, repo_df):
    """GQF-parity counting query: inserting each key 1-3 times gives
    exact multiplicities through the routed counts() lane, and a
    multiset delete decrements them (32-bit tags -> collision odds
    ~1e-9, so the comparison is exact in practice)."""
    cfg32 = CuckooConfig(bits_per_tag=32, bucket_size=4)
    some = repo_df.select("key").limit(3000)
    dup = some.limit(1200)
    trip = some.limit(400)
    stream = some.unionByName(dup).unionByName(trip)
    filt = ShardedCuckooFilter.build(
        stream, "key", CAPACITY, 8, cfg32
    ).persist()
    got = {r.key: r.cnt for r in filt.counts(some, "cnt").collect()}
    keys = [r.key for r in some.collect()]
    dup_keys = set(r.key for r in dup.collect())
    trip_keys = set(r.key for r in trip.collect())
    for k in keys:
        want = 1 + (k in dup_keys) + (k in trip_keys)
        assert got[k] == want, k
    _, after = filt.delete(dup, per_key=False)
    got2 = {r.key: r.cnt for r in after.counts(dup, "cnt").collect()}
    for k in dup_keys:
        assert got2[k] == got[k] - 1, k


def test_broadcast_guard_raises_and_falls_back(spark, repo_df):
    """VERDICT r3 task 4: an oversized filter must not be silently
    collected+broadcast. raise mode errors; fallback mode warns and
    answers identically through the routed lane."""
    import warnings

    sharded = ShardedCuckooFilter.build(
        repo_df, "key", CAPACITY, 8, CFG
    ).persist()
    probes = repo_df.select("key").limit(500)
    want = {r.key: r.member for r in sharded.contains(probes).collect()}

    object.__setattr__(sharded, "max_broadcast_bytes", 1024)  # force trip
    object.__setattr__(sharded, "on_oversize_broadcast", "raise")
    with pytest.raises(ValueError, match="broadcast guard"):
        sharded.contains_broadcast(probes)
    with pytest.raises(ValueError, match="broadcast guard"):
        sharded.contains_sql(probes)
    with pytest.raises(ValueError, match="broadcast guard"):
        sharded.delete_broadcast(probes)

    object.__setattr__(sharded, "on_oversize_broadcast", "fallback")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {
            r.key: r.member
            for r in sharded.contains_broadcast(probes).collect()
        }
        assert any("broadcast guard" in str(x.message) for x in w)
    assert got == want
    res, _ = sharded.delete_broadcast(probes.limit(50))
    assert res.filter(F.col("ok")).count() == 50


def test_routed_chunked_output_rows(spark, repo_df, monkeypatch):
    """At genome scale one list row per shard becomes a multi-
    megaword JVM allocation; the routed lane must chunk its output
    rows (ROUTED_CHUNK_ROWS) without changing the exploded relation.
    Shrink the cap so every shard spans several chunks."""
    from cuckoo_filter_spark.operators import membership as mem

    monkeypatch.setattr(mem, "ROUTED_CHUNK_ROWS", 257)
    sharded = ShardedCuckooFilter.build(repo_df, "key", CAPACITY, 4, CFG)
    probes = repo_df.select("key")
    res = sharded.contains(probes)
    # one output row per probe key, all members (zero FN)
    assert res.count() == N_ROWS
    assert res.filter(~F.col("member")).count() == 0

    # ADVICE r4: aggregate counts can hide a chunking bug that
    # mis-keys rows or swaps an equal number of FP/FN answers —
    # assert PER-KEY agreement with the broadcast lane over a mixed
    # positive/negative probe set (negatives from a disjoint seed)
    mixed = probes.unionByName(
        synthetic_repo_files(
            repo_df.sparkSession, 5_000, num_partitions=4, seed=4242
        ).select("key")
    ).distinct()
    routed = sharded.contains(mixed).select("key", "member")
    bcast = sharded.contains_broadcast(mixed, "key").select("key", "member")
    assert routed.exceptAll(bcast).count() == 0
    assert bcast.exceptAll(routed).count() == 0
