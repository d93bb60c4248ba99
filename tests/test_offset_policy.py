"""OffsetAltBucketPolicy parity (bucket_policies.cuh:190-351):
choice-bit fingerprints, exact (non-pow2) bucket counts, symmetric
forward/backward displacement."""

import numpy as np
import pytest

from cuckoo_filter_spark.core.offset import OffsetCuckooFilter


def _keys(n, seed=42):
    return np.random.default_rng(seed).integers(
        1, 2**63, n, dtype=np.int64
    ).view(np.uint64)


def test_non_pow2_bucket_count():
    f = OffsetCuckooFilter(10_000, bucket_size=4)
    assert f.num_buckets == 2500  # exact ceil, not rounded to 4096


def test_zero_false_negatives_and_fpr():
    keys = _keys(50_000)
    flt = OffsetCuckooFilter(70_000)
    s = flt.insert_many(keys)
    assert s.mean() > 0.999
    assert flt.contains_many(keys)[s].all()
    neg = _keys(50_000, seed=9) | np.uint64(1 << 63)
    fpr = flt.contains_many(neg).mean()
    # epsilon = 2 b alpha / 2^(f-1) (choice bit costs one fp bit)
    alpha = flt.load_factor()
    eps = 2 * flt.bucket_size * alpha / (1 << (flt.bits_per_tag - 1))
    assert fpr <= 3 * eps + 1e-3


def test_alternate_is_involution():
    flt = OffsetCuckooFilter(1000)
    rng = np.random.default_rng(1)
    for _ in range(200):
        b = int(rng.integers(0, flt.num_buckets))
        tag = int(rng.integers(1, flt._choice_bit))  # choice=0 tag
        b2, t2 = flt.alternate(b, tag)
        b3, t3 = flt.alternate(b2, t2)
        assert (b3, t3) == (b, tag)  # back where we started
        assert t2 == tag | flt._choice_bit  # choice bit flipped


def test_high_load_insert_with_kicks():
    flt = OffsetCuckooFilter(20_000)
    n = int(flt.num_buckets * flt.bucket_size * 0.95)
    keys = _keys(n, seed=5)
    s = flt.insert_many(keys)
    assert s.mean() >= 0.99  # >=99% at 0.95 load (test_cuckoo_filter.cu:135)
    # every successful insert must still be found after kick chains
    assert flt.contains_many(keys)[s].all()
    assert flt.kicks > 0  # chains actually exercised


def test_delete_semantics():
    keys = _keys(10_000, seed=3)
    flt = OffsetCuckooFilter(16_000)
    flt.insert_many(keys)
    evens = keys[::2]
    odds = keys[1::2]
    ok = flt.delete_many(evens)
    assert ok.all()
    assert flt.contains_many(odds).all()
    assert flt.delete_many(_keys(100, seed=77) | np.uint64(1 << 63)).sum() == 0
    assert flt.occupied == len(odds)


def test_offset_parameter_guards():
    """Regression (ADVICE r1): wide tags would eagerly allocate a
    2^(f-1)-entry offset table (~17 GB at f=32) and big buckets
    overflow the int8 fill vector — both must be rejected."""
    import pytest

    from cuckoo_filter_spark.core.offset import OffsetCuckooFilter

    with pytest.raises(ValueError, match="bits_per_tag"):
        OffsetCuckooFilter(1024, bits_per_tag=32)
    with pytest.raises(ValueError, match="bucket_size"):
        OffsetCuckooFilter(1024, bucket_size=128)


def test_offset_serialization_roundtrip():
    flt = OffsetCuckooFilter(20_000)
    keys = _keys(12_000)
    flt.insert_many(keys)
    back = OffsetCuckooFilter.from_bytes(flt.to_bytes())
    assert back.occupied == flt.occupied
    assert np.array_equal(back.buckets, flt.buckets)
    assert (back.contains_many(keys) == flt.contains_many(keys)).all()
    import pytest

    blob = flt.to_bytes()
    stale = blob[:4] + bytes([1]) + blob[5:]
    with pytest.raises(ValueError, match="version"):
        OffsetCuckooFilter.from_bytes(stale)


def test_sharded_offset_filter_spark(spark):
    """Distributed offset-policy path: sharded build + routed
    contains with zero false negatives and bounded FPR."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.membership import ShardedOffsetFilter

    keys = _keys(20_000).view(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"key": keys}))
    filt = ShardedOffsetFilter.build(df, "key", 30_000, 8)
    m = filt.metrics().collect()[0]
    assert m["num_shards"] == 8 and m["failures"] == 0
    assert m["occupied"] == len(set(keys.tolist()))
    pos = filt.contains(df.select("key"))
    assert pos.filter(~F.col("member")).count() == 0
    neg_keys = (_keys(20_000, seed=3) | np.uint64(1 << 63)).view(np.int64)
    neg = spark.createDataFrame(pd.DataFrame({"key": neg_keys}))
    fpr = filt.contains(neg).filter(F.col("member")).count() / 20_000
    assert fpr <= 2.5 * (2 * 4 * 1.0 / (1 << 15))


def test_sharded_offset_contains_broadcast(spark):
    """Zero-shuffle broadcast probe parity: same answers as the
    shard-routed contains on positives (no FN) and negatives (same
    FP set — identical filters, identical probes)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.membership import ShardedOffsetFilter

    keys = _keys(20_000).view(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"key": keys}))
    filt = ShardedOffsetFilter.build(df, "key", 30_000, 8)
    filt.shards.persist().count()
    pos = filt.contains_broadcast(df.select("key"))
    assert pos.filter(~F.col("member")).count() == 0
    neg_keys = (_keys(20_000, seed=3) | np.uint64(1 << 63)).view(np.int64)
    neg = spark.createDataFrame(pd.DataFrame({"key": neg_keys}))
    bc_hits = {
        r.key for r in
        filt.contains_broadcast(neg).filter(F.col("member")).collect()
    }
    routed_hits = {
        r.key for r in filt.contains(neg).filter(F.col("member")).collect()
    }
    assert bc_hits == routed_hits
    filt.shards.unpersist()


def test_sharded_offset_broadcast_guard(spark):
    """VERDICT r4 task 1: guard parity with ShardedCuckooFilter —
    an oversized offset filter must not be silently collected and
    broadcast. raise mode errors; fallback mode warns and answers
    bit-identically through the routed lane (per-key join, not just
    aggregate counts)."""
    import warnings

    import pandas as pd
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.membership import ShardedOffsetFilter

    keys = _keys(20_000).view(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"key": keys}))
    filt = ShardedOffsetFilter.build(df, "key", 30_000, 8)
    probes = df.select("key").distinct()
    routed = filt.contains(probes, "routed").persist()

    object.__setattr__(filt, "max_broadcast_bytes", 1024)  # force trip
    object.__setattr__(filt, "on_oversize_broadcast", "raise")
    with pytest.raises(ValueError, match="broadcast guard"):
        filt.contains_broadcast(probes).collect()

    object.__setattr__(filt, "on_oversize_broadcast", "fallback")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fell_back = filt.contains_broadcast(probes).persist()
        fell_back.count()
        assert any("broadcast guard" in str(x.message) for x in w)
    # per-key agreement: zero mismatched (key, member) rows either way
    mism = (
        fell_back.join(routed, "key")
        .filter(F.col("member") != F.col("routed"))
        .count()
    )
    assert mism == 0
    assert fell_back.count() == routed.count()

    # an in-budget filter still takes the true broadcast lane
    object.__setattr__(filt, "max_broadcast_bytes", 512 << 20)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bc = filt.contains_broadcast(probes)
        assert bc.filter(~F.col("member")).count() == 0
        assert not any("broadcast guard" in str(x.message) for x in w)
    fell_back.unpersist()
    routed.unpersist()
    filt.shards.unpersist()


def test_sharded_offset_delete(spark):
    """delete-then-requery parity for the distributed Offset path:
    deleted keys vanish, survivors all remain (reference deleteMany
    over OffsetAltBucketPolicy, bucket_policies.cuh:190-351)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.membership import ShardedOffsetFilter

    keys = np.unique(_keys(20_000)).view(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"key": keys}))
    built = ShardedOffsetFilter.build(df, "key", 30_000, 8)
    sharded = ShardedOffsetFilter(
        built.shards.persist(), built.num_shards, built.key_col
    )
    n = len(keys)
    evens = df.filter(F.pmod(F.col("key"), 2) == 0).select("key")
    odds = df.join(evens, "key", "left_anti").select("key")
    n_even = evens.count()

    res, newf = sharded.delete(evens)
    assert res.filter(F.col("ok")).count() == n_even
    m = newf.metrics().collect()[0]
    assert m["occupied"] == n - n_even
    # deleted keys (almost) all gone — residual hits are FPs only —
    # and every survivor still found (zero false negatives)
    gone = newf.contains(evens)
    assert gone.filter(F.col("member")).count() <= int(0.01 * n_even) + 5
    still = newf.contains(odds)
    assert still.filter(~F.col("member")).count() == 0


def test_sharded_offset_delete_count_and_release(spark):
    """The delete's scalar n_ok aggregate is readable and the
    persisted delete plan is releasable (regression: every delete
    leaked a cached DataFrame with no way to free it)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.membership import ShardedOffsetFilter

    keys = np.unique(_keys(5_000)).view(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"key": keys}))
    sharded = ShardedOffsetFilter.build(df, "key", 8_000, 4)
    evens = df.filter(F.pmod(F.col("key"), 2) == 0).select("key")
    _res, newf = sharded.delete(evens)
    assert newf.delete_success_count() == evens.count()
    assert newf._delete_src is not None
    newf.release()
    assert newf._delete_src is None
    with pytest.raises(ValueError):
        newf.delete_success_count()
