"""JVM↔numpy parity of the chained hash family and the pure-SQL
membership probe (filter-as-broadcast-dimension + codegen bit math).

The whole design rests on bit-exactness between
``hashing.chained_hash`` (numpy) and ``F.xxhash64(col, lit(salt))``
(JVM), so these tests are the contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.config import DISP_SALT, FP_SALT, CuckooConfig
from cuckoo_filter_spark.core.cuckoo import CuckooFilter
from cuckoo_filter_spark.hashing import (
    candidate_exprs, chained_hash, chained_hash_expr, chained_hash_scalar,
    keys_to_unsigned,
)
from cuckoo_filter_spark.operators.membership import (
    DistributedCuckooFilter, ShardedCuckooFilter,
)

CFG = CuckooConfig(bits_per_tag=16, bucket_size=4)


@pytest.fixture(scope="module")
def keys_df(spark):
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, 4096, dtype=np.int64)
    return spark.createDataFrame(
        [(int(k),) for k in keys], "key long"
    ), keys


def test_chained_hash_jvm_parity(spark, keys_df):
    df, keys = keys_df
    for salt in (FP_SALT, DISP_SALT, 12345):
        got = np.array(
            [r.h for r in df.select(
                chained_hash_expr(F.col("key"), salt).alias("h")
            ).collect()],
            dtype=np.int64,
        )
        # rows may come back in order (single partition createDataFrame)
        want = chained_hash(keys_to_unsigned(keys), salt).view(np.int64)
        assert np.array_equal(np.sort(got), np.sort(want))


def test_chained_hash_scalar_matches_vector():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**64, 64, dtype=np.uint64)
    vec = chained_hash(keys, DISP_SALT)
    for k, v in zip(keys, vec):
        assert chained_hash_scalar(int(k), DISP_SALT) == int(v)


def test_candidate_exprs_match_kernel(spark, keys_df):
    df, keys = keys_df
    flt = CuckooFilter(4096, CFG)
    i1n, i2n, fpn = flt.candidates(keys_to_unsigned(keys))
    fp, i1, i2 = candidate_exprs("key", flt.num_buckets, CFG.bits_per_tag)
    rows = df.select(
        "key", fp.alias("fp"), i1.alias("i1"), i2.alias("i2")
    ).collect()
    by_key = {r.key: (r.fp, r.i1, r.i2) for r in rows}
    for k, a, b, c in zip(keys, fpn, i1n, i2n):
        assert by_key[int(k)] == (int(a), int(b), int(c))


def test_contains_sql_merged(spark, keys_df):
    df, keys = keys_df
    filt = DistributedCuckooFilter.build(df, "key", 6000, CFG)
    out = filt.contains_sql(df, "key")
    assert out.filter(~F.col("member")).count() == 0  # zero false negatives
    # parity with the pandas-UDF broadcast path on mixed probes
    probes = df.unionByName(
        spark.range(4096).select((F.col("id") + 2**40).alias("key"))
    )
    sql_res = {r.key: r.member for r in filt.contains_sql(probes, "key").collect()}
    udf_res = {r.key: r.member for r in filt.contains(probes, "key").collect()}
    assert sql_res == udf_res


def test_packed_build_matches_key_build(spark, keys_df):
    df, keys = keys_df
    a = ShardedCuckooFilter.build(df, "key", 6000, 8, CFG, jvm_pack=True)
    b = ShardedCuckooFilter.build(df, "key", 6000, 8, CFG, jvm_pack=False)
    blobs_a = {r.shard_id: (bytes(r.blob), r.rows, r.inserted)
               for r in a.shards.collect()}
    blobs_b = {r.shard_id: (bytes(r.blob), r.rows, r.inserted)
               for r in b.shards.collect()}
    assert blobs_a == blobs_b  # bit-identical filters


def test_contains_sql_sharded(spark, keys_df):
    df, keys = keys_df
    sh = ShardedCuckooFilter.build(df, "key", 6000, 8, CFG).persist()
    probes = df.unionByName(
        spark.range(4096).select((F.col("id") + 2**41).alias("key"))
    )
    sql_res = {r.key: r.member for r in sh.contains_sql(probes).collect()}
    bc_res = {
        r.key: r.member for r in sh.contains_broadcast(probes, "key").collect()
    }
    assert sql_res == bc_res
    assert all(sql_res[int(k)] for k in keys)  # zero false negatives


def test_bucketed_build_matches(spark, keys_df, tmp_path):
    df, keys = keys_df
    path = str(tmp_path / "bucketed")
    ShardedCuckooFilter.write_bucketed_keys(df, "key", 6000, 8, path, CFG)
    bucketed = spark.read.parquet(path)
    a = ShardedCuckooFilter.build_bucketed(bucketed, 6000, 8, CFG)
    b = ShardedCuckooFilter.build(df, "key", 6000, 8, CFG)
    blobs_a = {r.shard_id: bytes(r.blob) for r in a.shards.collect()}
    blobs_b = {r.shard_id: bytes(r.blob) for r in b.shards.collect()}
    assert set(blobs_a) == set(blobs_b)
    # same keys per shard -> same occupancy; layout may differ with
    # input order, so compare membership, not bytes
    out = a.contains_broadcast(df, "key")
    assert out.filter(~F.col("member")).count() == 0


def test_read_bucketed_keys_split_parallelism(spark, keys_df, tmp_path):
    """A small-file bucketed table must scan with ~one split per
    file, not the 2-3 splits the default 128 MB maxPartitionBytes +
    4 MB openCostInBytes would coalesce it into — build_bucketed's
    placement parallelism IS the split count (no Exchange)."""
    df, keys = keys_df
    path = str(tmp_path / "bucketed_split")
    ShardedCuckooFilter.write_bucketed_keys(df, "key", 6000, 8, path, CFG)
    n_files = len(
        [p for p in __import__("os").listdir(path) if p.endswith(".parquet")]
    )
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        bucketed = ShardedCuckooFilter.read_bucketed_keys(
            spark, path, target_splits=64
        )
        got = bucketed.rdd.getNumPartitions()
        assert got >= min(n_files, 64), (got, n_files)
        # the filter built from the matched-split read is unchanged
        a = ShardedCuckooFilter.build_bucketed(bucketed, 6000, 8, CFG)
        out = a.contains_broadcast(df, "key")
        assert out.filter(~F.col("member")).count() == 0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_open)


ADDSUB_CFG = CuckooConfig(bits_per_tag=16, bucket_size=4,
                          bucket_policy="addsub")


def test_packed_build_matches_key_build_addsub(spark, keys_df):
    """AddSub policy through the JVM-packed lane: i1 = low-32 %
    (nb/2) in codegen (bucket_policies.cuh:126-143), alt bucket
    resolved numpy-side — bit-identical to the key-shipping build."""
    df, keys = keys_df
    a = ShardedCuckooFilter.build(df, "key", 6000, 8, ADDSUB_CFG,
                                  jvm_pack=True)
    b = ShardedCuckooFilter.build(df, "key", 6000, 8, ADDSUB_CFG,
                                  jvm_pack=False)
    blobs_a = {r.shard_id: (bytes(r.blob), r.rows, r.inserted)
               for r in a.shards.collect()}
    blobs_b = {r.shard_id: (bytes(r.blob), r.rows, r.inserted)
               for r in b.shards.collect()}
    assert blobs_a == blobs_b
    # the packed lane is actually enabled for routed ops
    assert a.shard_num_buckets is not None


def test_addsub_routed_contains_delete_packed_lane(spark, keys_df):
    df, keys = keys_df
    sh = ShardedCuckooFilter.build(df, "key", 6000, 8, ADDSUB_CFG).persist()
    probes = df.unionByName(
        spark.range(4096).select((F.col("id") + 2**43).alias("key"))
    )
    res = {r.key: r.member for r in sh.contains(probes).collect()}
    assert all(res[int(k)] for k in keys)  # zero false negatives
    # delete half, requery: survivors all present (zero false
    # negatives is the invariant; deleted keys may still FP)
    half = spark.createDataFrame(
        [(int(k),) for k in keys[: len(keys) // 2]], "key long"
    )
    outcomes, sh2 = sh.delete(half, per_key=True)
    assert outcomes.filter(~F.col("ok")).count() == 0
    after = {r.key: r.member for r in sh2.contains(df).collect()}
    kept = keys[len(keys) // 2:]
    assert all(after[int(k)] for k in kept)


def test_contains_sql_addsub_parity(spark, keys_df):
    """AddSub addressing fully in codegen: unsigned-64 displacement
    via hi/lo split, add/cross vs subtract/return blocks — parity
    with the numpy broadcast probe on mixed positives/negatives."""
    df, keys = keys_df
    filt = DistributedCuckooFilter.build(df, "key", 6000, ADDSUB_CFG)
    probes = df.unionByName(
        spark.range(4096).select((F.col("id") + 2**44).alias("key"))
    )
    sql_res = {r.key: r.member
               for r in filt.contains_sql(probes, "key").collect()}
    udf_res = {r.key: r.member
               for r in filt.contains(probes, "key").collect()}
    assert sql_res == udf_res
    assert all(sql_res[int(k)] for k in keys)

    sh = ShardedCuckooFilter.build(df, "key", 6000, 8, ADDSUB_CFG).persist()
    sh_sql = {r.key: r.member for r in sh.contains_sql(probes).collect()}
    sh_routed = {r.key: r.member for r in sh.contains(probes).collect()}
    assert sh_sql == sh_routed
    assert all(sh_sql[int(k)] for k in keys)


def test_bucketed_layout_sidecar_validation(spark, keys_df, tmp_path):
    """ADVICE r3: the packed layout is only decodable with write-time
    parameters. The sidecar must validate (matching params pass,
    mismatched capacity/num_shards/config raise) instead of silently
    mis-extracting shard ids and tags."""
    df, keys = keys_df
    path = str(tmp_path / "bucketed_sidecar")
    ShardedCuckooFilter.write_bucketed_keys(df, "key", 6000, 8, path, CFG)
    assert (tmp_path / "bucketed_sidecar" / "_cuckoo_layout.json").exists()
    bucketed = spark.read.parquet(path)
    ok = ShardedCuckooFilter.build_bucketed(
        bucketed, 6000, 8, CFG, path=path
    )
    assert ok.metrics().collect()[0]["failures"] == 0
    with pytest.raises(ValueError, match="layout mismatch"):
        ShardedCuckooFilter.build_bucketed(bucketed, 6000, 16, CFG, path=path)
    with pytest.raises(ValueError, match="layout mismatch"):
        ShardedCuckooFilter.build_bucketed(
            bucketed, 200_000, 8, CFG, path=path
        )
    from cuckoo_filter_spark.config import CuckooConfig as _CC
    with pytest.raises(ValueError, match="layout mismatch"):
        ShardedCuckooFilter.build_bucketed(
            bucketed, 6000, 8, _CC(bits_per_tag=8, bucket_size=8), path=path
        )
