"""Checkpoint/lineage/resume tests (FIXTURES.md §4
checkpoint_resume; north_rule resumability gate)."""

import json

import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.config import CuckooConfig
from cuckoo_filter_spark.operators.membership import ShardedCuckooFilter
from cuckoo_filter_spark.plans.checkpoint import (
    build_resumable, read_checkpoint, write_checkpoint,
)
from cuckoo_filter_spark.sources.repo_table import synthetic_repo_files

CFG = CuckooConfig(16, 4)
N = 12_000
CAP = 16_384
S = 8


@pytest.fixture(scope="module")
def repo_df(spark):
    df = synthetic_repo_files(spark, N, num_partitions=8).persist()
    df.count()
    return df


def test_checkpoint_roundtrip(spark, repo_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "filter")
    filt = ShardedCuckooFilter.build(repo_df, "key", CAP, S, CFG)
    write_checkpoint(filt, path, input_desc="repo_files/N=12000")
    shards, lineage = read_checkpoint(spark, path)
    assert lineage["num_shards"] == S
    assert lineage["bucket_size"] == 4
    assert shards.count() == S
    restored = ShardedCuckooFilter(shards, S, CFG)
    out = restored.contains(repo_df.select("key"))
    assert out.filter(F.col("member")).count() == N


def test_resume_skips_completed_shards(spark, repo_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "resume")
    # uninterrupted build as the semantic reference
    full = build_resumable(spark, repo_df, "key", CAP, S, path + "_full",
                           CFG, input_desc="x")
    # simulate an interrupted run: checkpoint containing only 5 shards
    partial = ShardedCuckooFilter(
        full.shards.filter(F.col("shard_id") < 5), S, CFG
    )
    write_checkpoint(partial, path, input_desc="x")
    resumed = build_resumable(spark, repo_df, "key", CAP, S, path, CFG,
                              input_desc="x")
    assert resumed.shards.count() == S
    # lineage check: completed shard blobs were reused byte-identically
    orig = {r.shard_id: bytes(r.blob) for r in full.shards.collect()
            if r.shard_id < 5}
    new = {r.shard_id: bytes(r.blob) for r in resumed.shards.collect()
           if r.shard_id < 5}
    assert orig == new
    # semantic equality with the uninterrupted build
    probes = synthetic_repo_files(spark, 20_000, num_partitions=4, seed=31)
    a = full.contains(probes.select("key")).withColumnRenamed("member", "a")
    b = resumed.contains(probes.select("key")).withColumnRenamed("member", "b")
    diff = a.join(b, "key").filter(F.col("a") != F.col("b")).count()
    assert diff == 0
    # and zero false negatives on the actual inserted set
    ins = resumed.contains(repo_df.select("key"))
    assert ins.filter(F.col("member")).count() == N


def test_lineage_mismatch_forces_full_rebuild(spark, repo_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "mismatch")
    filt = ShardedCuckooFilter.build(repo_df, "key", CAP, S, CFG)
    write_checkpoint(filt, path, input_desc="OLD-INPUT")
    # different input_desc → checkpoint must be ignored, not reused
    rebuilt = build_resumable(spark, repo_df, "key", CAP, S, path, CFG,
                              input_desc="NEW-INPUT")
    _, lineage = read_checkpoint(spark, path)
    assert lineage["input"] == "NEW-INPUT"
    assert rebuilt.total_occupied() == N
