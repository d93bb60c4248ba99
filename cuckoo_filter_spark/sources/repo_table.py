"""Deterministic synthetic Iceberg-shaped source-code table.

The driver-specified input shape (BASELINE.json input_hint) is
``(repo:string, path:string, commit:string, lang:string,
content:string)``. Two constructors:

* :func:`synthetic_repo_files` — generated fully JVM-side from
  ``spark.range`` (seeded by row id, no Python in the loop), with
  Zipf-ish skew on repo/lang so skew-handling tests exercise real
  hot keys (FIXTURES.md §1).
* :func:`repo_files_from_documents` — derives the same shape
  deterministically from the driver's ``documents`` parquet table
  so that correctness oracles can reproduce it in DuckDB SQL
  (TESTDATA.md).

Both attach the derived ``key`` column — int64 view of
uint64(first 16 hex chars of sha256(content)) — computed with
``F.sha2`` JVM-side (per-row invariant vs the reference:
content sha256 equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuckoo_filter_spark.hashing import content_key_expr

#: languages with skewed weights out of 16 (python+java ≈ 56%)
_LANGS = (
    "python python python python python java java java c cpp go rust js js ts other"
).split()


def synthetic_repo_files(
    spark: SparkSession, n_rows: int, num_partitions: int = 32, seed: int = 42
) -> DataFrame:
    """n_rows synthetic files; content unique per row id (so the key
    column is unique). Entirely whole-stage-codegen'd: range → hash
    arithmetic → concat, no shuffle, no Python."""
    df = spark.range(0, n_rows, 1, num_partitions)
    # mix the row id so modulo-derived attributes aren't aligned
    mixed = F.xxhash64(F.col("id"), F.lit(seed))
    # Zipf-ish repo skew: ~30% of rows land in repo 0 (FIXTURES.md:
    # skewed_partitions fixture), remainder spread over ~700 repos
    bucket = F.pmod(mixed, F.lit(1000))
    repo_id = F.when(bucket < 300, F.lit(0)).otherwise(F.pmod(bucket, F.lit(701)))
    lang_idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(16))
    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (lang_idx + 1).cast("int"))
    content = F.concat(
        F.lit("file-"), F.col("id"), F.lit("-"),
        F.sha2(F.concat(F.lit(f"seed{seed}-"), F.col("id")), 256),
    )
    return (
        df.withColumn("repo", F.concat(F.lit("org"), F.pmod(repo_id, F.lit(7)),
                                       F.lit("/repo"), repo_id))
        .withColumn("path", F.concat(F.lit("src/m"), F.pmod(mixed, F.lit(97)),
                                     F.lit("/f"), F.col("id"), F.lit("."), lang))
        .withColumn("commit", F.sha2(F.concat(F.lit("c"), F.col("id")), 256).substr(1, 40))
        .withColumn("lang", lang)
        .withColumn("content", content)
        .withColumn("key", content_key_expr(content))
        .drop("id")
    )


def repo_files_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-shaped view over the driver's documents table —
    deterministic and reproducible in DuckDB for oracles."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("org"), F.pmod(F.col("doc_id"), F.lit(7)),
                 F.lit("/repo"), F.pmod(F.col("doc_id"), F.lit(101))).alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.substring(F.sha2(F.concat(F.lit("c"), F.col("doc_id")), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        content_key_expr(F.col("text")).alias("key"),
        F.col("doc_id"),
    )


def write_partitioned_repo_table(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("lang",)
) -> None:
    """Persist the repo table hive-partitioned (default by ``lang``)
    — the Iceberg-style identity-partitioned layout. Reads that
    filter on a partition column then prune at plan time (the scan's
    ``PartitionFilters``), so a per-language pass over a 100 TB
    corpus touches only that language's files; see
    tests/test_partition_pruning.py for the executed-plan assertion."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def read_repo_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a (possibly partitioned) repo table written by
    :func:`write_partitioned_repo_table`."""
    return spark.read.parquet(path)
