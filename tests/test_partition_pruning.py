"""Partition pruning over the Iceberg-shaped repo table: a filter on
the partition column must become a plan-time PartitionFilter (only
that language's files are listed/scanned), not a post-scan Filter —
the property that makes per-language passes over a 100 TB corpus
touch 1/16th of the data."""

import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.sources.repo_table import (
    read_repo_table,
    synthetic_repo_files,
    write_partitioned_repo_table,
)

pytestmark = pytest.mark.usefixtures("spark")


def test_lang_filter_prunes_partitions(spark, tmp_path):
    df = synthetic_repo_files(spark, 5000, num_partitions=4)
    path = str(tmp_path / "repo_files")
    write_partitioned_repo_table(df, path)

    rt = read_repo_table(spark, path).filter(F.col("lang") == "go")
    plan = rt._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the lang predicate rides the partition filter, and nothing
    # pushes it as a (post-listing) data filter
    pf = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "lang" in pf
    # ADVICE r4: pin the OTHER half of the claim too — DataFilters
    # must be empty (a regression that duplicates the predicate
    # post-scan would otherwise pass)
    import re as _re

    dm = _re.search(r"DataFilters: \[([^\]]*)\]", plan)
    assert dm is not None
    assert dm.group(1).strip() == "", f"DataFilters not empty: {dm.group(1)}"

    # pruned read returns exactly the rows the unpartitioned filter
    # would, and the pruned scan lists only the one lang directory
    expected = df.filter(F.col("lang") == "go").count()
    assert rt.count() == expected

    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "go" in m.group(1)


def test_partition_column_survives_roundtrip(spark, tmp_path):
    df = synthetic_repo_files(spark, 1000, num_partitions=2)
    path = str(tmp_path / "repo_files2")
    write_partitioned_repo_table(df, path)
    rt = read_repo_table(spark, path)
    assert set(rt.columns) == set(df.columns)
    # keys (content sha256) are preserved exactly (bit_xor: order-
    # independent and overflow-free, unlike sum over uint64 views)
    assert (
        rt.agg(F.expr("bit_xor(key)")).first()[0]
        == df.agg(F.expr("bit_xor(key)")).first()[0]
    )
