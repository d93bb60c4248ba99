"""Pin the driver smoke contract: ``__spark_entry__.entry(spark)``
must run on a bare SparkSession, return a stable 4-column schema,
and answer membership with zero false negatives on the inserted keys
(the reference's core guarantee, ``include/CuckooFilter.cuh``
containsMany contract) and bounded false positives on the disjoint
negative probes."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def test_entry_runs_and_schema_stable(spark):
    df = entry_mod.entry(spark)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "key", "expected", "member",
    ]
    rows = df.count()
    assert rows > 0


def test_entry_membership_semantics(spark):
    df = entry_mod.entry(spark).persist()
    try:
        # zero false negatives: every expected=True key answers True
        fn = df.filter(F.col("expected") & ~F.col("member")).count()
        assert fn == 0
        # negatives may hit FPs but only within a loose multiple of
        # the 2b*alpha/2^f bound (1000 probes is a small sample; a
        # broken filter answers True for most keys, which this catches)
        n_neg = df.filter(~F.col("expected")).count()
        fp = df.filter(~F.col("expected") & F.col("member")).count()
        assert n_neg > 0
        assert fp <= max(5, 0.01 * n_neg)
    finally:
        df.unpersist()
