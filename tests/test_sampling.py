"""Deterministic sampling operators: hash_sample nesting/stability,
token_budget_sample vs a naive single-window reference."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators import sampling

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(11)
    n = 2000
    langs = np.array(["en"] * 60 + ["de"] * 20 + ["fr"] * 15 + ["zh"] * 5)
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": langs[rng.integers(0, len(langs), n)],
        "n_tokens": rng.integers(0, 400, n).astype(np.int64),
    })
    return spark.createDataFrame(pdf)


def test_hash_sample_fraction_and_nesting(docs):
    n = docs.count()
    s10 = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.10).collect()}
    s05 = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.05).collect()}
    # deterministic: second run identical
    again = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.10).collect()}
    assert s10 == again
    # nested: the 5% sample is a subset of the 10% sample
    assert s05 <= s10
    # fraction within binomial noise (5 sigma)
    assert abs(len(s10) - 0.10 * n) < 5 * (0.1 * 0.9 * n) ** 0.5


def _naive_budget(docs, budget, buckets):
    """Reference semantics: one global window in canonical order."""
    pr = sampling.hash_priority32(F.col("doc_id"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.pmod(pr, F.lit(buckets)), pr, "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("__cum", F.sum("n_tokens").over(w))
        .filter(F.col("__cum") <= budget)
        .select("lang", "doc_id", "n_tokens")
    )


@pytest.mark.parametrize("budget", [0, 1500, 40000, 10**9])
def test_token_budget_sample_matches_naive_window(docs, budget):
    got = sorted(
        map(tuple, sampling.token_budget_sample(
            docs, "lang", "n_tokens", "doc_id", budget, buckets=16
        ).collect())
    )
    want = sorted(map(tuple, _naive_budget(docs, budget, 16).collect()))
    assert got == want
    if budget >= 10**9:  # everything fits -> nothing dropped
        assert len(got) == docs.count()


def test_token_budget_respects_budget(docs):
    out = sampling.token_budget_sample(
        docs, "lang", "n_tokens", "doc_id", 1500, buckets=16
    )
    sums = {
        r.lang: r.s
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert all(s <= 1500 for s in sums.values())
    # greedy maximality: adding the next-priority dropped row would
    # exceed the budget is implied by equality with the naive window
    # (tested above); here just check the budget is actually used
    assert all(s > 0 for s in sums.values())
