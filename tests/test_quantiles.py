"""Exact distributed quantiles (KLL bracket + candidate pass) vs
numpy ground truth at the quantile_disc order statistic."""

import numpy as np
import pandas as pd
import pytest

from cuckoo_filter_spark.operators.quantiles import exact_quantiles

pytestmark = pytest.mark.usefixtures("spark")


def _disc(sorted_vals, q):
    n = len(sorted_vals)
    return sorted_vals[max(0, int(np.ceil(q * n)) - 1)]


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "dupes"])
def test_exact_quantiles_match_order_statistics(spark, dist):
    rng = np.random.default_rng(hash(dist) % 2**32)
    n = 60_000
    if dist == "uniform":
        v = rng.uniform(-100, 100, n)
    elif dist == "lognormal":
        v = rng.lognormal(3, 2, n)
    else:  # heavy duplicates — ties must not break the rank math
        v = rng.integers(0, 50, n).astype(np.float64)
    df = spark.createDataFrame(pd.DataFrame({"x": v})).repartition(8)
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles(df, "x", qs, k=512)
    sv = np.sort(v)
    for q in qs:
        assert got[q] == _disc(sv, q), (dist, q)


def test_exact_quantiles_large_candidate_volume(spark):
    """A coarse sketch over a big input puts ~25% of ALL rows inside
    each quantile's bracket (k=64 -> eps=1/16, slack=4 -> bracket
    half-width 0.25 in rank space). The candidate lists — ~10^5
    doubles per quantile — are sorted and indexed JVM-side; the
    driver receives one scalar per quantile, and every answer is
    still the exact order statistic."""
    rng = np.random.default_rng(17)
    n = 400_000
    v = rng.standard_normal(n)
    df = spark.createDataFrame(pd.DataFrame({"x": v})).repartition(16)
    qs = [0.1, 0.5, 0.9]
    got = exact_quantiles(df, "x", qs, k=64, slack=4.0)
    sv = np.sort(v)
    for q in qs:
        assert got[q] == _disc(sv, q), q


def test_exact_quantiles_tiny_sketch_retries(spark):
    """An undersized sketch (coarse brackets) still converges via the
    widening retry and stays exact."""
    rng = np.random.default_rng(9)
    v = rng.standard_normal(20_000)
    df = spark.createDataFrame(pd.DataFrame({"x": v}))
    got = exact_quantiles(df, "x", [0.5], k=64, slack=1.0)
    assert got[0.5] == _disc(np.sort(v), 0.5)
