"""Grouped exact quantiles vs per-group numpy order statistics."""

import numpy as np
import pandas as pd
import pytest

from cuckoo_filter_spark.operators.quantiles import exact_quantiles_grouped

pytestmark = pytest.mark.usefixtures("spark")


def _disc(sorted_vals, q):
    n = len(sorted_vals)
    return sorted_vals[max(0, int(np.ceil(q * n)) - 1)]


def test_grouped_exact_quantiles(spark):
    rng = np.random.default_rng(23)
    # skewed group sizes: one hot group, several small ones
    sizes = {"hot": 40_000, "mid": 5_000, "s1": 700, "s2": 31}
    frames = []
    for g, n in sizes.items():
        frames.append(pd.DataFrame({
            "grp": g,
            "x": rng.lognormal(2, 1.5, n) * (1 if g != "mid" else -1),
        }))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf).repartition(8)
    qs = [0.1, 0.5, 0.95]
    out = exact_quantiles_grouped(df, "grp", "x", qs, k=256)
    got = {(r.grp, r.q): r.value for r in out.collect()}
    assert len(got) == len(sizes) * len(qs)
    for g in sizes:
        sv = np.sort(pdf.loc[pdf.grp == g, "x"].to_numpy())
        for q in qs:
            assert got[(g, q)] == _disc(sv, q), (g, q)


def test_grouped_quantiles_tiny_sketch_retry(spark):
    rng = np.random.default_rng(29)
    pdf = pd.DataFrame({
        "grp": np.repeat(["a", "b"], 8000),
        "x": rng.standard_normal(16000),
    })
    df = spark.createDataFrame(pdf)
    out = exact_quantiles_grouped(df, "grp", "x", [0.5], k=64, slack=1.0)
    got = {(r.grp, r.q): r.value for r in out.collect()}
    for g in ("a", "b"):
        sv = np.sort(pdf.loc[pdf.grp == g, "x"].to_numpy())
        assert got[(g, 0.5)] == _disc(sv, 0.5)


def test_grouped_quantiles_many_groups(spark):
    # VERDICT r3 task 3 done-criterion: >=10^4 groups without any
    # O(groups) driver-side state (the finish is all JVM-side)
    rng = np.random.default_rng(31)
    n_groups = 10_000
    rows_per = 12
    pdf = pd.DataFrame({
        "grp": np.repeat(
            np.array([f"g{i:05d}" for i in range(n_groups)]), rows_per
        ),
        "x": rng.standard_normal(n_groups * rows_per),
    })
    df = spark.createDataFrame(pdf).repartition(16)
    out = exact_quantiles_grouped(df, "grp", "x", [0.5], k=128)
    got = {r.grp: r.value for r in out.collect()}
    assert len(got) == n_groups
    # spot-check 50 groups against numpy order statistics
    for i in range(0, n_groups, n_groups // 50):
        g = f"g{i:05d}"
        sv = np.sort(pdf.loc[pdf.grp == g, "x"].to_numpy())
        assert got[g] == _disc(sv, 0.5), g
