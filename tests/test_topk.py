"""Two-phase top-k per group vs the naive window reference."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.topk import top_k_per_group

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(17)
    n = 5000
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # zipf-ish group sizes incl. one hot group
        "user_id": np.minimum(rng.zipf(1.5, n), 50).astype(np.int64),
        # duplicate values so tie-breaks matter
        "value": rng.integers(0, 40, n).astype(np.int64),
    })
    return spark.createDataFrame(pdf).repartition(8)


def _naive(df, k, descending=True):
    order = [F.desc("value") if descending else F.asc("value"),
             F.asc("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@pytest.mark.parametrize("k", [1, 3, 7])
def test_topk_matches_window(events, k):
    got = sorted(
        map(tuple, top_k_per_group(
            events, "user_id", "value", k, tie_cols=["event_id"]
        ).collect())
    )
    want = sorted(map(tuple, _naive(events, k).collect()))
    assert got == want and len(got) > 0


def test_topk_ascending(events):
    got = sorted(
        map(tuple, top_k_per_group(
            events, "user_id", "value", 2, descending=False,
            tie_cols=["event_id"],
        ).collect())
    )
    want = sorted(map(tuple, _naive(events, 2, descending=False).collect()))
    assert got == want


@pytest.fixture(scope="module")
def null_events(spark):
    rng = np.random.default_rng(19)
    n = 2000
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.minimum(rng.zipf(1.5, n), 20).astype(np.float64),
        "value": rng.integers(0, 25, n).astype(np.float64),
    })
    # null group keys AND null order values (ADVICE r3: pandas
    # dropna/NaN-last defaults silently diverged from the window)
    pdf.loc[pdf.index % 13 == 0, "user_id"] = np.nan
    pdf.loc[pdf.index % 17 == 0, "value"] = np.nan
    return spark.createDataFrame(pdf).repartition(8)


def _naive_nulls(df, k, descending):
    order = [F.desc("value") if descending else F.asc("value"),
             F.asc("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@pytest.mark.parametrize("descending", [True, False])
def test_topk_null_groups_and_values(null_events, descending):
    got = sorted(
        map(tuple, top_k_per_group(
            null_events, "user_id", "value", 3, descending=descending,
            tie_cols=["event_id"],
        ).collect())
    )
    want = sorted(
        map(tuple, _naive_nulls(null_events, 3, descending).collect())
    )
    assert got == want and len(got) > 0
