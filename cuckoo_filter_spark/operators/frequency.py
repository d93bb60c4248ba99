"""Exact heavy hitters at scale: Misra-Gries candidates + a
candidate-only exact count pass.

The naive plan — ``explode(tokens).groupBy(token).count()`` then
filter — shuffles EVERY token occurrence (at 100 TB of text, the
exploded token table is larger than the corpus). The classic 2-pass
alternative bounds that:

1. **candidate pass** (map-only + tiny fan-in): a Misra-Gries
   summary of the hashed token stream per partition, merged via
   ``aggregate_sketch``. Completeness is guaranteed, not heuristic:
   every token with frequency > shed ≤ n/(capacity+1) survives, so
   ``capacity >= 1/threshold`` can miss no threshold-heavy token
   (hash collisions only ADD weight — they can hide nothing).
2. **verify pass**: the token stream is filtered to the ≤capacity
   candidate hashes with a broadcast join (almost every row drops
   before the shuffle), then counted EXACTLY and filtered to the
   threshold. Collisions that smuggled a cold token into the
   candidate set are eliminated here by its exact count.

Output is therefore exact (identical to the naive plan / the SQL
oracle) with the full-width shuffle replaced by a broadcast
semi-join + a candidate-only aggregate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoo_filter_spark.core.misra_gries import MisraGries
from cuckoo_filter_spark.operators.sketch_agg import aggregate_sketch


def whitespace_tokens(df: DataFrame, content_col: str) -> DataFrame:
    """One row per whitespace token (collapsed runs, empty rows
    dropped) — the exploded stream both passes read."""
    collapsed = F.regexp_replace(F.trim(F.col(content_col)), r"\s+", " ")
    return (
        df.select(F.explode(F.split(collapsed, " ")).alias("token"))
        .filter(F.length("token") > 0)
    )


def heavy_hitters_exact(
    tokens: DataFrame,
    token_col: str,
    threshold: float,
    capacity: Optional[int] = None,
) -> DataFrame:
    """Exact (token, cnt) for every token with
    ``cnt >= threshold * total``; see module docstring for the
    2-pass plan. ``capacity`` defaults to ``2/threshold`` (the 2x
    margin keeps the shed bound comfortably under the threshold)."""
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    cap = capacity or max(64, int(np.ceil(2.0 / threshold)))
    hashed = tokens.select(F.xxhash64(token_col).alias("h"))
    mg = aggregate_sketch(hashed, "h", lambda: MisraGries(cap))
    total = mg.total
    if total == 0:
        return tokens.select(
            F.col(token_col).alias("token"),
            F.lit(0).cast("long").alias("cnt"),
        ).limit(0)
    cand_keys, _ = mg.candidates()
    spark = tokens.sparkSession
    cand = F.broadcast(
        spark.createDataFrame(
            [(int(k),) for k in cand_keys.view(np.int64)], schema="h long"
        )
    )
    return (
        tokens.withColumn("h", F.xxhash64(token_col))
        .join(cand, "h")
        .groupBy(F.col(token_col).alias("token"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(float(threshold)) * F.lit(total))
    )
