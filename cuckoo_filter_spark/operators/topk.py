"""Top-k rows per group, skew-safely.

The textbook ``row_number() OVER (PARTITION BY g ORDER BY v)``
shuffles and sorts EVERY row of every group; a hot group at 100 TB
is a terabyte-scale sort in one task. The two-phase plan bounds
both:

1. **partial prune** (``mapInPandas``, no shuffle): each input
   partition keeps only its own top-k per group — the survivors are
   ≤ k·partitions rows per group regardless of group size, and the
   per-task buffer is bounded by (groups-seen × k) rows;
2. **final select**: the window ranks only the pruned survivors —
   the Exchange carries ≤ k rows per (group, input partition), and
   no task ever sorts a whole raw group.

Results are exactly the window answer when the ordering is total;
pass ``tie_cols`` to break ties deterministically (ties that the
ordering cannot see may otherwise be pruned arbitrarily in phase 1,
exactly as an ORDER BY without a tie-break returns an arbitrary
choice).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact top-k rows per group by ``order_col`` (then
    ``tie_cols`` ascending), executed with the two-phase plan above.
    Returns the full input rows plus a ``rank`` column (1-based)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    group_cols = list(group_cols)
    tie_cols = list(tie_cols)
    sort_cols = [order_col] + tie_cols
    ascending = [not descending] + [True] * len(tie_cols)
    cols = df.columns

    def spark_head(g: pd.DataFrame) -> pd.DataFrame:
        # Spark null-ordering parity: asc ranks nulls FIRST
        # (asc_nulls_first), desc ranks them LAST (desc_nulls_last).
        # pandas sort_values has one na_position for all columns, so
        # emulate the mixed ordering with a stable multi-pass sort
        # (last key first), each pass with its own na_position.
        for c, asc in reversed(list(zip(sort_cols, ascending))):
            g = g.sort_values(
                c, ascending=asc, kind="stable",
                na_position="first" if asc else "last",
            )
        return g.head(k)

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict = {}
        for pdf in batches:
            # dropna=False: rows whose group key is null form a group
            # of their own, exactly as Spark's partitionBy treats them
            for key, g in pdf.groupby(group_cols, sort=False, dropna=False):
                g = spark_head(g)
                prev = best.get(key)
                if prev is not None:
                    g = spark_head(pd.concat([prev, g]))
                best[key] = g
        if best:
            yield pd.concat(best.values())

    pruned = df.mapInPandas(prune, schema=df.schema)
    order = [
        F.desc(order_col) if descending else F.asc(order_col)
    ] + [F.asc(c) for c in tie_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*cols, "rank")
    )
