"""Exact quantiles at scale: KLL bracket + one candidate pass.

A single-machine exact quantile sorts everything; a naive
distributed one (``ORDER BY`` + take) global-sorts 100 TB. The
two-pass plan here mirrors the heavy-hitters operator's shape —
a mergeable sketch narrows the problem, then an exact pass touches
only the narrowed slice:

1. **bracket pass**: a KLL sketch (map-only build + tiny fan-in,
   ``aggregate_sketch``) brackets each requested quantile with
   ``[lo, hi]`` value bounds at rank ``q ± slack·ε`` — the sketch's
   rank error ε guarantees the true quantile value lies inside;
2. **candidate pass**: ONE scan counts values below each bracket
   and collects the values inside it (≈ 2·slack·ε·n rows per
   quantile — pick the sketch's ``k`` so ε·n fits comfortably in
   driver memory; ε shrinks as O(1/k)); the exact order statistic
   is then read off the sorted candidates.

If a bracket misses (sketch error beyond the slack — possible but
exponentially unlikely), the pass retries with the slack doubled.

Result is EXACTLY the discrete lower quantile DuckDB's
``quantile_disc`` computes: the 0-based order statistic
``ceil(q*n) - 1``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoo_filter_spark.core.kll import KLLSketch
from cuckoo_filter_spark.operators.sketch_agg import aggregate_sketch

#: conservative rank-error constant for KLL at capacity k (ε ≈ c/k)
_EPS_C = 4.0


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    k: int = 2048,
    slack: float = 4.0,
    max_retries: int = 3,
) -> dict[float, float]:
    """Exact ``quantile_disc``-style quantiles of ``df[col]`` —
    returns {q: value} with value = the ``ceil(q*n)-1``-th order
    statistic (0-based)."""
    sk = aggregate_sketch(df, col, lambda: KLLSketch(k), unsigned_keys=False)
    n = sk.n
    if n == 0:
        raise ValueError("empty input")
    eps = _EPS_C / k
    out: dict[float, float] = {}
    vals = df.select(F.col(col).cast("double").alias("v")).dropna()
    pending = {q: slack for q in qs}
    for _ in range(max_retries + 1):
        if not pending:
            break
        # ONE scan resolves every pending quantile: per-q below-count
        # and in-bracket candidate list in a single aggregate
        brackets = {}
        exprs = []
        for i, (q, s) in enumerate(pending.items()):
            # open the bracket at the boundaries: the sketch's
            # extreme quantiles are not guaranteed to be the exact
            # min/max (compaction may drop extremes)
            ql, qh = q - s * eps, q + s * eps
            lo = float("-inf") if ql <= 0.0 else sk.quantile(ql)
            hi = float("inf") if qh >= 1.0 else sk.quantile(qh)
            brackets[q] = (lo, hi)
            exprs.append(
                F.sum((F.col("v") < lo).cast("long")).alias(f"below{i}")
            )
            exprs.append(
                F.collect_list(
                    F.when((F.col("v") >= lo) & (F.col("v") <= hi),
                           F.col("v"))
                ).alias(f"cand{i}")
            )
        row = vals.agg(*exprs).collect()[0]
        still = {}
        for i, (q, s) in enumerate(pending.items()):
            idx = max(0, int(np.ceil(q * n)) - 1)
            below = int(row[f"below{i}"] or 0)
            cand = sorted(row[f"cand{i}"])
            if below <= idx < below + len(cand):
                out[q] = cand[idx - below]
            else:
                still[q] = s * 2.0  # bracket missed; widen and retry
        pending = still
    if pending:
        raise RuntimeError(
            f"quantile bracket failed for {sorted(pending)} after widening"
        )
    return out


def exact_quantiles_grouped(
    df: DataFrame,
    group_col: str,
    col: str,
    qs: Sequence[float],
    k: int = 2048,
    slack: float = 4.0,
    max_retries: int = 3,
) -> DataFrame:
    """Per-group exact ``quantile_disc`` quantiles — the grouped
    generalization of :func:`exact_quantiles`.

    Stage 1 builds one KLL per group skew-safely (per-partition
    partials, blob-only shuffle — ``grouped_sketch_partial``'s
    shape) and merges them driver-side (groups × tiny blobs).
    Stage 2 broadcast-joins a (group, q, lo, hi) bracket table and
    aggregates per (group, q): the below-bracket COUNT partial-aggs
    map-side and the candidate ``collect_list`` drops out-of-bracket
    values map-side, so the Exchange carries only in-bracket values
    plus counters — never the raw column. Misses (sketch error past
    the slack) widen their bracket and retry. Returns a DataFrame
    ``(group, q, value)`` built from the driver-side finish (the
    result set is groups × quantiles rows — a decision-table-sized
    output, like ``token_budget_sample``'s planner)."""
    from typing import Iterator

    import pandas as pd

    gtype = df.schema[group_col].dataType.simpleString()
    spark = df.sparkSession
    vals = df.select(
        F.col(group_col).alias("g"), F.col(col).cast("double").alias("v")
    ).dropna()

    def partial(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        sks: dict = {}
        for pdf in it:
            for key, grp in pdf.groupby("g", sort=False):
                sk = sks.get(key)
                if sk is None:
                    sk = sks[key] = KLLSketch(k)
                sk.add_many(grp["v"].to_numpy(np.float64, copy=False))
        for key, sk in sks.items():
            yield pd.DataFrame({"g": [key], "blob": [sk.to_bytes()]})

    sketches: dict = {}
    for r in vals.mapInPandas(partial, f"g {gtype}, blob binary").collect():
        sk = KLLSketch.from_bytes(bytes(r.blob))
        if r.g in sketches:
            sketches[r.g].merge_in_place(sk)
        else:
            sketches[r.g] = sk
    eps = _EPS_C / k
    pending = {(g, q): slack for g in sketches for q in qs}
    out_rows: list = []
    for _ in range(max_retries + 1):
        if not pending:
            break
        bracket_rows = []
        for (g, q), s in pending.items():
            sk = sketches[g]
            ql, qh = q - s * eps, q + s * eps
            lo = float("-inf") if ql <= 0.0 else sk.quantile(ql)
            hi = float("inf") if qh >= 1.0 else sk.quantile(qh)
            bracket_rows.append((g, float(q), lo, hi))
        br = F.broadcast(
            spark.createDataFrame(
                bracket_rows,
                schema=f"g {gtype}, q double, lo double, hi double",
            )
        )
        agg = (
            vals.join(br, "g")
            .groupBy("g", "q")
            .agg(
                F.sum((F.col("v") < F.col("lo")).cast("long")).alias("below"),
                F.collect_list(
                    F.when(
                        (F.col("v") >= F.col("lo"))
                        & (F.col("v") <= F.col("hi")),
                        F.col("v"),
                    )
                ).alias("cand"),
            )
            .collect()
        )
        got = {(r.g, r.q): r for r in agg}
        still = {}
        for (g, q), s in pending.items():
            r = got[(g, q)]
            n_g = sketches[g].n
            idx = max(0, int(np.ceil(q * n_g)) - 1)
            below, cand = int(r.below or 0), sorted(r.cand)
            if below <= idx < below + len(cand):
                out_rows.append((g, q, cand[idx - below]))
            else:
                still[(g, q)] = s * 2.0
        pending = still
    if pending:
        raise RuntimeError(
            f"grouped quantile bracket failed for {sorted(pending)}"
        )
    return spark.createDataFrame(
        out_rows, schema=f"{group_col} {gtype}, q double, value double"
    )
