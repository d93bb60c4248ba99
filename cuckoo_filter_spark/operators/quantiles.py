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
