"""Deterministic sampling operators for training-data pipelines.

Random sampling (``df.sample``) is run-dependent: a retry, a
different partition layout, or a cluster resize changes the sample.
Training-data curation needs the opposite — a sample that is a pure
function of the data, so reruns, incremental backfills, and audits
all agree. Both operators here key on an md5-derived priority that
is reproducible in ANSI SQL (DuckDB oracles use the same bytes).

* :func:`hash_sample` — keep a deterministic ``fraction`` of rows
  keyed on a column. Pure Column expression: whole-stage codegen,
  predicate reaches the scan, no RNG, no Python.
* :func:`token_budget_sample` — per-group budgeted take (e.g. "at
  most N tokens per language in the training mix"), skew-safe: the
  canonical order is bucketed so no single per-group sort ever sees
  more than ~1/buckets of a group. A naive
  ``SUM() OVER (PARTITION BY group ORDER BY ...)`` puts each whole
  group in ONE window task — at 100 TB a hot language is terabytes
  in one sort. Here only the single boundary bucket per group is
  window-sorted; every other bucket is kept or dropped wholesale
  from a tiny per-bucket aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

#: 32-bit priority space (matches the 8-hex-char md5 prefix)
_PSPACE = 1 << 32


def hash_priority32(col: Column) -> Column:
    """Unsigned 32-bit deterministic priority: first 8 hex chars of
    md5(string(col)). Portable — DuckDB computes the identical value
    as ``('0x' || substr(md5(CAST(col AS VARCHAR)), 1, 8))::UBIGINT``."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("long")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``key_col``.

    A row is kept iff ``priority32(key) < fraction * 2^32`` — stable
    across runs, partitionings, and cluster sizes; rows sampled at
    10% are a superset of the rows sampled at 5% (nested samples for
    ablations). The filter is a codegen'd Column expression, so
    Catalyst pushes it into the scan."""
    cut = int(fraction * _PSPACE)
    return df.filter(hash_priority32(F.col(key_col)) < F.lit(cut))


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    budget: int,
    buckets: int = 64,
) -> DataFrame:
    """Keep rows per group, in deterministic priority order, until
    the running ``weight_col`` total would exceed ``budget``.

    Canonical order within a group is ``(priority % buckets,
    priority, id)`` — identical to a single global cumulative-sum
    cutoff in that order (expressible as one window in an oracle),
    but executed skew-safely in three stages:

    1. per-(group, bucket) weight sums — one small aggregate
       (``groups x buckets`` rows, independent of data volume);
    2. driver-side prefix scan of that aggregate finds each group's
       boundary bucket: buckets strictly before it are kept
       wholesale, buckets after it dropped wholesale (broadcast of
       a ``groups``-row decision table);
    3. ONLY the boundary bucket per group is window-sorted for the
       exact cutoff — ~1/buckets of each group, so no task ever
       sorts a whole group.

    The driver-side scan is bounded by groups x buckets (e.g. 16
    languages x 64 = 1024 rows at any corpus size) — it is a
    decision table, not row data.
    """
    pr = hash_priority32(F.col(id_col))
    rows = df.select(
        F.col(group_col), F.col(id_col), F.col(weight_col),
        pr.alias("__p"),
        F.pmod(pr, F.lit(buckets)).alias("__b"),
    )
    per_bucket = (
        rows.groupBy(group_col, "__b")
        .agg(F.sum(weight_col).alias("__bw"))
        .collect()
    )
    # prefix-scan bucket totals per group (bucket-id order)
    totals: dict = {}
    for r in per_bucket:
        totals.setdefault(r[group_col], {})[r["__b"]] = r["__bw"]
    decisions = []  # (group, boundary_bucket, weight_before_boundary)
    for g, bw in totals.items():
        run = 0
        boundary, before = buckets, run  # default: whole group fits
        for b in sorted(bw):
            if run + bw[b] > budget:
                boundary, before = b, run
                break
            run += bw[b]
        decisions.append((g, boundary, before))
    out_cols = [group_col, id_col, weight_col]
    if not decisions:
        return df.select(*out_cols).limit(0)
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType.simpleString()
    dec = F.broadcast(
        spark.createDataFrame(
            decisions,
            schema=f"{group_col} {gtype}, __kb long, __before long",
        )
    )
    joined = rows.join(dec, group_col)
    full_keep = joined.filter(F.col("__b") < F.col("__kb"))
    boundary_rows = joined.filter(F.col("__b") == F.col("__kb"))
    w = (
        Window.partitionBy(group_col)
        .orderBy("__p", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary_keep = boundary_rows.withColumn(
        "__cum", F.sum(weight_col).over(w) + F.col("__before")
    ).filter(F.col("__cum") <= F.lit(budget))
    return full_keep.select(*out_cols).unionByName(
        boundary_keep.select(*out_cols)
    )
