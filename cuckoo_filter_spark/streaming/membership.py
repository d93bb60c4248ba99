"""Structured Streaming integration.

The reference is batch-only; its IPC server capability (a
long-lived filter answering query streams,
``CuckooFilterIPC.cuh``) maps naturally onto Structured Streaming:
a built filter is broadcast once and a key stream is annotated /
filtered continuously. Stream-side dedup uses watermarked
dropDuplicates (exact, state-bounded) — the streaming complement
of the batch dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.membership import DistributedCuckooFilter


def stream_membership(
    stream_df: DataFrame,
    filt: DistributedCuckooFilter,
    key_col: str,
    out_col: str = "member",
) -> DataFrame:
    """Annotate a streaming DataFrame with cuckoo membership. The
    filter blob is broadcast once; the same vectorized pandas UDF
    used in batch runs per micro-batch (stateless, so any output
    mode works)."""
    spark = stream_df.sparkSession
    return stream_df.withColumn(
        out_col, filt.contains_udf(spark)(F.col(key_col))
    )


def stream_novel_keys(
    stream_df: DataFrame,
    filt: DistributedCuckooFilter,
    key_col: str,
) -> DataFrame:
    """Pass through only keys NOT present in the filter — the
    classic 'have we seen this content before' gate in ingestion
    pipelines (membership false → definitely novel, no FN risk;
    FP rate drops a small ε of novel keys)."""
    annotated = stream_membership(stream_df, filt, key_col, "__member")
    return annotated.filter(~F.col("__member")).drop("__member")


def stream_exact_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked exact dedup: duplicates arriving within the
    watermark horizon are dropped exactly and state is evicted past
    it (``dropDuplicatesWithinWatermark``, Spark 3.5+)."""
    return stream_df.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)
