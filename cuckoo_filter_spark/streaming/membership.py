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


def stream_build_sharded(
    stream_df: DataFrame,
    key_col: str,
    capacity: int,
    num_shards: int,
    config=None,
):
    """Stateful streaming filter build — the custom-stateful-operator
    path (``applyInPandasWithState``): group state holds one cuckoo
    filter blob per shard; every micro-batch inserts its shard's
    novel keys and emits ``(key, shard, fresh)`` where ``fresh`` is
    True for the first sighting of a key (set semantics: duplicates
    and hash false-positives gate as seen). This is the streaming
    complement of ``ShardedCuckooFilter.build`` — state never leaves
    the executors and is checkpointed by the streaming engine.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType, BooleanType, LongType, StructField, StructType,
    )

    from cuckoo_filter_spark.config import CuckooConfig
    from cuckoo_filter_spark.core.cuckoo import CuckooFilter
    from cuckoo_filter_spark.hashing import keys_to_unsigned
    from cuckoo_filter_spark.operators.membership import (
        OVERPROVISION, shard_expr,
    )

    cfg = config or CuckooConfig()
    per_shard_cap = int(math.ceil(capacity / num_shards * OVERPROVISION))
    out_schema = StructType([
        StructField(key_col, LongType()),
        StructField("shard", LongType()),
        StructField("fresh", BooleanType()),
    ])
    state_schema = StructType([StructField("blob", BinaryType())])

    def update(key, pdfs, state: GroupState):
        shard_id = int(key[0])
        if state.exists:
            flt = CuckooFilter.from_bytes(bytes(state.get[0]))
        else:
            flt = CuckooFilter(per_shard_cap, cfg)
        for pdf in pdfs:
            raw = pdf[key_col].to_numpy(np.int64, copy=False)
            keys = keys_to_unsigned(raw)
            seen = flt.contains_many(keys)
            fresh = ~seen
            novel = np.flatnonzero(fresh)
            if novel.size:
                # set semantics: one stored instance per distinct key;
                # intra-batch duplicates gate on the first occurrence
                uniq, first = np.unique(keys[novel], return_index=True)
                flt.insert_many(uniq)
                mask = np.zeros(len(novel), dtype=bool)
                mask[first] = True
                fresh[novel[~mask]] = False
            yield pd.DataFrame({
                key_col: raw, "shard": shard_id, "fresh": fresh,
            })
        state.update((flt.to_bytes(),))

    return (
        stream_df.withColumn("__shard", shard_expr(key_col, num_shards))
        .groupBy("__shard")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


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


def stream_sketch_window(
    stream_df: DataFrame,
    event_time_col: str,
    key_col: str,
    window_duration: str = "1 minute",
    watermark: str = "10 seconds",
    make_sketch=None,
    finisher=None,
    finisher_schema: str | None = None,
):
    """Watermarked per-window sketch rollup — one mergeable sketch
    per event-time tumbling window, finalized by the watermark
    (the streaming complement of ``grouped_sketch``; state pattern
    cf. the long-lived IPC filter, ``CuckooFilterIPC.cuh:190-199``).

    The sketch and its output columns are pluggable like
    ``grouped_sketch``'s: the default is an HLL p=14 emitting
    ``distinct_est``; pass ``make_sketch`` plus a ``finisher``
    (sketch → {col: value}) and ``finisher_schema`` (DDL string) for
    any other sketch — e.g. a Misra-Gries summary emitting the
    window's trending heavy hitters.

    One sketch per window lives in ``applyInPandasWithState`` group
    state; each micro-batch folds its rows in, and the window emits
    exactly one final row ``(window_start, window_end, n_rows,
    <finisher cols>)`` when the event-time watermark passes the
    window end (EventTimeTimeout). Late rows beyond the watermark
    are dropped by the engine before reaching state, so state is
    bounded by the number of open windows — not by key cardinality,
    which is the point of the sketch at 100 TB/day rates.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from cuckoo_filter_spark.core.hll import HyperLogLog
    from cuckoo_filter_spark.hashing import keys_to_unsigned

    factory = make_sketch or (lambda: HyperLogLog(p=14))
    if finisher is None:
        finisher = lambda sk: {"distinct_est": int(round(sk.estimate()))}
        finisher_schema = "distinct_est long"
    elif finisher_schema is None:
        raise ValueError("finisher requires finisher_schema")
    proto = factory()
    cls = type(proto)
    finish_fields = StructType.fromDDL(finisher_schema).fields
    out_schema = StructType([
        StructField("window_start_epoch", LongType()),
        StructField("window_end_epoch", LongType()),
        StructField("n_rows", LongType()),
        *finish_fields,
    ])
    state_schema = StructType([
        StructField("blob", BinaryType()),
        StructField("n_rows", LongType()),
    ])

    def update(key, pdfs, state: GroupState):
        # key = (window struct, start_epoch, end_epoch). The struct's
        # timestamps arrive session-timezone-naive, and re-interpreting
        # them in Python (pd.Timestamp(...).timestamp() assumes UTC)
        # would offset the timeout by the zone — premature/duplicate
        # window emission west of UTC, hours-late east of it. The
        # epochs are computed JVM-side (F.unix_timestamp) so Python
        # never re-interprets a naive timestamp.
        ws_epoch, we_epoch = int(key[1]), int(key[2])
        if state.hasTimedOut:
            blob, n_rows = state.get
            sk = cls.from_bytes(bytes(blob))
            state.remove()
            row = {
                "window_start_epoch": [ws_epoch],
                "window_end_epoch": [we_epoch],
                "n_rows": [int(n_rows)],
            }
            row.update({k: [v] for k, v in finisher(sk).items()})
            yield pd.DataFrame(row)
            return
        if state.exists:
            blob, n_rows = state.get
            sk = cls.from_bytes(bytes(blob))
            n_rows = int(n_rows)
        else:
            sk, n_rows = factory(), 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            raw = pdf[key_col].to_numpy(np.int64, copy=False)
            sk.add_many(keys_to_unsigned(raw))
            n_rows += len(raw)
        state.update((sk.to_bytes(), n_rows))
        # finalize when the watermark passes the window end
        state.setTimeoutTimestamp(we_epoch * 1000)

    win = F.window(F.col(event_time_col), window_duration)
    return (
        stream_df.withWatermark(event_time_col, watermark)
        # group by the window STRUCT — it inherits the watermark tag
        # from the event-time column, which EventTimeTimeout requires —
        # plus its JVM-computed unix epochs (timezone-unambiguous)
        .withColumn("__w", win)
        .withColumn("__ws", F.unix_timestamp(F.col("__w.start")))
        .withColumn("__we", F.unix_timestamp(F.col("__w.end")))
        .select("__w", "__ws", "__we", key_col)
        .groupBy("__w", "__ws", "__we")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
        # back to timestamps JVM-side — same external schema as before
        .select(
            F.timestamp_seconds(F.col("window_start_epoch")).alias(
                "window_start"
            ),
            F.timestamp_seconds(F.col("window_end_epoch")).alias("window_end"),
            "n_rows",
            *[f.name for f in finish_fields],
        )
    )


def stream_apply_ops(
    stream_df: DataFrame,
    key_col: str,
    op_col: str,
    capacity: int,
    num_shards: int,
    config=None,
    seq_col: str | None = None,
    filter_factory=None,
    filter_cls=None,
):
    """Stateful streaming application of a mixed insert/delete op
    stream — the full reference op set (``insertMany`` /
    ``deleteMany``, multiset semantics) against long-lived sharded
    filter state (``applyInPandasWithState``). Input rows are
    ``(key, op)`` with op in {'insert','delete'}; output is
    ``(key, op, shard, ok)``.

    Ordering: ops for one shard are applied in the order they are
    DELIVERED to the state function. When a micro-batch's ops for
    one key span several source partitions, the shuffle into the
    shard group interleaves them nondeterministically — like any
    distributed queue, cross-partition order is undefined. Pass
    ``seq_col`` (an event sequence number / timestamp) to impose a
    deterministic total order per shard: the batch is then sorted by
    it before applying, so insert-then-delete of the same key in one
    micro-batch behaves exactly like the sequential reference calls
    regardless of partition layout. Consecutive same-op runs are
    applied as one vectorized kernel call either way.

    Any filter exposing the kernel protocol (``insert_many`` /
    ``delete_many`` / ``to_bytes`` / ``from_bytes``) can hold the
    state: pass ``filter_factory`` (per-shard constructor, sized by
    the caller) with ``filter_cls`` — e.g. the Offset-policy
    ``OffsetCuckooFilter``, giving all three bucket policies the
    same streaming surface. Defaults to the XOR-policy
    :class:`~cuckoo_filter_spark.core.cuckoo.CuckooFilter`."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType, BooleanType, LongType, StringType, StructField,
        StructType,
    )

    from cuckoo_filter_spark.config import CuckooConfig
    from cuckoo_filter_spark.core.cuckoo import CuckooFilter
    from cuckoo_filter_spark.hashing import keys_to_unsigned
    from cuckoo_filter_spark.operators.membership import (
        OVERPROVISION, shard_expr,
    )

    cfg = config or CuckooConfig()
    per_shard_cap = int(math.ceil(capacity / num_shards * OVERPROVISION))
    if filter_factory is None:
        filter_factory = lambda: CuckooFilter(per_shard_cap, cfg)
        filter_cls = CuckooFilter
    elif filter_cls is None:
        raise ValueError("filter_factory requires filter_cls")
    out_schema = StructType([
        StructField(key_col, LongType()),
        StructField("op", StringType()),
        StructField("shard", LongType()),
        StructField("ok", BooleanType()),
    ])
    state_schema = StructType([StructField("blob", BinaryType())])

    def _apply(flt, raw, ops):
        keys = keys_to_unsigned(raw)
        ok = np.zeros(len(raw), dtype=bool)
        # apply consecutive same-op runs as one kernel call
        bounds = np.flatnonzero(np.r_[True, ops[1:] != ops[:-1]])
        for b0, b1 in zip(bounds, np.r_[bounds[1:], len(ops)]):
            seg = keys[b0:b1]
            if ops[b0] == "insert":
                ok[b0:b1] = flt.insert_many(seg)
            else:
                ok[b0:b1] = flt.delete_many(seg)
        return ok

    def update(key, pdfs, state: GroupState):
        shard_id = int(key[0])
        if state.exists:
            flt = filter_cls.from_bytes(bytes(state.get[0]))
        else:
            flt = filter_factory()
        if seq_col is not None:
            # deterministic total order: gather the shard's batch and
            # sort by the caller's sequence column before applying
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                batch = (
                    pd.concat(chunks, ignore_index=True)
                    .sort_values(seq_col, kind="stable", ignore_index=True)
                )
                raw = batch[key_col].to_numpy(np.int64, copy=False)
                ops = batch[op_col].to_numpy()
                ok = _apply(flt, raw, ops)
                yield pd.DataFrame({
                    key_col: raw, "op": ops, "shard": shard_id, "ok": ok,
                })
        else:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                raw = pdf[key_col].to_numpy(np.int64, copy=False)
                ops = pdf[op_col].to_numpy()
                ok = _apply(flt, raw, ops)
                yield pd.DataFrame({
                    key_col: raw, "op": ops, "shard": shard_id, "ok": ok,
                })
        state.update((flt.to_bytes(),))

    return (
        stream_df.withColumn("__shard", shard_expr(key_col, num_shards))
        .groupBy("__shard")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
