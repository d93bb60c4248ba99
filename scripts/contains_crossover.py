"""Probe-volume crossover sweep: contains_sql vs stacked-broadcast UDF.

Round-4 VERDICT (optional task 7): the zero-Python `contains_sql`
lane measured ~3x slower than the stacked-broadcast pandas-UDF lane
at the bench's probe volume (~16M). Both lanes pay different fixed
costs — the UDF lane forks/reuses Python workers and ships Arrow
batches; the SQL lane evaluates pure codegen against a broadcast
words relation — so if the SQL lane wins anywhere it should be at
SMALL probe sets, where Python worker startup dominates. This sweep
measures both lanes at probe sizes 10^4 → 10^8 (half resident
positives, half disjoint negatives), interleaved within one session
so host drift hits both lanes equally, and appends the table to
BENCH/NOTES.md (idempotent via a marker line).

Usage: python scripts/contains_crossover.py [--notes]
Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_KEYS (filter population,
default 0.95 * 2^24), SPARK_GRAFT_CROSSOVER_SIZES (comma list).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from bench import CFG, TARGET_LOAD, OVER, build_session, prefault_memory, reclaim
from cuckoo_filter_spark.operators.membership import ShardedCuckooFilter
from cuckoo_filter_spark.sources.parquet_io import read_matched_splits
from cuckoo_filter_spark.sources.repo_table import synthetic_repo_files

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "<!-- contains_crossover_r5 -->"


def main():
    write_notes = "--notes" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_keys = int(os.environ.get(
        "SPARK_GRAFT_BENCH_KEYS", str(int((1 << 24) * TARGET_LOAD))
    ))
    sizes = [
        int(float(s)) for s in os.environ.get(
            "SPARK_GRAFT_CROSSOVER_SIZES", "1e4,1e5,1e6,1e7,1e8"
        ).split(",")
    ]
    prefault_memory(int(os.environ.get("SPARK_GRAFT_PREFAULT_GB", "12")))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    num_shards = max(2 * cpus, 16)
    per_shard_slots = 1 << max(
        10, int(round(np.log2(n_keys / TARGET_LOAD / num_shards)))
    )
    slot_capacity = per_shard_slots * num_shards
    n_keys = int(slot_capacity * TARGET_LOAD)
    capacity = int(slot_capacity / OVER())
    while int(np.ceil(capacity / num_shards * OVER())) > per_shard_slots:
        capacity -= num_shards

    work = os.environ.get("SPARK_GRAFT_WORK_DIR", "/tmp/spark_graft_bench")
    keys_path = f"{work}/xo_keys_{n_keys}.parquet"
    synthetic_repo_files(spark, n_keys, num_partitions=cpus).select(
        "key"
    ).write.mode("overwrite").parquet(keys_path)
    repo = read_matched_splits(spark, keys_path)

    # per-size probe files: half resident positives (row-id prefix of
    # the inserted population — synthetic_repo_files is deterministic
    # by id), half disjoint-seed negatives
    probe_paths = {}
    for s in sizes:
        half = min(s // 2, n_keys)
        p = f"{work}/xo_probes_{s}.parquet"
        (
            synthetic_repo_files(spark, half, num_partitions=cpus)
            .select("key")
            .unionByName(
                synthetic_repo_files(
                    spark, s - half, num_partitions=cpus, seed=777
                ).select("key")
            )
            .write.mode("overwrite").parquet(p)
        )
        probe_paths[s] = p
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 << 20))

    # warm the worker pool
    import pandas as _pd

    def _warm(it):
        from cuckoo_filter_spark.core.cuckoo import CuckooFilter  # noqa
        for pdf in it:
            yield _pd.DataFrame({"x": [len(pdf)]})

    spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(_warm, "x long").count()

    filt = ShardedCuckooFilter.build(repo, "key", capacity, num_shards, CFG)
    filt.persist()
    filt.metrics().collect()
    # warm both lanes' instance caches (stacked blob / words DF):
    # steady-state serving is the regime being compared
    warm = spark.read.parquet(probe_paths[sizes[0]])
    filt.contains_broadcast(warm, "key").count()
    filt.contains_sql(warm, "key").count()

    results = {}
    for s in sizes:
        reps = 7 if s <= 1_000_000 else 3
        df = spark.read.parquet(probe_paths[s])
        n_probes = df.count()
        t = {"udf": [], "sql": []}
        for _ in range(reps):
            for lane in ("udf", "sql"):
                reclaim(spark)
                t0 = time.time()
                res = (
                    filt.contains_broadcast(df, "key")
                    if lane == "udf"
                    else filt.contains_sql(df, "key")
                )
                res.filter(F.col("member")).count()
                t[lane].append(round(time.time() - t0, 3))
        results[s] = {
            "n_probes": n_probes,
            **{
                f"{lane}_best_s": min(ts) for lane, ts in t.items()
            },
            **{
                f"{lane}_probes_per_sec": round(n_probes / min(ts))
                for lane, ts in t.items()
            },
            "times": t,
        }
        print(f"# {s}: {json.dumps(results[s])}", flush=True)

    print(json.dumps(results), flush=True)

    lines = [
        "",
        MARKER,
        "## Round 5: contains_sql crossover sweep (VERDICT r4 task 7)",
        "",
        "Same session, same built filter (%d keys @0.95 load, c%d), "
        "interleaved reps (7 for sizes <= 1e6, else 3), best-of-reps; "
        "probes half resident / half disjoint negatives. "
        "`scripts/contains_crossover.py`." % (n_keys, cpus),
        "",
        "| probes | UDF lane best | SQL lane best | UDF probes/s "
        "| SQL probes/s | winner |",
        "|---|---|---|---|---|---|",
    ]
    for s, r in results.items():
        win = "UDF" if r["udf_best_s"] <= r["sql_best_s"] else "SQL"
        lines.append(
            f"| {r['n_probes']:,} | {r['udf_best_s']} s | "
            f"{r['sql_best_s']} s | {r['udf_probes_per_sec']:,} | "
            f"{r['sql_probes_per_sec']:,} | {win} |"
        )
    table = "\n".join(lines)
    if write_notes:
        notes = os.path.join(REPO, "BENCH", "NOTES.md")
        cur = open(notes).read() if os.path.exists(notes) else ""
        if MARKER in cur:
            print("# NOTES.md already has the crossover table; "
                  "printing only", flush=True)
        else:
            with open(notes, "a") as f:
                f.write(table + "\n")
    print(table, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
