"""spark-submit entry point: build → probe → delete → metrics.

The north_rule's deployment shape: ``spark-submit --py-files
dist/cuckoo_filter_spark.zip scripts/submit_job.py`` on a
multi-executor cluster. The script takes its SparkSession from the
environment (so ``--master``/``--num-executors``/``--conf`` flags
control the cluster shape), builds the sharded filter over the repo
table, probes every key plus disjoint negatives, deletes a sample,
and prints one JSON line with throughput + correctness metrics.

Run locally without spark-submit too: ``python scripts/submit_job.py
--sf-dir /root/testdata/sf0.001`` (falls back to local[4]).
"""

import argparse
import json
import os
import sys
import time

try:  # under spark-submit the package arrives via --py-files
    import cuckoo_filter_spark  # noqa: F401
except ImportError:  # plain-python runs import from the checkout
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if REPO not in sys.path:
        sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--num-shards", type=int, default=0,
                    help="0 = 2x defaultParallelism")
    ap.add_argument("--delete-fraction", type=float, default=0.25)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName("cuckoo-filter-spark-job")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from cuckoo_filter_spark.config import CuckooConfig
    from cuckoo_filter_spark.hashing import content_key_expr
    from cuckoo_filter_spark.operators.membership import ShardedCuckooFilter

    cfg = CuckooConfig()
    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .select(F.col("doc_id"), content_key_expr("text").alias("key"))
    )
    n = docs.count()
    num_shards = args.num_shards or max(
        16, 2 * spark.sparkContext.defaultParallelism
    )

    t0 = time.time()
    filt = ShardedCuckooFilter.build(
        docs, "key", int(n * 1.5), num_shards, cfg
    ).persist()
    m = filt.metrics().collect()[0]
    t_build = time.time() - t0

    t0 = time.time()
    n_member = (
        filt.contains_broadcast(docs.select("key"), "key")
        .filter(F.col("member")).count()
    )
    t_probe = time.time() - t0

    t0 = time.time()
    _, newf = filt.delete(
        docs.select("key").sample(args.delete_fraction, seed=7),
        per_key=False,
    )
    n_deleted = newf.delete_success_count()
    t_delete = time.time() - t0
    newf.release()

    print(json.dumps({
        "rows": n,
        "num_shards": num_shards,
        "occupied": m["occupied"],
        "insert_failures": m["failures"],
        "members_found": n_member,
        "zero_false_negatives": bool(n_member >= m["occupied"]),
        "deleted": n_deleted,
        "build_sec": round(t_build, 3),
        "probe_sec": round(t_probe, 3),
        "delete_sec": round(t_delete, 3),
        "master": spark.sparkContext.master,
        "parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
