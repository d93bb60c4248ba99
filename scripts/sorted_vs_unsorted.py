"""Sorted vs unsorted insert comparison, mirroring the reference's
``benchmark/cuckoo_sorted_vs_unsorted.cu`` (insertManySorted packs
and radix-sorts (bucketIdx, fp) for coalesced access;
``CuckooFilter.cuh:475-508``). Our in-batch analog sorts the batch
by primary bucket before placement. Writes
BENCH/sorted_vs_unsorted.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuckoo_filter_spark.config import CuckooConfig
from cuckoo_filter_spark.core.cuckoo import CuckooFilter


def main():
    cfg = CuckooConfig(bits_per_tag=16, bucket_size=4)
    rng = np.random.default_rng(42)
    rows = []
    for logn in (16, 18, 20, 22):
        slots = 1 << logn
        n = int(slots * 0.95)
        keys = rng.integers(1, 2**63, n, dtype=np.int64).view(np.uint64)
        res = {}
        for name in ("insert_many", "insert_many_sorted", "adaptive_insert"):
            best = 1e9
            for _ in range(3):
                flt = CuckooFilter(slots, cfg)
                t0 = time.perf_counter()
                ok = getattr(flt, name)(keys)
                best = min(best, time.perf_counter() - t0)
            res[name] = round(n / best)
        rows.append({
            "n": n, "slots": slots,
            "unsorted_per_sec": res["insert_many"],
            "sorted_per_sec": res["insert_many_sorted"],
            "adaptive_per_sec": res["adaptive_insert"],
            "sorted_speedup": round(
                res["insert_many_sorted"] / res["insert_many"], 3
            ),
            "insert_success": float(ok.mean()),
        })
        print(rows[-1])
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/sorted_vs_unsorted.json", "w") as fh:
        json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
