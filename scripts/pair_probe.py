"""Interleaved strong-pair probes for the 2→8 scaling criterion.

The sandbox's absolute throughput drifts up to ~2x between
invocations minutes apart, so the two sides of a strong-scaling
ratio must be sampled in ADJACENT time windows: each pass runs one
single-rep bench at local[8] then one at local[2] back-to-back and
appends both to BENCH/scaling_runs.jsonl. Regenerate the merged
tables afterwards with `python scripts/scaling_bench.py
--merge-only`.

Usage: python scripts/pair_probe.py [passes] [n_keys]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import append_history, run


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 15938355
    suffix = sys.argv[3] if len(sys.argv) > 3 else ""
    reps = int(os.environ.get("PAIR_PROBE_REPS", "1"))
    for i in range(passes):
        rec8 = run(8, n_keys, reps=reps)
        rec2 = run(2, n_keys, reps=reps)
        append_history({"c8" + suffix: rec8, "c2" + suffix: rec2})
        print(
            f"pass {i}: c8 ins={rec8['inserts_per_sec']:,} "
            f"bucketed={rec8['inserts_bucketed_per_sec']:,} "
            f"q={rec8['queries_per_sec']:,} del={rec8['deletes_per_sec']:,} | "
            f"c2 ins={rec2['inserts_per_sec']:,} "
            f"bucketed={rec2['inserts_bucketed_per_sec']:,} "
            f"q={rec2['queries_per_sec']:,} del={rec2['deletes_per_sec']:,}",
            flush=True,
        )


if __name__ == "__main__":
    main()
