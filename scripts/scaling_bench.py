"""Scaling-efficiency evidence (north_rule: efficiency >= 0.8 from
N to 4N parallelism; sandbox protocol = same job at local[8] vs
local[32] on the same input).

Runs the cuckoo insert/contains/delete workload:
  * strong scaling — identical input (n keys) at 8 and 32 cores;
  * weak scaling — n keys at 8 cores vs 4n keys at 32 cores
    (the reference's weak-scaling protocol,
    multi_gpu_scaling_benchmark.cu:15-43).

Writes BENCH/BASELINE.md with throughputs + efficiencies.

Usage: python scripts/scaling_bench.py [n_keys_base]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_keys: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_KEYS"] = str(n_keys)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_BENCH_REPS", "4")  # noisy-neighbor robust
    # HARD-cap the cpu budget: local[N] only limits Spark task slots,
    # while python workers / JVM service threads would still spread
    # over all machine cores — taskset makes "N executors" honest.
    cmd = ["taskset", "-c", f"0-{cpus - 1}",
           sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else int((1 << 20) * 0.95 * 4)
    runs = {}
    t0 = time.time()
    runs["strong_8"] = run(8, base * 4)
    runs["strong_32"] = run(32, base * 4)
    runs["weak_8"] = run(8, base)
    # weak_32 == strong_32 (4x keys at 4x cores)
    runs["weak_32"] = runs["strong_32"]
    wall = time.time() - t0

    ops = ["inserts_per_sec", "inserts_bucketed_per_sec",
           "queries_per_sec", "deletes_per_sec"]
    lines = [
        "# BENCH/BASELINE.md — throughput + scaling evidence",
        "",
        f"Workload: cuckoo filter (f=16, b=4) build to ~0.95 load, "
        f"batched contains (2x probes, half negative), batched delete "
        f"(50%); sha256-derived keys from the synthetic Iceberg-shaped "
        f"repo table. Strong scaling: {base*4:,} keys at local[8] vs "
        f"local[32]. Weak scaling: {base:,} keys at local[8] vs "
        f"{base*4:,} keys at local[32] (reference protocol, "
        "multi_gpu_scaling_benchmark.cu).",
        "",
        "## Throughput (items/sec)",
        "",
        "| op | local[8] strong | local[32] strong | strong eff "
        "(T8/(4*T32) speedup/4) | local[8] weak | local[32] weak | weak eff |",
        "|---|---|---|---|---|---|---|",
    ]
    effs = {}
    for op in ops:
        s8, s32 = runs["strong_8"][op], runs["strong_32"][op]
        w8, w32 = runs["weak_8"][op], runs["weak_32"][op]
        strong_eff = s32 / (4 * s8)
        weak_eff = w32 / (4 * w8)
        effs[op] = (strong_eff, weak_eff)
        lines.append(
            f"| {op} | {s8:,} | {s32:,} | {strong_eff:.2f} "
            f"| {w8:,} | {w32:,} | {weak_eff:.2f} |"
        )
    lines += [
        "",
        "## Correctness at both sizes",
        "",
        "| metric | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for metric in ["insert_success_rate", "delete_success_rate",
                   "contains_fpr", "load_factor"]:
        lines.append(
            f"| {metric} | {runs['strong_8'][metric]} "
            f"| {runs['strong_32'][metric]} |"
        )
    lines += [
        "",
        f"Raw JSON (strong_8 / strong_32 / weak_8):",
        "```json",
        json.dumps(runs["strong_8"]),
        json.dumps(runs["strong_32"]),
        json.dumps(runs["weak_8"]),
        "```",
        "",
        f"_Total scaling-bench wall time: {wall:.0f}s._",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"efficiencies": {k: [round(a, 3), round(b, 3)]
                                       for k, (a, b) in effs.items()},
                      "wall_sec": round(wall, 1)}))


if __name__ == "__main__":
    main()
