"""Local mimic of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the
given sf, compare row count, schema (column names), and
order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir]
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [no oracle]")
            if len(rows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [c for c in ores.columns]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            failures += 1
            continue
        ok_schema = sorted(c.lower() for c in cols) == sorted(
            c.lower() for c in ocols
        )
        ok_count = len(rows) == len(orows)
        a = frame_fingerprint([c.lower() for c in cols], rows)
        b = frame_fingerprint([c.lower() for c in ocols], orows)
        ok_vals = a == b
        status = "OK  " if (ok_schema and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(rows)}/{len(orows)} "
              f"schema={ok_schema} values={ok_vals} ({dt:.1f}s)")
        if not ok_vals and ok_count and ok_schema:
            for x, y in zip(a, b):
                if x != y:
                    print(f"      spark: {x[:160]}")
                    print(f"      duck : {y[:160]}")
                    break
    print(f"\n{len(qs)} queries, {failures} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
