"""Build the --py-files artifact for cluster submission.

north_rule: "run via spark-submit --py-files on a multi-executor
cluster". This zips the ``cuckoo_filter_spark`` package (sources
only, no caches) into ``dist/cuckoo_filter_spark.zip`` so executors
can import it without the package being installed on workers:

    python scripts/make_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/cuckoo_filter_spark.zip \
        scripts/submit_job.py --sf-dir <path>
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "cuckoo_filter_spark")
OUT = os.path.join(REPO, "dist", "cuckoo_filter_spark.zip")


def build(out_path: str = OUT) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
