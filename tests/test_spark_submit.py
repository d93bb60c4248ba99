"""End-to-end spark-submit deployment test (north_rule shape).

Packages the library with ``scripts/make_pyfiles.py``, then launches
a REAL ``spark-submit --py-files dist/cuckoo_filter_spark.zip``
subprocess — its driver imports the package from the zip, not from
the repo checkout — and checks the job's JSON result line.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_pyfiles(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")
    out_zip = str(tmp_path / "cuckoo_filter_spark.zip")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import make_pyfiles

        make_pyfiles.build(out_zip)
    finally:
        sys.path.pop(0)

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    # drop PYTHONPATH so the package can ONLY come from --py-files
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", out_zip,
         os.path.join(REPO, "scripts", "submit_job.py"),
         "--sf-dir", SF_DIR],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["rows"] > 0
    assert res["insert_failures"] == 0
    assert res["zero_false_negatives"] is True
    assert res["deleted"] > 0
