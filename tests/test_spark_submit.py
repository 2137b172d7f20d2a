"""Ship-vehicle smoke test: the north rule names `spark-submit
--py-files sosse_spark.zip` as the deployment path — prove it end to
end: package the zip, submit jobs/crawl_job.py as a SEPARATE Spark
application (its own JVM, importing the engine only from the zip), and
assert the crawl committed resumable snapshots.

Runs at local[2] with a tiny web while the suite's own session is idle
(the documented two-concurrent-sessions hazard is about simultaneously
EXECUTING jobs)."""

import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_round_trip(tmp_path):
    # 1. package
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "jobs", "package.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("sosse_spark.zip") and os.path.exists(zip_path)

    # 2. submit from a cwd WITHOUT the repo on sys.path — the engine
    # must come from --py-files alone
    crawl_root = str(tmp_path / "crawl")
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit, "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        os.path.join(ROOT, "jobs", "crawl_job.py"),
        "--root", crawl_root, "--n-docs", "30", "--n-hosts", "4",
        "--seeds", "2", "11", "--batch-size", "16", "--n-buckets", "4",
        "--max-rounds", "2",
    ]
    run = subprocess.run(
        cmd, capture_output=True, text=True, timeout=480, cwd=str(tmp_path), env=env
    )
    assert run.returncode == 0, run.stderr[-3000:]

    # 3. the job printed per-round metrics JSON and committed snapshots
    metrics = [json.loads(l) for l in run.stdout.splitlines() if l.startswith("{")]
    assert metrics and metrics[0]["round_no"] == 1
    assert os.path.exists(os.path.join(crawl_root, "frontier", "LATEST"))
    assert os.path.exists(os.path.join(crawl_root, "documents"))
