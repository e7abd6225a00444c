"""Multi-executor (local-cluster) deployment checks.

``local-cluster[E,C,mem]`` is Spark's multi-executor test master: E
SEPARATE executor JVMs with their own task threads, Python UDF workers,
and block managers, shuffling over real sockets — the deployment shape
the north rule's "N vs 4N executors" criterion refers to. These tests
prove (a) the whole frontier step runs there at all (the package ships
to executors via addPyFile, as a spark-submit --py-files launch would),
and (b) the schedule it produces is IDENTICAL to single-JVM local mode
— deployment-mode determinism, the cluster-side twin of the
shuffle-partition determinism sweep.

Both sides run as subprocesses: a SparkSession's master is fixed at
JVM creation, so a second master inside the pytest process would
silently reuse the suite's local session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_crawl(extra: list[str]) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"), "--crawl",
        "--reps", "1", "--candidates", "300000", "--no-fetch",
    ] + extra
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=560, cwd=REPO,
        env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM="8g"),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_fused_schedule_identical_on_local_cluster():
    local = _run_crawl(["--cpus", "8"])
    cluster = _run_crawl(["--executors", "2", "--exec-cores", "4"])
    assert cluster["executors"] == 2
    assert local["scheduled"] > 0
    # bit-identical schedule across single-JVM threads and a real
    # multi-executor cluster with socket shuffle
    assert cluster["scheduled"] == local["scheduled"]


def test_spark_submit_launch_on_local_cluster():
    """The north rule's launch shape, literally: spark-submit --master
    local-cluster[2,4,2048] run_crawl.py — the driver respects the
    launcher-provided master (session factory no longer overrides it)
    and the crawl engine completes generations on real executors."""
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(submit):
        import pytest

        pytest.skip("spark-submit not shipped with this pyspark")
    proc = subprocess.run(
        [submit, "--master", "local-cluster[2,4,2048]",
         "--conf", "spark.ui.enabled=false",
         os.path.join(REPO, "run_crawl.py"),
         "--seeds", "25", "--hosts", "10", "--pages", "40",
         "--generations", "2", "--host-buckets", "8"],
        capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["generations"] == 2 and out["fetched"] > 0
