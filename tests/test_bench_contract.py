"""Driver-contract guard for bench.py stdout.

Round 3 shipped `BENCH_r03.json parsed: null` because the single output
line outgrew the driver's tail capture. The contract is: the FINAL
stdout line is one compact JSON object with metric/value/unit/queries/sf
and one numeric entry per HEADLINE query; bulky detail goes to earlier
lines / BENCH_DETAIL.json. This test runs the real bench entrypoint as a
subprocess (scaling skipped, sf0.001) and parses exactly what the driver
parses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_final_stdout_line_is_compact_headline_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_SCALING="0",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing to stdout"
    final = lines[-1]
    # the driver tail-captures; keep the final line comfortably small
    assert len(final) < 8192, f"final line too long ({len(final)} bytes)"
    obj = json.loads(final)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in obj, f"missing {key!r} in final bench line"
    assert obj["unit"] == "sec"
    assert isinstance(obj["value"], (int, float)) and obj["value"] > 0
    from bench import HEADLINE

    assert set(obj["queries"]) == set(HEADLINE)
    assert all(
        isinstance(v, (int, float)) and v >= 0 for v in obj["queries"].values()
    )
    assert abs(sum(obj["queries"].values()) - obj["value"]) < 0.01
