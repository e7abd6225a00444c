#!/usr/bin/env python
"""Job-level profile of q_crawl_pages_by_host (the flagship): count Spark
jobs and their walls for one warm run, via a SparkListener-ish polling of
the status tracker + wall timing around the query.

Usage: profile_flagship.py [CPUS] [REPS]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _get_spark, _use_tmpfs_local_dir  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    _use_tmpfs_local_dir()
    spark = _get_spark(cpus, shuffle=32)
    sc = spark.sparkContext
    from crawlers_spark.queries import q_crawl_pages_by_host
    from crawlers_spark.session import ship_package

    ship_package(spark)
    walls = []
    jobs_before = jobs_after = 0
    for rep in range(reps):
        jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or []) \
            if hasattr(sc.statusTracker(), "getJobIdsForGroup") else 0
        t0 = time.monotonic()
        rows = q_crawl_pages_by_host(spark, "/root/testdata/sf0.1").collect()
        walls.append(round(time.monotonic() - t0, 2))
        jobs_after = int(sc._jsc.sc().dagScheduler().nextJobId())
    print(json.dumps({
        "cpus": cpus, "walls": walls, "wall_min": min(walls),
        "total_jobs_run": jobs_after, "rows": len(rows),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
