#!/usr/bin/env python
"""Stage breakdown of run_crawl_bench's TIMED path at one level, with
the exact same setup (pre-bucketed state, blobs, CRAWL_BENCH_CONF).

Stages per rep:
  gen    — distributed_candidates forced with a hash-only agg
  fused  — gen + exchange + fused cogroup + count (the bench's timed op)
Prints one JSON line.
Usage: profile_bench_stages.py CPUS [reps] [emit_strings] [executors]
(executors > 0 switches to local-cluster[E,4,6144] — CPUS is ignored
and becomes E*4, matching bench.run_crawl_bench.)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CRAWL_BENCH, CRAWL_BENCH_CONF, _get_spark, _use_tmpfs_local_dir  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    emit_strings = sys.argv[3] if len(sys.argv) > 3 else "all"
    executors = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    from pyspark.sql import functions as F

    from crawlers_spark.operators.fused_schedule import (
        build_host_bucket_blobs,
        fused_filter_schedule,
        robots_state,
        seen_state,
    )
    from crawlers_spark.operators.scheduler import SchedulerConfig
    from crawlers_spark.operators.seen_set import BloomParams
    from crawlers_spark.plans.crawl import prepare_frontier
    from crawlers_spark.sources.synthweb import (
        SynthWebConfig,
        distributed_candidates,
        distributed_seed_urls,
        robots_pdf,
    )

    p = CRAWL_BENCH
    _use_tmpfs_local_dir()
    conf = dict(CRAWL_BENCH_CONF)
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if extra:
        conf.update(json.loads(extra))
    master = None
    if executors > 0:
        cpus = executors * 4
        mem = os.environ.get("SPARK_GRAFT_CLUSTER_MEM", "12288")
        master = f"local-cluster[{executors},4,{mem}]"
    spark = _get_spark(cpus, shuffle=p["n_host_buckets"], extra_conf=conf,
                       master=master)
    web = SynthWebConfig(n_hosts=p["n_hosts"], base_pages=p["base_pages"])
    robots = robots_pdf(web)
    params = BloomParams.size_for(p["n_preseen"] * 2, n_buckets=p["n_host_buckets"])
    preseen_urls = distributed_seed_urls(
        spark, web, p["n_preseen"], start=p["n_candidates"]
    )
    preseen = prepare_frontier(preseen_urls, p["n_host_buckets"])
    exact = (
        preseen.select("url_hash", "host_bucket")
        .repartition(p["n_host_buckets"], "host_bucket")
        .persist()
    )
    exact.count()
    blobs = build_host_bucket_blobs(exact, params)
    state = (
        seen_state(exact)
        .unionByName(robots_state(spark, robots, p["n_host_buckets"]))
        .repartition(p["n_host_buckets"], "host_bucket")
        .persist()
    )
    state.count()

    out = {"cpus": cpus, "executors": executors, "emit_strings": emit_strings,
           "gen": [], "fused": []}
    for _ in range(reps):
        t0 = time.monotonic()
        raw = distributed_candidates(
            spark, web, p["n_candidates"], p["n_host_buckets"], partitions=cpus * 4
        )
        raw.agg(F.expr("bit_xor(url_hash)")).collect()
        out["gen"].append(round(time.monotonic() - t0, 2))

        t0 = time.monotonic()
        raw = distributed_candidates(
            spark, web, p["n_candidates"], p["n_host_buckets"], partitions=cpus * 4
        )
        full = fused_filter_schedule(
            spark, raw, None, robots, SchedulerConfig(), blobs=blobs, params=params,
            n_host_buckets=p["n_host_buckets"], state=state,
            emit_strings=emit_strings,
        )
        full.filter("status = 'scheduled'").count()
        out["fused"].append(round(time.monotonic() - t0, 2))

    out["gen_min"] = min(out["gen"])
    out["fused_min"] = min(out["fused"])
    out["sched_est"] = round(out["fused_min"] - out["gen_min"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
