#!/usr/bin/env python
"""Isolate the generation stage's 8v32 scaling: full output vs hash-only
output (no strings cross Python->JVM), at one parallelism level per
process. Usage: profile_gen.py CPUS [reps] [--hash-only]
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
    hash_only = "--hash-only" in sys.argv
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    from crawlers_spark.functions.hashing import fnv64, pmod_bucket
    from crawlers_spark.functions.urls import canon_arr
    from crawlers_spark.sources.synthweb import SynthWebConfig, seed_urls_arr

    p = CRAWL_BENCH
    _use_tmpfs_local_dir()
    spark = _get_spark(cpus, shuffle=p["n_host_buckets"], extra_conf=CRAWL_BENCH_CONF)
    web = SynthWebConfig(n_hosts=p["n_hosts"], base_pages=p["base_pages"])
    n_host_buckets = p["n_host_buckets"]

    def gen_full(batches):
        for rb in batches:
            rank = rb.column("id").to_numpy()
            canon, host = canon_arr(seed_urls_arr(web, rank))
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(canon, pa.string()),
                    pa.array(fnv64(canon)),
                    pa.array(pmod_bucket(fnv64(host), n_host_buckets)),
                    pa.array(rank),
                ],
                names=["url_canon", "url_hash", "host_bucket", "priority"],
            )

    def gen_hash(batches):
        for rb in batches:
            rank = rb.column("id").to_numpy()
            canon, host = canon_arr(seed_urls_arr(web, rank))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(fnv64(canon)),
                    pa.array(pmod_bucket(fnv64(host), n_host_buckets)),
                    pa.array(rank),
                ],
                names=["url_hash", "host_bucket", "priority"],
            )

    out = {"cpus": cpus, "hash_only": hash_only, "walls": []}
    fn = gen_hash if hash_only else gen_full
    schema = (
        "url_hash long, host_bucket int, priority long"
        if hash_only
        else "url_canon string, url_hash long, host_bucket int, priority long"
    )
    for _ in range(reps):
        t0 = time.monotonic()
        rng = spark.range(0, p["n_candidates"], 1, cpus * 4)
        rng.mapInArrow(fn, schema=schema).agg(F.expr("bit_xor(url_hash)")).collect()
        out["walls"].append(round(time.monotonic() - t0, 2))
    out["min"] = min(out["walls"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
