#!/usr/bin/env python
"""Crawl-LOOP data-size probe (axis B, the full engine path): run the
actual CrawlPlan generation loop — fetch (image synthesis + encode +
phash), link canonization, fused dedup/seen/politeness, priority mint —
over a base synthetic web and a ``factor``x-larger one (hosts AND seeds
scaled), at fixed parallelism, and report per-generation walls plus the
per-URL linearity retention.

Complements bench.py --datasize (which isolates the frontier
mega-generation): this one exercises the loop's checkpoint-free hot
path end-to-end, so any super-linear term in fetch, lineage cuts, or
the per-generation counter jobs shows up here.

Usage: crawl_scale_probe.py [CPUS] [FACTOR] [GENERATIONS]
Prints one JSON line; optionally persists BENCH/crawl_scale.json with
--save.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cpus: int, n_hosts: int, base_pages: int, n_seeds: int,
             generations: int) -> dict:
    """Fresh-JVM crawl loop; returns totals + per-generation walls."""
    from bench import _get_spark, _use_tmpfs_local_dir
    from crawlers_spark.operators.seen_set import BloomParams
    from crawlers_spark.plans.crawl import CrawlConfig, CrawlPlan
    from crawlers_spark.sources.synthweb import SynthWebConfig, make_seed_urls

    _use_tmpfs_local_dir()
    n_buckets = 64
    spark = _get_spark(cpus, shuffle=n_buckets)
    web = SynthWebConfig(n_hosts=n_hosts, base_pages=base_pages)
    cfg = CrawlConfig(
        web=web, bloom=BloomParams.size_for(4 * n_seeds * 16, n_buckets=n_buckets),
        n_host_buckets=n_buckets, max_generations=generations,
    )
    seeds = spark.createDataFrame(make_seed_urls(web, n_seeds))
    t0 = time.monotonic()
    res = CrawlPlan(spark, cfg).run(seeds)
    wall = time.monotonic() - t0
    gen_walls = {
        r["generation"]: r["wall_ms"] / 1000.0
        for r in res.metrics.select("generation", "wall_ms").distinct().collect()
    }
    out = {
        "n_hosts": n_hosts, "n_seeds": n_seeds, "generations": res.generations,
        "scheduled": res.total_scheduled, "fetched": res.total_fetched,
        "wall_s": round(wall, 2),
        "gen_walls_s": {str(g): round(w, 2) for g, w in sorted(gen_walls.items())},
        "urls_per_sec": round(res.total_scheduled / wall, 1),
    }
    spark.stop()
    return out


def main() -> None:
    import subprocess

    args = [a for a in sys.argv[1:] if a != "--save"]
    save = "--save" in sys.argv
    cpus = int(args[0]) if len(args) > 0 else 16
    factor = int(args[1]) if len(args) > 1 else 10
    generations = int(args[2]) if len(args) > 2 else 3
    base = dict(n_hosts=192, base_pages=2000, n_seeds=1536)
    big = dict(n_hosts=base["n_hosts"] * factor, base_pages=2000,
               n_seeds=base["n_seeds"] * factor)

    if os.environ.get("_CRAWL_SCALE_CHILD"):
        p = json.loads(os.environ["_CRAWL_SCALE_CHILD"])
        print(json.dumps(run_once(cpus, p["n_hosts"], p["base_pages"],
                                  p["n_seeds"], generations)))
        return

    # fresh JVM per run, base/big interleaved twice so VM drift cancels
    runs: dict[str, list] = {"base": [], "big": []}
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="24g")
    for _round in range(2):
        for tag, p in (("base", base), ("big", big)):
            env["_CRAWL_SCALE_CHILD"] = json.dumps(p)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                capture_output=True, text=True, timeout=2400, env=env,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            runs[tag].append(json.loads(line))
            time.sleep(5)

    def best(tag: str) -> dict:
        return min(runs[tag], key=lambda r: r["wall_s"])

    b, g = best("base"), best("big")
    out = {
        "cpus": cpus, "factor": factor, "generations": generations,
        "base": b, "big": g,
        "data_ratio": round(g["scheduled"] / max(b["scheduled"], 1), 2),
        "retention": round(g["urls_per_sec"] / b["urls_per_sec"], 3),
        "walls_base": [r["wall_s"] for r in runs["base"]],
        "walls_big": [r["wall_s"] for r in runs["big"]],
    }
    if save:
        import datetime

        out["utc"] = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "crawl_scale.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
