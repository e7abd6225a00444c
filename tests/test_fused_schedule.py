"""Fused bucket-local frontier step ≡ composed Catalyst operator chain.

The fused cogroup.applyInPandas path (operators/fused_schedule.py) must
produce exactly the same scheduled set, ranks, and offsets as the
composed path (dedup groupBy → SeenSet.filter_new → schedule_generation)
on the same candidates + seen-set + robots."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.fused_schedule import (
    build_host_bucket_blobs,
    fused_filter_schedule,
)
from crawlers_spark.operators.scheduler import SchedulerConfig, schedule_generation
from crawlers_spark.operators.seen_set import BloomParams, SeenSet
from crawlers_spark.plans.crawl import prepare_frontier
from crawlers_spark.sources.synthweb import SynthWebConfig, make_seed_urls, robots_pdf

N_BUCKETS = 16


@pytest.fixture(scope="module")
def setup(spark):
    web = SynthWebConfig(n_hosts=24, base_pages=300)
    params = BloomParams.size_for(20_000, n_buckets=N_BUCKETS)
    seeds = spark.createDataFrame(make_seed_urls(web, 900))
    preseen_urls = spark.createDataFrame(
        make_seed_urls(web, 400).assign(seed_rank=lambda d: d.seed_rank + 3000)
    )
    preseen = prepare_frontier(preseen_urls, N_BUCKETS).persist()
    candidates = prepare_frontier(seeds, N_BUCKETS).persist()
    # raw (un-deduped) candidate spellings for the fused path, which does
    # its own dedup: canonize without the groupBy
    from crawlers_spark.plans.crawl import canonize

    raw = (
        canonize(spark.createDataFrame(make_seed_urls(web, 900)), N_BUCKETS)
        .withColumn("priority", F.col("seed_rank").cast("long"))
        .persist()
    )
    robots = robots_pdf(web)
    return spark, web, params, preseen, candidates, raw, robots


def _composed(spark, params, preseen, candidates, robots):
    seen = SeenSet(spark, params)
    seen.add(preseen)
    new = seen.filter_new(candidates)
    sched, deferred, disallowed = schedule_generation(
        new.withColumn("generation", F.lit(0)),
        spark.createDataFrame(robots),
        SchedulerConfig(),
    )
    return sched, deferred, disallowed


def _fused(spark, params, preseen, raw, robots):
    blobs = build_host_bucket_blobs(preseen, params)
    exact = preseen.select("url_hash", "host_bucket")
    return fused_filter_schedule(
        spark, raw, exact, robots, blobs=blobs, params=params
    )


def test_fused_matches_composed(setup):
    spark, web, params, preseen, candidates, raw, robots = setup
    sched_c, def_c, dis_c = _composed(spark, params, preseen, candidates, robots)
    out_f = _fused(spark, params, preseen, raw, robots).persist()

    comp = {
        (r["url_hash"], r["host_rank"], r["fetch_offset_ms"])
        for r in sched_c.select("url_hash", "host_rank", "fetch_offset_ms").collect()
    }
    fus = {
        (r["url_hash"], r["host_rank"], r["fetch_offset_ms"])
        for r in out_f.filter("status = 'scheduled'").collect()
    }
    assert comp == fus

    # new set (scheduled + deferred) matches the composed new set
    comp_new = {r["url_hash"] for r in sched_c.select("url_hash").collect()} | {
        r["url_hash"] for r in def_c.select("url_hash").collect()
    }
    fus_new = {
        r["url_hash"] for r in out_f.filter("status != 'disallowed'").collect()
    }
    assert comp_new == fus_new

    # disallowed sets match
    dis_comp = {r["url_hash"] for r in dis_c.select("url_hash").collect()}
    dis_fus = {r["url_hash"] for r in out_f.filter("status = 'disallowed'").collect()}
    # composed path drops disallowed AFTER seen-filter too; both sides
    # apply seen-filter first, so the sets are comparable directly
    assert dis_comp == dis_fus


def test_fused_empty_candidates(setup):
    spark, web, params, preseen, _c, _raw, robots = setup
    empty = spark.createDataFrame(
        [], "url_hash long, url_canon string, host string, host_bucket int, priority long"
    )
    out = _fused(spark, params, preseen, empty, robots)
    assert out.count() == 0
