"""Skew behavior of the politeness scheduler: a mega-host frontier.

The reference's world is perfectly skewed (one site per crawler file);
the engine's salted two-phase top-k must (a) produce exactly the same
schedule as a naive single window, (b) bound phase-1 survivor counts so
no task ever sorts more than salt_slices x budget rows of one host.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from crawlers_spark.operators.scheduler import SchedulerConfig, schedule_generation


@pytest.fixture(scope="module")
def skewed(spark):
    n = 50_000
    rng = np.random.RandomState(7)
    # 90% of URLs on one mega-host, the rest across 50 small hosts
    hosts = np.where(rng.rand(n) < 0.9, "mega.test",
                     pd.Series(rng.randint(0, 50, n)).map(lambda i: f"s{i}.test"))
    pdf = pd.DataFrame(
        {
            "url_canon": [f"http://{h}/p/{i}" for i, h in enumerate(hosts)],
            "url_hash": rng.randint(-(2**62), 2**62, n),
            "host": hosts,
            "host_bucket": np.zeros(n, np.int32),
            "priority": np.arange(n, dtype=np.int64),
            "generation": np.zeros(n, np.int32),
        }
    )
    frontier = spark.createDataFrame(pdf)
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["mega.test"],
                "crawl_delay_ms": [500],
                "max_per_generation": [40],
                "disallow_prefixes": [[]],
            }
        )
    )
    return frontier, robots


def test_salted_matches_naive_schedule(spark, skewed):
    frontier, robots = skewed
    cfg = SchedulerConfig(salt_slices=8)
    sched, deferred, dis = schedule_generation(frontier, robots, cfg)
    got = {
        (r["url_hash"], r["host_rank"])
        for r in sched.select("url_hash", "host_rank").collect()
    }
    # naive single-window reference
    w = Window.partitionBy("host").orderBy("priority", "url_hash")
    joined = frontier.join(F.broadcast(robots), "host", "left").withColumn(
        "max_per_generation", F.coalesce("max_per_generation", F.lit(cfg.default_budget))
    )
    naive = (
        joined.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= F.col("max_per_generation"))
    )
    want = {
        (r["url_hash"], r["host_rank"])
        for r in naive.select("url_hash", "host_rank").collect()
    }
    assert got == want
    # nothing lost: scheduled + deferred + disallowed == frontier
    assert sched.count() + deferred.count() + dis.count() == frontier.count()


def test_offsets_follow_crawl_delay(spark, skewed):
    frontier, robots = skewed
    sched, _, _ = schedule_generation(frontier, robots, SchedulerConfig(salt_slices=8))
    mega = (
        sched.filter(F.col("host") == "mega.test")
        .orderBy("host_rank")
        .select("host_rank", "fetch_offset_ms")
        .collect()
    )
    assert len(mega) == 40
    assert all(r["fetch_offset_ms"] == (r["host_rank"] - 1) * 500 for r in mega)
