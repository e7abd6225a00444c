"""Structured Streaming surface tests (availableNow triggers)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from crawlers_spark.operators.seen_set import BloomParams
from crawlers_spark.sources.synthweb import SynthWebConfig, make_seed_urls
from crawlers_spark.streaming.micro_batch import stream_crawl, stream_events_daily

SF = "/root/testdata/sf0.001"


def test_stream_events_daily_matches_batch(spark, tmp_path):
    agg = stream_events_daily(spark, SF)
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_daily")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["day"], r["event_type"]): r["n"]
        for r in spark.sql("select * from ev_daily").collect()
    }
    from pyspark.sql import functions as F

    batch = {
        (r["day"], r["event_type"]): r["n"]
        for r in spark.read.parquet(os.path.join(SF, "events.parquet"))
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch


def test_stream_crawl_two_generations(spark, tmp_path):
    web = SynthWebConfig(n_hosts=6, base_pages=30)
    seeds_dir = str(tmp_path / "seeds")
    os.makedirs(seeds_dir)
    # two seed files -> two micro-batch generations
    make_seed_urls(web, 10).to_parquet(os.path.join(seeds_dir, "batch0.parquet"))
    s2 = make_seed_urls(web, 20)
    s2[s2.seed_rank >= 10].to_parquet(os.path.join(seeds_dir, "batch1.parquet"))

    query, state = stream_crawl(
        spark,
        seeds_dir,
        out_dir=str(tmp_path / "pages"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        web=web,
        bloom=BloomParams.size_for(1000, n_buckets=4),
    )
    query.awaitTermination(180)
    assert state.generation >= 1
    assert state.scheduled_total > 0
    pages = spark.read.option("basePath", str(tmp_path / "pages")).parquet(
        str(tmp_path / "pages") + "/generation=*"
    )
    rows = pages.collect()
    assert len(rows) > 0
    assert all(r["bytes"] is not None for r in rows)


def test_stateful_quota_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-host quota state survives a query
    restart via the checkpoint — the second run's scheduling continues
    from (and never exceeds) the quota consumed by the first."""
    import pandas as pd

    from crawlers_spark.sources.synthweb import SynthWebConfig, make_seed_urls
    from crawlers_spark.streaming.micro_batch import stream_politeness_schedule

    web = SynthWebConfig(n_hosts=4, base_pages=200)
    seeds_dir = tmp_path / "seeds"
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    seeds_dir.mkdir()

    all_seeds = make_seed_urls(web, 160)
    all_seeds.iloc[:80].to_parquet(seeds_dir / "batch0.parquet")
    q = stream_politeness_schedule(
        spark, str(seeds_dir), str(out_dir), str(ckpt),
        web=web, total_budget_per_host=30,
    )
    q.awaitTermination(120)
    first = pd.read_parquet(out_dir)
    per_host_1 = first.groupby("host").size()
    assert (per_host_1 <= 30).all()
    assert (first.groupby("host")["host_rank"].max() == per_host_1).all()

    all_seeds.iloc[80:].to_parquet(seeds_dir / "batch1.parquet")
    q2 = stream_politeness_schedule(
        spark, str(seeds_dir), str(out_dir), str(ckpt),
        web=web, total_budget_per_host=30,
    )
    q2.awaitTermination(120)
    both = pd.read_parquet(out_dir)
    per_host = both.groupby("host").size()
    assert (per_host <= 30).all()  # lifetime quota across restarts
    assert len(both) > len(first)  # second batch scheduled something
    # host_rank is a continuous 1..n sequence per host across batches
    for h, grp in both.groupby("host"):
        assert sorted(grp["host_rank"]) == list(range(1, len(grp) + 1))


def test_stream_crawl_processing_time_long_lived(spark, tmp_path):
    """Long-lived trigger: with processingTime the query keeps polling
    for newly landed seed files — a file dropped WHILE the query runs
    becomes the next micro-batch generation (availableNow would have
    drained and stopped). Backs the claim at micro_batch.py module
    docstring; state (seen-set, generation counter) carries across the
    wall-clock-triggered batches."""
    import time

    web = SynthWebConfig(n_hosts=6, base_pages=30)
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    make_seed_urls(web, 10).to_parquet(seeds_dir / "batch0.parquet")

    query, state = stream_crawl(
        spark,
        str(seeds_dir),
        out_dir=str(tmp_path / "pages"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        web=web,
        bloom=BloomParams.size_for(1000, n_buckets=4),
        trigger={"processingTime": "1 second"},
    )
    try:

        def wait_for(gen: int, timeout: float = 90.0) -> None:
            t0 = time.monotonic()
            while state.generation < gen:
                assert query.isActive, query.exception()
                assert time.monotonic() - t0 < timeout, (
                    f"generation {gen} not reached in {timeout}s "
                    f"(at {state.generation})"
                )
                time.sleep(0.5)

        wait_for(1)
        # land a second seed file while the query is live
        s2 = make_seed_urls(web, 20)
        s2[s2.seed_rank >= 10].to_parquet(seeds_dir / "batch1.parquet")
        wait_for(2)
    finally:
        query.stop()
    assert state.generation >= 2
    assert state.scheduled_total > 0
    pages = spark.read.option("basePath", str(tmp_path / "pages")).parquet(
        str(tmp_path / "pages") + "/generation=*"
    )
    assert pages.count() > 0


def test_stream_dedup_exact_across_restarts(spark, tmp_path):
    """Stateful streaming dedup: first-seen fingerprints only, across
    micro-batches AND query restarts (state restored from checkpoint);
    within a batch the min doc_id wins."""
    from crawlers_spark.streaming.micro_batch import stream_dedup_exact

    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # batch 1: "a b" appears twice (doc 2 and 5 -> keep 2); "c d" once
    pd.DataFrame(
        {"doc_id": [5, 2, 3], "text": ["a b", "A  b ", "c d"]}
    ).to_parquet(os.path.join(docs_dir, "b1.parquet"))
    q = stream_dedup_exact(spark, docs_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {2, 3}  # normalized "a b" dup keeps min doc_id

    # batch 2 after restart: one already-seen text, one new
    pd.DataFrame(
        {"doc_id": [9, 10], "text": ["a b", "e f"]}
    ).to_parquet(os.path.join(docs_dir, "b2.parquet"))
    q2 = stream_dedup_exact(spark, docs_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {2, 3, 10}  # doc 9's text was seen in batch 1's state

    # O(batch) state updates: per-fingerprint state rows mean batch 2
    # writes exactly its ONE fresh fingerprint ("e f"), not a rewrite of
    # everything seen so far; total state rows = cumulative distinct (3).
    prog = q2.lastProgress
    ops = prog["stateOperators"] if isinstance(prog, dict) else prog.stateOperators
    assert ops, "expected a stateful operator in progress metrics"
    op = ops[0]
    updated = op["numRowsUpdated"] if isinstance(op, dict) else op.numRowsUpdated
    total = op["numRowsTotal"] if isinstance(op, dict) else op.numRowsTotal
    assert updated == 1, f"state updates must be O(batch): {updated}"
    assert total == 3, f"state rows must be cumulative distinct: {total}"


def test_stream_session_windows_match_batch(spark, tmp_path):
    """Native session windows vs a batch lag-cumsum sessionizer: same
    (user, session_start, n_events) triples. Break rule: gap >= 30 min
    (the window's half-open last+gap bound)."""
    from crawlers_spark.streaming.micro_batch import stream_event_sessions

    agg = stream_event_sessions(spark, SF)
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("select * from ev_sessions").collect()
    }

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(SF, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.col("ts") - F.lag("ts").over(w) >= F.expr("INTERVAL 30 MINUTES"), 1
        ).otherwise(0)
    )
    sess = (
        e.withColumn("brk", brk)
        .withColumn("sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count("*").alias("n_events"),
        )
    )
    want = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in sess.collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream join (view -> purchase within 2h, same user) equals
    the batch interval join on the same file."""
    from crawlers_spark.streaming.micro_batch import stream_view_purchase_join

    j = stream_view_purchase_join(spark, SF)
    q = (
        j.writeStream.format("memory")
        .queryName("vp_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_vp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["t_view"], r["t_purchase"])
        for r in spark.sql("select * from vp_join").collect()
    }

    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(SF, "events.parquet"))
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts").alias("vt")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts").alias("pt")
    )
    want = {
        (r["u"], r["tv"], r["tp"])
        for r in v.join(p, "u")
        .filter(
            (F.col("pt") > F.col("vt"))
            & (F.col("pt") <= F.col("vt") + F.expr("INTERVAL 2 HOURS"))
        )
        .select(
            "u",
            F.date_format("vt", "yyyy-MM-dd HH:mm:ss").alias("tv"),
            F.date_format("pt", "yyyy-MM-dd HH:mm:ss").alias("tp"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_heavy_hitters_grid_matches_batch(spark, tmp_path):
    """Streaming CMS: the reconstructed grid (max count per cell across
    emitted updates) equals the batch-built grid over the union of all
    micro-batches, counts survive a restart, and state stays bounded by
    the fixed grid size."""
    from pyspark.sql import functions as F

    from crawlers_spark.operators.sketches import CMS_D, CMS_W, cms_buckets
    from crawlers_spark.streaming.micro_batch import stream_heavy_hitters

    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["apple banana apple", "cherry banana"]}
    ).to_parquet(os.path.join(docs_dir, "b1.parquet"))
    q = stream_heavy_hitters(spark, docs_dir, out_dir, ckpt)
    q.awaitTermination(120)

    pd.DataFrame(
        {"doc_id": [3], "text": ["apple date date"]}
    ).to_parquet(os.path.join(docs_dir, "b2.parquet"))
    q2 = stream_heavy_hitters(spark, docs_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    got = {
        (r["lane"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(out_dir)
        .groupBy("lane", "bucket")
        .agg(F.max("count").alias("cnt"))
        .collect()
    }
    # batch reference: same cells over the full corpus
    words = (
        spark.read.parquet(docs_dir)
        .select(F.explode(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")).alias("word"))
    )
    want = {
        (r["lane"], r["bucket"]): r["cnt"]
        for r in words.select(
            F.explode(F.array(*[
                F.struct(F.lit(k).alias("lane"),
                         F.expr(cms_buckets("word", k, CMS_W)).alias("bucket"))
                for k in range(CMS_D)
            ])).alias("lb")
        )
        .select("lb.lane", "lb.bucket")
        .groupBy("lane", "bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want

    # fixed-size state: never more rows than the grid has cells; batch 2
    # touches only its own cells (3 distinct words x 4 lanes max)
    prog = q2.lastProgress
    ops = prog["stateOperators"] if isinstance(prog, dict) else prog.stateOperators
    op = ops[0]
    updated = op["numRowsUpdated"] if isinstance(op, dict) else op.numRowsUpdated
    total = op["numRowsTotal"] if isinstance(op, dict) else op.numRowsTotal
    assert total <= CMS_D * CMS_W
    assert updated <= 3 * CMS_D


def test_stream_circuit_breaker_matches_batch_across_restart(spark, tmp_path):
    """Streaming breaker == batch breaker when fed whole-day batches,
    with the probation state (yesterday's badness) surviving a restart:
    day 2 is bad and arrives BEFORE the restart, so day 3's half_open
    must come from checkpointed state."""
    import pandas as pd

    from crawlers_spark.queries import q_error_circuit_breaker
    from crawlers_spark.streaming.micro_batch import stream_circuit_breaker

    events_dir = str(tmp_path / "events.parquet")
    os.makedirs(events_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def day(d, host, types):
        import datetime

        t0 = datetime.datetime(2024, 1, d, 12, 0, 0)
        df = pd.DataFrame(
            {
                "event_id": [d * 100 + host * 10 + i for i in range(len(types))],
                "ts": [t0 + datetime.timedelta(minutes=i) for i in range(len(types))],
                "user_id": [host] * len(types),
                "event_type": types,
                "value": [1.0] * len(types),
                "props": ["{}"] * len(types),
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        return df

    # host 1: good, BAD, good  -> closed, open, half_open
    # host 2: bad, good, good  -> open, half_open, closed
    pd.concat(
        [day(1, 1, ["view", "view", "error"]), day(1, 2, ["error", "view"])]
    ).to_parquet(os.path.join(events_dir, "b1.parquet"))
    q = stream_circuit_breaker(spark, events_dir, out_dir, ckpt)
    q.awaitTermination(120)

    pd.concat(
        [day(2, 1, ["error", "error", "view"]), day(2, 2, ["view", "view", "view"])]
    ).to_parquet(os.path.join(events_dir, "b2.parquet"))
    q2 = stream_circuit_breaker(spark, events_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    # restart boundary here: day-2 badness lives only in the checkpoint
    pd.concat(
        [day(3, 1, ["view", "view"]), day(3, 2, ["view"])]
    ).to_parquet(os.path.join(events_dir, "b3.parquet"))
    q3 = stream_circuit_breaker(spark, events_dir, out_dir, ckpt)
    q3.awaitTermination(120)

    got = {
        (r["host_id"], r["day"]): (r["n_events"], r["n_errors"], r["state"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["host_id"], r["day"]): (r["n_events"], r["n_errors"], r["state"])
        for r in q_error_circuit_breaker(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert got[(1, "2024-01-03")][2] == "half_open"  # state crossed the restart
    assert got[(2, "2024-01-03")][2] == "closed"


def test_stream_rate_shaper_matches_recursion_across_restart(spark, tmp_path):
    """Streaming shaper == the GCRA recursion (and therefore
    q_rate_shaper_delay's window closed form) when fed ordered
    batches, with the ONE-int64 bucket state surviving a restart: a
    burst right before the restart must delay the first post-restart
    request from checkpointed virtual time."""
    import datetime

    import pandas as pd

    from crawlers_spark.streaming.micro_batch import stream_rate_shaper

    events_dir = str(tmp_path / "events.parquet")
    os.makedirs(events_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    T = 1_000_000  # 1 s per request

    def batch(rows):
        df = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [t0 + datetime.timedelta(microseconds=r[1]) for r in rows],
                "user_id": [r[2] for r in rows],
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        return df

    # host 3: spaced arrivals then a tight burst right before restart
    b1 = [(1, 0, 3), (2, 2_500_000, 3), (3, 2_600_000, 3), (4, 2_700_000, 3)]
    # host 7: single slow stream — never delayed
    b1 += [(5, 0, 7), (6, 5_000_000, 7)]
    batch(b1).to_parquet(os.path.join(events_dir, "b1.parquet"))
    q = stream_rate_shaper(spark, events_dir, out_dir, ckpt, t_us=T)
    q.awaitTermination(120)

    # restart boundary: host 3's bucket is 2 requests deep in virtual time
    b2 = [(7, 2_800_000, 3), (8, 20_000_000, 3), (9, 10_000_000, 7)]
    batch(b2).to_parquet(os.path.join(events_dir, "b2.parquet"))
    q2 = stream_rate_shaper(spark, events_dir, out_dir, ckpt, t_us=T)
    q2.awaitTermination(120)

    got = {
        r["event_id"]: r["delay_us"]
        for r in spark.read.parquet(out_dir).collect()
    }

    # reference recursion per host over the full ordered arrival list
    want = {}
    for host in (3, 7):
        v = None
        for eid, a, h in sorted(b1 + b2, key=lambda r: (r[1], r[0])):
            if h != host:
                continue
            want[eid] = 0 if v is None else max(0, v - a)
            v = (a if v is None else max(a, v)) + T
    assert got == want
    # the burst delay crossed the restart via checkpointed state
    assert got[7] > 0
    # and the law: spaced host 7 never waits
    assert got[5] == got[6] == got[9] == 0
