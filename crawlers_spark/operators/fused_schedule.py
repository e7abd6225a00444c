"""Fused bucket-local frontier step: dedup + seen-filter + politeness
schedule in ONE exchange.

The composed path (plans/crawl.py) expresses the frontier step as four
Catalyst operators — dedup ``groupBy(url_hash)``, Bloom UDF, exact
``left_anti`` join, two ranking windows — which costs four shuffles of the
candidate set. But every one of those operators keys on something that is
constant within a ``host_bucket``: spellings of the same URL share a host
(canonicalization fixes the spelling, not the site), the seen-set shard
and Bloom blob are per-bucket, and the politeness top-k partitions by
host. So the whole step runs bucket-locally:

    candidates ──exchange(host_bucket)──┐
                                        ├─ cogroup.applyInPandas ──> rows
    exact seen (pre-bucketed, persisted)┘       (numpy kernels)

with per-bucket work all vectorized numpy/pandas: sort-dedup keeping min
priority, Bloom membership (broadcast blob dict), exact rescue via
``searchsorted`` on the cogrouped shard, robots disallow prefixes,
per-host priority rank -> budget cut + crawl-delay offsets.

This is the 10^10-scale layout from BASELINE.json north_star — "one
filter per hash-bucketed partition", politeness "enforced per partition" —
and it is equivalence-tested against the composed operator chain
(tests/test_fused_schedule.py). Skew note: a mega-host concentrates its
URLs in one bucket; buckets are bounded by ``n_host_buckets`` sizing and
AQE skew-split handles stragglers, with the composed (salted-window) path
as the fallback for pathological single-host skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .scheduler import SchedulerConfig
from .seen_set import BloomParams, bloom_build_blob, bloom_test_blob

OUT_SCHEMA = (
    "url_hash long, url_canon string, host string, host_bucket int, priority long, "
    "status string, host_rank int, fetch_offset_ms long"
)


def build_host_bucket_blobs(
    seen: DataFrame, params: BloomParams, hash_col: str = "url_hash"
) -> dict[int, bytes]:
    """One Bloom blob per host_bucket from a (url_hash, host_bucket) table."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = bloom_build_blob(pdf[hash_col].to_numpy(np.int64), params)
        return pd.DataFrame(
            {"host_bucket": [int(pdf["host_bucket"].iloc[0])], "filter": [blob]}
        )

    rows = (
        seen.select(hash_col, "host_bucket")
        .groupBy("host_bucket")
        .applyInPandas(build, schema="host_bucket int, filter binary")
        .collect()
    )
    return {r["host_bucket"]: bytes(r["filter"]) for r in rows}


def fused_filter_schedule(
    spark: SparkSession,
    candidates: DataFrame,
    exact: DataFrame,
    blobs: dict[int, bytes],
    robots: pd.DataFrame,
    params: BloomParams,
    cfg: SchedulerConfig = SchedulerConfig(),
) -> DataFrame:
    """candidates (url_hash,url_canon,host,host_bucket,priority) × exact
    (url_hash,host_bucket) → rows with status ∈ scheduled|deferred|disallowed.

    Already-seen candidates are dropped; surviving rows are exactly the
    "new" set (scheduled ∪ deferred = next seen-set delta)."""
    blobs_bc = spark.sparkContext.broadcast(blobs)
    rb = robots.set_index("host")
    delays = rb["crawl_delay_ms"].to_dict()
    budgets = rb["max_per_generation"].to_dict()
    disallow = {h: v for h, v in rb["disallow_prefixes"].items() if len(v)}
    robots_bc = spark.sparkContext.broadcast((delays, budgets, disallow))
    default_delay, default_budget = cfg.default_delay_ms, cfg.default_budget

    def run(cand: pd.DataFrame, exact_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return pd.DataFrame(
                columns=["url_hash", "url_canon", "host", "host_bucket", "priority",
                         "status", "host_rank", "fetch_offset_ms"]
            )
        b = int(cand["host_bucket"].iloc[0])
        delays, budgets, disallow = robots_bc.value

        # 1. spelling-dedup: keep min priority per url_hash
        cand = cand.sort_values(["url_hash", "priority"], kind="stable").drop_duplicates(
            "url_hash"
        )

        # 2. Bloom membership + exact rescue (searchsorted on the shard)
        h = cand["url_hash"].to_numpy(np.int64)
        maybe = bloom_test_blob(h, blobs_bc.value.get(b), params)
        keep = np.ones(len(cand), bool)
        ex = np.sort(exact_pdf["url_hash"].to_numpy(np.int64)) if len(exact_pdf) else None
        pos = np.flatnonzero(maybe)
        if len(pos) and ex is not None and len(ex):
            idx = np.clip(np.searchsorted(ex, h[pos]), 0, len(ex) - 1)
            keep[pos[ex[idx] == h[pos]]] = False
        cand = cand.loc[keep]
        if len(cand) == 0:
            return pd.DataFrame(
                columns=["url_hash", "url_canon", "host", "host_bucket", "priority",
                         "status", "host_rank", "fetch_offset_ms"]
            )

        # 3. robots disallow prefixes (per-host loop: few hosts per bucket)
        blocked = np.zeros(len(cand), bool)
        hosts = cand["host"].to_numpy()
        for hst in np.unique(hosts):
            prefixes = disallow.get(hst)
            if not prefixes:
                continue
            mask = hosts == hst
            path = (
                cand.loc[mask, "url_canon"]
                .str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "", regex=True)
            )
            hit = np.zeros(mask.sum(), bool)
            for pfx in prefixes:
                hit |= path.str.startswith(pfx).to_numpy()
            blocked[mask] = hit

        # 4. per-host priority rank over allowed rows -> budget + offsets
        cand = cand.assign(__blocked=blocked)
        allowed = cand.loc[~cand["__blocked"]].sort_values(
            ["host", "priority", "url_hash"], kind="stable"
        )
        rank = (allowed.groupby("host", sort=False).cumcount() + 1).to_numpy()
        budget = allowed["host"].map(lambda x: budgets.get(x, default_budget)).to_numpy()
        delay = allowed["host"].map(lambda x: delays.get(x, default_delay)).to_numpy()
        sched = rank <= budget
        out_allowed = allowed.assign(
            status=np.where(sched, "scheduled", "deferred"),
            host_rank=rank.astype(np.int32),
            fetch_offset_ms=np.where(sched, (rank - 1) * delay, 0).astype(np.int64),
        )
        out_blocked = cand.loc[cand["__blocked"]].assign(
            status="disallowed", host_rank=0, fetch_offset_ms=0
        )
        out = pd.concat([out_allowed, out_blocked], ignore_index=True)
        return out[["url_hash", "url_canon", "host", "host_bucket", "priority",
                    "status", "host_rank", "fetch_offset_ms"]]

    return (
        candidates.select("url_hash", "url_canon", "host", "host_bucket", "priority")
        .groupBy("host_bucket")
        .cogroup(exact.select("url_hash", "host_bucket").groupBy("host_bucket"))
        .applyInPandas(run, schema=OUT_SCHEMA)
    )
