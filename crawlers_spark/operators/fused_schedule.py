"""Fused bucket-local frontier step: dedup + seen-filter + politeness
schedule in ONE exchange.

The composed path (plans/crawl.py) expresses the frontier step as four
Catalyst operators — dedup ``groupBy(url_hash)``, Bloom UDF, exact
``left_anti`` join, two ranking windows — which costs four shuffles of the
candidate set. But every one of those operators keys on something that is
constant within a ``host_bucket``: spellings of the same URL share a host
(canonicalization fixes the spelling, not the site), the seen-set shard
is per-bucket, and the politeness top-k partitions by host. So the whole
step runs bucket-locally:

    candidates ──exchange(host_bucket)──┐
                                        ├─ cogroup.applyInPandas ──> rows
    exact seen (pre-bucketed, persisted)┘       (numpy kernels)

with per-bucket work all vectorized numpy/pandas: sort-dedup keeping min
priority, exact-seen membership via ``searchsorted`` on the cogrouped
shard (an optional broadcast Bloom blob pre-filters the probe set),
robots disallow prefixes, per-host priority rank -> budget cut +
crawl-delay offsets.

Mixed input: rows flagged ``is_new = false`` are already-minted frontier
rows (deferred from earlier generations) that bypass dedup + seen-filter
but compete in the politeness ranking. Their minted priorities are always
smaller than any future priority, so ranking by ``(is_new, priority,
url_hash)`` — where new rows carry the packed ``(parent_priority, slot)``
discovery key as ``priority`` — produces exactly the per-host order the
composed path gets after global priority minting (rank minting is
monotone in that key; see plans/crawl.py).

This is the 10^10-scale layout from BASELINE.json north_star — "one
filter per hash-bucketed partition", politeness "enforced per partition":
the exact shard is a hash-partitioned state table re-read (never
re-shuffled when persisted with matching partitioning) each generation,
like a stateful stream-stream join. Skew note: a mega-host concentrates
its URLs in one bucket; buckets are bounded by ``n_host_buckets`` sizing
and AQE skew-split handles stragglers, with the composed (salted-window)
path as the fallback for pathological single-host skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import url_host
from .scheduler import SchedulerConfig
from .seen_set import BloomParams, bloom_build_blob, bloom_test_blob

OUT_COLS = ["url_hash", "url_canon", "host", "host_bucket", "priority",
            "is_new", "retry_count", "status", "host_rank", "fetch_offset_ms"]
OUT_SCHEMA = (
    "url_hash long, url_canon string, host string, host_bucket int, priority long, "
    "is_new boolean, retry_count int, status string, host_rank int, fetch_offset_ms long"
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


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(columns=OUT_COLS)


def fused_filter_schedule(
    spark: SparkSession,
    candidates: DataFrame,
    exact: DataFrame,
    robots: pd.DataFrame,
    cfg: SchedulerConfig = SchedulerConfig(),
    blobs: dict[int, bytes] | None = None,
    params: BloomParams | None = None,
    emit_dropped: bool = False,
    budget_left: dict[str, int] | None = None,
) -> DataFrame:
    """candidates (url_hash,url_canon,host,host_bucket,priority[,is_new]) ×
    exact (url_hash,host_bucket) → rows with status ∈
    scheduled|deferred|disallowed (+ dup|seen when ``emit_dropped``).

    Membership is exact: every new candidate is probed against the
    cogrouped exact shard via ``searchsorted``; a Bloom blob dict (when
    given) only pre-filters the probe set. ``is_new = false`` rows skip
    dedup + membership (they ARE in the seen-set) but keep their claim on
    politeness budget. Surviving new rows (any status but dup/seen) are
    exactly the next seen-set delta.

    The ``host`` column is optional: when absent it is re-derived
    bucket-locally from ``url_canon`` (the identical ``url_host`` kernel
    that produced ``host_bucket``), trading ~20% of the candidate
    exchange's bytes — a host string per row — for a short per-bucket
    regex pass that scales with cores instead of shuffle bandwidth.

    ``budget_left`` (host → remaining lifetime quota) caps this
    generation's per-host budget at ``min(per_gen, remaining)`` — the
    cumulative key-retirement semantics of the reference's daily API
    quotas (/root/reference/youtube/get_youtube_v1.2.py:53-63,
    /root/reference/coinmarketcap/coin_market_cap_api_2.0.py:99-125).
    Broadcast like the robots dicts (a per-host dimension).
    """
    if "is_new" not in candidates.columns:
        candidates = candidates.withColumn("is_new", F.lit(True))
    if "retry_count" not in candidates.columns:
        candidates = candidates.withColumn("retry_count", F.lit(0))
    has_host = "host" in candidates.columns
    blobs_bc = spark.sparkContext.broadcast(blobs) if blobs is not None else None
    rb = robots.set_index("host")
    delays = rb["crawl_delay_ms"].to_dict()
    budgets = rb["max_per_generation"].to_dict()
    disallow = {h: v for h, v in rb["disallow_prefixes"].items() if len(v)}
    robots_bc = spark.sparkContext.broadcast((delays, budgets, disallow))
    left_bc = (
        spark.sparkContext.broadcast(budget_left) if budget_left is not None else None
    )
    default_delay, default_budget = cfg.default_delay_ms, cfg.default_budget

    def run(cand: pd.DataFrame, exact_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return _empty_out()
        if not has_host:
            cand = cand.assign(host=url_host(cand["url_canon"]))
        delays, budgets, disallow = robots_bc.value
        dropped: list[pd.DataFrame] = []

        new = cand.loc[cand["is_new"]]
        byp = cand.loc[~cand["is_new"]]

        # 1. spelling-dedup on new rows: keep min (packed) priority per url
        if len(new):
            order = np.lexsort(
                (new["priority"].to_numpy(), new["url_hash"].to_numpy())
            )
            new = new.iloc[order]
            dup_mask = new["url_hash"].duplicated(keep="first").to_numpy()
            if emit_dropped and dup_mask.any():
                dropped.append(new.loc[dup_mask].assign(status="dup"))
            new = new.loc[~dup_mask]

        # 2. exact membership on new rows: searchsorted on the shard
        #    (optional Bloom blob shrinks the probe set; never the verdict)
        if len(new):
            h = new["url_hash"].to_numpy(np.int64)
            ex = (
                np.sort(exact_pdf["url_hash"].to_numpy(np.int64))
                if len(exact_pdf)
                else None
            )
            seen_mask = np.zeros(len(new), bool)
            if ex is not None and len(ex):
                if blobs_bc is not None and params is not None:
                    b = int(cand["host_bucket"].iloc[0])
                    probe = np.flatnonzero(
                        bloom_test_blob(h, blobs_bc.value.get(b), params)
                    )
                else:
                    probe = np.arange(len(h))
                if len(probe):
                    idx = np.clip(np.searchsorted(ex, h[probe]), 0, len(ex) - 1)
                    seen_mask[probe[ex[idx] == h[probe]]] = True
            if emit_dropped and seen_mask.any():
                dropped.append(new.loc[seen_mask].assign(status="seen"))
            new = new.loc[~seen_mask]

        pool = pd.concat([byp, new], ignore_index=True) if len(byp) else new
        if len(pool) == 0 and not dropped:
            return _empty_out()

        # 3. robots disallow prefixes (per-host loop: few hosts per bucket)
        blocked = np.zeros(len(pool), bool)
        hosts = pool["host"].to_numpy()
        for hst in np.unique(hosts):
            prefixes = disallow.get(hst)
            if not prefixes:
                continue
            mask = hosts == hst
            path = (
                pool.loc[mask, "url_canon"]
                .str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "", regex=True)
            )
            hit = np.zeros(mask.sum(), bool)
            for pfx in prefixes:
                hit |= path.str.startswith(pfx).to_numpy()
            blocked[mask] = hit

        # 4. per-host rank over allowed rows -> budget + offsets. Sorting
        #    by (host, is_new, priority, url_hash) reproduces the final-
        #    priority order: deferred rows' minted priorities precede any
        #    future mint, and new rows' packed keys are mint-monotone.
        #    np.lexsort over factorized host codes (np.unique is sorted,
        #    so codes order == lexicographic host order) avoids the
        #    object-string pandas sort; per-host robots values are looked
        #    up once per DISTINCT host, never per row.
        ap = pool.loc[~blocked]
        uhosts, hcodes = np.unique(ap["host"].to_numpy(), return_inverse=True)
        order = np.lexsort((
            ap["url_hash"].to_numpy(), ap["priority"].to_numpy(),
            ap["is_new"].to_numpy(), hcodes,
        ))
        allowed = ap.iloc[order]
        hc = hcodes[order]
        # per-host rank: positions since the last host-code change
        idx = np.arange(len(hc))
        change = np.empty(len(hc), bool)
        if len(hc):
            change[0] = True
            change[1:] = hc[1:] != hc[:-1]
        starts = np.maximum.accumulate(np.where(change, idx, 0))
        rank = (idx - starts + 1).astype(np.int64)
        u_budget = np.fromiter(
            (budgets.get(h, default_budget) for h in uhosts), np.int64, len(uhosts)
        )
        budget = u_budget[hc]
        if left_bc is not None:
            big = np.iinfo(np.int64).max
            u_left = np.fromiter(
                (left_bc.value.get(h, big) for h in uhosts), np.int64, len(uhosts)
            )
            budget = np.minimum(budget, np.maximum(u_left[hc], 0))
        u_delay = np.fromiter(
            (delays.get(h, default_delay) for h in uhosts), np.int64, len(uhosts)
        )
        delay = u_delay[hc]
        sched = rank <= budget
        parts = [
            allowed.assign(
                status=np.where(sched, "scheduled", "deferred"),
                host_rank=rank.astype(np.int32),
                fetch_offset_ms=np.where(sched, (rank - 1) * delay, 0).astype(np.int64),
            ),
            pool.loc[blocked].assign(status="disallowed", host_rank=0, fetch_offset_ms=0),
        ]
        for d in dropped:
            parts.append(d.assign(host_rank=0, fetch_offset_ms=0))
        out = pd.concat(parts, ignore_index=True)
        return out[OUT_COLS]

    in_cols = ["url_hash", "url_canon", "host_bucket", "priority", "is_new", "retry_count"]
    if has_host:
        in_cols.insert(2, "host")
    return (
        candidates.select(*in_cols)
        .groupBy("host_bucket")
        .cogroup(exact.select("url_hash", "host_bucket").groupBy("host_bucket"))
        .applyInPandas(run, schema=OUT_SCHEMA)
    )
