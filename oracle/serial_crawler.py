"""Serial reference-semantics crawler — the golden oracle (test-only).

Mimics the reference's execution model faithfully (SURVEY.md §5.3): one
Python process, seeds visited in seed order, per-host FIFO with page-cap
budgets and crawl-delay pacing, dedup-before-enqueue, cron-style
generations. Per-row Python is allowed HERE (it is the point); the
engine under test must reproduce this crawl order, seen-set and payloads
exactly while running data-parallel.

Shares only the pure deterministic kernels with the engine
(canon_urls/fnv64/synthweb), never its Spark operators.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from crawlers_spark.functions.hashing import fnv64, pmod_bucket
from crawlers_spark.functions.urls import canon_urls, url_host
from crawlers_spark.operators.scheduler import SchedulerConfig
from crawlers_spark.sources.synthweb import SynthWebConfig, fetch_pages_pdf, robots_pdf


@dataclass
class OracleResult:
    # one row per scheduled fetch, in exact crawl order
    crawl_log: pd.DataFrame  # generation, priority, order_rank, url_canon, url_hash, ok
    seen_hashes: set[int]
    pages: pd.DataFrame  # image_id, url_canon, caption, fmt, w, h, phash, bytes_pristine
    metrics: pd.DataFrame = field(default_factory=pd.DataFrame)


def crawl_serial(
    web: SynthWebConfig,
    seeds: pd.DataFrame,  # url, seed_rank
    sched: SchedulerConfig = SchedulerConfig(),
    robots: pd.DataFrame | None = None,
    n_host_buckets: int = 32,
    max_generations: int = 50,
    max_retries: int = 0,
    total_budget_per_host: int | None = None,
) -> OracleResult:
    robots = robots if robots is not None else robots_pdf(web)
    rob = robots.set_index("host")

    canon = canon_urls(seeds["url"])
    hashes = fnv64(canon)
    hosts = url_host(canon)
    # (priority, url_canon, url_hash, host, attempt)
    frontier: list[tuple[int, str, int, str, int]] = []
    seen: set[int] = set()
    for rank, (u, h, ho) in enumerate(zip(canon, hashes, hosts)):
        if int(h) not in seen:
            seen.add(int(h))
            frontier.append((int(seeds["seed_rank"].iloc[rank]), u, int(h), ho, 0))
    next_priority = (max(p for p, *_ in frontier) + 1) if frontier else 0

    log_rows, page_rows, metric_rows = [], [], []
    host_spent: dict[str, int] = {}
    order_rank = 0
    for g in range(max_generations):
        if not frontier:
            break
        # politeness: disallow filter, per-host FIFO budget in priority order
        scheduled: list[tuple[int, str, int, str, int]] = []
        deferred: list[tuple[int, str, int, str, int]] = []
        per_host_taken: dict[str, int] = {}
        n_disallowed = 0
        for item in sorted(frontier, key=lambda t: t[0]):
            prio, u, h, ho, att = item
            if ho in rob.index:
                budget = int(rob.loc[ho, "max_per_generation"])
                prefixes = rob.loc[ho, "disallow_prefixes"]
            else:
                budget, prefixes = sched.default_budget, []
            if total_budget_per_host is not None:
                budget = min(
                    budget, max(0, total_budget_per_host - host_spent.get(ho, 0))
                )
            path = "/" + u.split("://", 1)[1].split("/", 1)[1] if "/" in u.split("://", 1)[1] else "/"
            if any(path.startswith(p) for p in prefixes):
                n_disallowed += 1
                continue
            if per_host_taken.get(ho, 0) < budget:
                per_host_taken[ho] = per_host_taken.get(ho, 0) + 1
                scheduled.append(item)
            else:
                deferred.append(item)

        for _, _, _, ho, _ in scheduled:
            host_spent[ho] = host_spent.get(ho, 0) + 1

        # fetch in global priority order (= reference serial order)
        urls = pd.Series([u for _, u, _, _, _ in scheduled])
        attempts = np.array([a for _, _, _, _, a in scheduled], np.int64)
        mirrored = (
            fetch_pages_pdf(web, urls, mirror=True, attempt=attempts)
            if len(urls) else None
        )
        pristine = (
            fetch_pages_pdf(web, urls, mirror=False, attempt=attempts)
            if len(urls) else None
        )

        discovered: list[tuple[int, int, str]] = []  # (parent_priority, slot, url)
        requeued: list[tuple[int, str, int, str, int]] = []
        n_ok = n_failed = 0
        for i, (prio, u, h, ho, att) in enumerate(scheduled):
            ok = bool(mirrored["ok"].iloc[i])
            log_rows.append((g, prio, order_rank, u, h, ok))
            order_rank += 1
            if ok:
                n_ok += 1
                page_rows.append(
                    (
                        mirrored["image_id"].iloc[i], u,
                        mirrored["caption"].iloc[i], mirrored["fmt"].iloc[i],
                        int(mirrored["w"].iloc[i]), int(mirrored["h"].iloc[i]),
                        int(mirrored["phash"].iloc[i]),
                        pristine["bytes"].iloc[i], mirrored["bytes"].iloc[i],
                    )
                )
                for slot, link in enumerate(mirrored["links"].iloc[i]):
                    discovered.append((prio, slot, link))
            else:
                n_failed += 1
                if att < max_retries:
                    requeued.append((prio, u, h, ho, att + 1))

        # dedup-before-enqueue, first-discovery-wins, then mint priorities
        new_items: list[tuple[int, str, int, str, int]] = []
        batch_seen: set[int] = set()
        for parent_priority, slot, link in discovered:  # already (prio, slot) ordered
            lc = canon_urls(pd.Series([link])).iloc[0]
            lh = int(fnv64(pd.Series([lc]))[0])
            if lh in seen or lh in batch_seen:
                continue
            batch_seen.add(lh)
            new_items.append((next_priority, lc, lh, url_host(pd.Series([lc])).iloc[0], 0))
            next_priority += 1
        seen.update(h for _, _, h, _, _ in new_items)
        metric_rows.append(
            (g, len(scheduled), len(discovered) - len(new_items), n_ok, n_failed, n_disallowed)
        )
        frontier = deferred + new_items + requeued

    crawl_log = pd.DataFrame(
        log_rows, columns=["generation", "priority", "order_rank", "url_canon", "url_hash", "ok"]
    )
    pages = pd.DataFrame(
        page_rows,
        columns=["image_id", "url_canon", "caption", "fmt", "w", "h", "phash",
                 "bytes_pristine", "bytes_mirrored"],
    )
    metrics = pd.DataFrame(
        metric_rows,
        columns=["generation", "scheduled", "deduped", "fetched", "failed", "disallowed"],
    )
    return OracleResult(crawl_log=crawl_log, seen_hashes=seen, pages=pages, metrics=metrics)
