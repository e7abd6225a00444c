"""The generation crawl loop: frontier → schedule → fetch → fan-out.

This is the engine's re-expression of the reference's whole pipeline
shape (SURVEY.md §0): seed scan → paced fetch → flatten → image mirror →
dedup → sink, with cron generations. Serial sleeps become computed
politeness offsets; in-memory dedup lists become the partitioned Bloom +
exact seen-set; the per-seed cursor loop becomes the self-feeding
frontier (discovered links are generation g+1's candidates).

Determinism under parallelism (north_rule "matching the reference's
crawl ordering"): every URL carries an explicit scalar ``priority``
minted by a deterministic global rank over
``(parent_priority, slot, url_hash)`` — crawl order is the total order
``(generation, priority)``, never partition order.

Checkpoint/resume: per generation the frontier, exact seen-set, Bloom
blobs, pages and metrics land under ``checkpoint_dir`` with an
atomically-renamed JSON manifest carrying per-partition lineage
``(generation, host_bucket, filter_epoch)`` — the Parquet+manifest stand-
in for Iceberg snapshots (no Iceberg jars in this sandbox; the layout is
swap-compatible, see sources/tables.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import fnv64
from ..functions.urls import canon_urls, url_host
from ..operators.fused_schedule import (
    STATE_COLS,
    fused_filter_schedule,
    quota_state,
    robots_state,
    seen_state,
)
from ..operators.ranking import global_rank, rank_bucket_expr
from ..operators.scheduler import SchedulerConfig, schedule_generation
from ..operators.seen_set import BloomParams, SeenSet, build_bucket_filters
from ..sources.fetcher import fetch_scheduled
from ..sources.synthweb import SynthWebConfig, robots_pdf

FRONTIER_COLS = ["url_canon", "url_hash", "host", "host_bucket", "priority"]
# slot packing base for the candidates agg: lexicographic (parent, slot)
# min as one long; requires max_links < MAX_LINK_SLOTS
MAX_LINK_SLOTS = 16
PAGES_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
METRICS_SCHEMA = (
    "generation int, host_bucket int, filter_epoch int, scheduled long, deduped long, "
    "fetched long, failed long, wall_ms long"
)


@dataclass
class CrawlConfig:
    web: SynthWebConfig = field(default_factory=SynthWebConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    bloom: BloomParams = field(default_factory=lambda: BloomParams.size_for(100_000))
    n_host_buckets: int = 32
    max_generations: int = 50
    checkpoint_dir: str | None = None
    bloom_broadcast: bool = True
    compact_every: int = 4  # bloom epoch compaction cadence
    # lifetime per-host quota (key-retirement semantics, reference:
    # daily API budgets /root/reference/youtube/get_youtube_v1.2.py:53-63):
    # each generation's per-host budget is capped at the remaining quota;
    # None disables (fused path only)
    total_budget_per_host: int | None = None
    # bounded requeue of failed fetches: a not-ok row re-enters the next
    # generation (same priority, retry_count+1) until max_retries is
    # exhausted (fused path only; reference analog: reconnect-and-retry,
    # /root/reference/worldcup/db/connect_mysql.py:21,50)
    max_retries: int = 0
    # fused=True runs the bucket-local cogroup frontier step (one exchange
    # per generation: dedup + seen-filter + robots + politeness fused,
    # operators/fused_schedule.py); False runs the composed Catalyst chain.
    # Both produce identical crawl order / seen-set / metrics (golden +
    # equivalence tested).
    fused: bool = True
    # mega-host skew escape hatch for the fused path: >1 salts the
    # cogroup key with pmod(url_hash, n_salts), bounding any single
    # Python task at ~1/n_salts of a host's candidates (two-phase exact
    # politeness; see operators/fused_schedule.py docstring). 1 = off.
    n_salts: int = 1
    # auto_salt watches the per-bucket candidate counters the loop already
    # aggregates each generation (zero extra jobs) and raises the salt
    # count for the NEXT generation when one bucket dominates — the
    # one-site-per-crawler shape of the reference (SURVEY.md §4.2) at
    # scale. Salting never changes results (two-phase exact top-k), only
    # the physical task bound, so auto-raising is always safe.
    auto_salt: bool = True
    # scope spark.sql.shuffle.partitions to n_host_buckets and disable
    # AQE for the duration of run() (restored on exit): every exchange
    # in the loop is hand-sized, so the generic shuffle width only adds
    # empty tasks and AQE's stage barrier is pure latency (the crawl
    # bench documents the same protocol). False = leave session as-is.
    scope_session_conf: bool = True


@dataclass
class CrawlResult:
    pages: DataFrame
    metrics: DataFrame
    crawl_log: DataFrame  # every scheduled fetch: (generation, priority, url, ok)
    frontier_final: DataFrame
    seen_exact: DataFrame  # (url_hash, bloom_bucket) — final seen-set membership
    generations: int
    total_fetched: int
    total_scheduled: int
    wall_s: float


from pyspark.sql.types import LongType, StringType  # noqa: E402


@F.pandas_udf(StringType())
def canon_udf(urls: pd.Series) -> pd.Series:
    return canon_urls(urls)


@F.pandas_udf(LongType())
def hash_udf(strings: pd.Series) -> pd.Series:
    return pd.Series(fnv64(strings))


@F.pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return url_host(urls)


def canonize(
    df: DataFrame, n_host_buckets: int, url_col: str = "url", keep_host: bool = True
) -> DataFrame:
    """Append url_canon, url_hash, [host,] host_bucket in ONE Arrow pass.

    Chained scalar pandas UDFs (canon → hash → host → bucket) would cost
    four ArrowEvalPython nodes, i.e. four Python round-trips per batch —
    measured ~2.5x slower on the 4M-URL bench. A single ``mapInArrow``
    runs all four kernels on one batch transfer, and the URL strings stay
    in Arrow buffers throughout (pass-through columns are never converted
    to pandas at all).

    ``keep_host=False`` omits the host string from the output (the fused
    step re-derives it bucket-locally) — the host column would otherwise
    ride the candidate exchange for ~20% extra shuffle bytes.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import pmod_bucket
    from ..functions.urls import canon_arr

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    host_part = "host string, " if keep_host else ""
    schema = f"{fields}, url_canon string, url_hash long, {host_part}host_bucket int"
    in_names = [f.name for f in df.schema.fields]

    def run(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            canon, host = canon_arr(rb.column(in_names.index(url_col)))
            arrays = list(rb.columns)
            names = list(in_names)
            arrays.append(pc.cast(canon, pa.string()))
            names.append("url_canon")
            arrays.append(pa.array(fnv64(canon)))
            names.append("url_hash")
            if keep_host:
                arrays.append(pc.cast(host, pa.string()))
                names.append("host")
            arrays.append(pa.array(pmod_bucket(fnv64(host), n_host_buckets)))
            names.append("host_bucket")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(run, schema=schema)


def prepare_frontier(seeds: DataFrame, n_host_buckets: int) -> DataFrame:
    """Seed rows (url, seed_rank) → canonical frontier, first-rank dedup.

    Reference analog: seed-table scan with in-loop dedup
    (/root/reference/nft/get_opensea_v1.1.py:170-178).
    """
    canon = canonize(seeds, n_host_buckets).withColumn(
        "priority", F.col("seed_rank").cast("long")
    )
    # url_canon/host/host_bucket are functions of url_hash, so including
    # them in the GROUPING KEY keeps the same granularity while the agg
    # buffer stays fixed-width (one long) — codegen'd HashAggregate.
    # (min(struct(strings)) or any_value(string) buffers would silently
    # fall back to SortAggregate.)
    dedup = canon.groupBy("url_hash", "url_canon", "host", "host_bucket").agg(
        F.min("priority").alias("priority")
    )
    return dedup.select("url_hash", "url_canon", "host", "host_bucket", "priority")


def auto_salts(by_bucket: dict[int, int], n_buckets: int, base: int = 1,
               min_total: int = 50_000, trigger_ratio: float = 8.0,
               max_salts: int = 16) -> int:
    """Salt count for the next generation from this generation's
    per-bucket candidate counts: below ``min_total`` rows or below
    ``trigger_ratio``x the mean bucket, stay at ``base``; above, split
    the hot bucket to ~2x the mean (bounded by ``max_salts``)."""
    if not by_bucket:
        return base
    total = sum(by_bucket.values())
    if total < min_total:
        return base
    mean = total / max(1, n_buckets)
    mx = max(by_bucket.values())
    if mx < trigger_ratio * mean:
        return base
    return int(min(max_salts, max(base, round(mx / mean / 2))))


def _counts_by_bucket(df: DataFrame, name: str) -> DataFrame:
    return df.groupBy("host_bucket").agg(F.count("*").alias(name))


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


class CrawlPlan:
    """Drives the generation loop; supports checkpoint/resume."""

    def __init__(self, spark: SparkSession, cfg: CrawlConfig, robots: DataFrame | None = None):
        self.spark = spark
        self.cfg = cfg
        if robots is None:
            self.robots = spark.createDataFrame(robots_pdf(cfg.web))
        else:
            self.robots = robots
        # tagged robots state rows (tag='r'), bucketed like the seen
        # shard; computed once and pinned — the fused path cogroups this
        # DataFrame, it never lives on the driver as dicts
        self._robots_state: DataFrame | None = None

    def _robots_state_df(self) -> DataFrame:
        if self._robots_state is None:
            st = robots_state(self.spark, self.robots, self.cfg.n_host_buckets)
            # a driver-literal robots table (the common case) is a
            # LocalRelation — it unions into each generation's state side
            # for free and pinning it would only add a job; anything with
            # real lineage (a read/join) is checkpointed once so the loop
            # never recomputes it per generation
            try:
                is_local = self.robots.isLocal()
            except Exception:  # noqa: BLE001 — conservative fallback
                is_local = False
            self._robots_state = st if is_local else st.localCheckpoint(eager=True)
        return self._robots_state

    def _state_for(
        self, exact: DataFrame | None, host_spent: DataFrame | None
    ) -> DataFrame:
        st = self._robots_state_df()
        if exact is not None:
            st = seen_state(exact).unionByName(st)
        if host_spent is not None:
            st = st.unionByName(quota_state(host_spent, self.cfg.n_host_buckets))
        return st

    # ---------- checkpoint plumbing ----------
    def _ckpt(self, *parts: str) -> str:
        assert self.cfg.checkpoint_dir
        return os.path.join(self.cfg.checkpoint_dir, *parts)

    def _snapshot(self, gen: int, frontier: DataFrame, seen: SeenSet,
                  next_priority: int, totals: dict, frontier_count: int) -> DataFrame:
        d = self._ckpt(f"gen={gen:05d}")
        frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
        seen.exact.write.mode("overwrite").parquet(os.path.join(d, "seen_exact"))
        seen.filters.write.mode("overwrite").parquet(os.path.join(d, "filters"))
        _atomic_write_json(
            self._ckpt(f"manifest_gen={gen:05d}.json"),
            {
                "generation": gen,
                "next_priority": next_priority,
                "filter_epoch": seen.filter_epoch,
                "totals": totals,
                "frontier_count": frontier_count,
                "lineage": {"host_buckets": self.cfg.n_host_buckets,
                            "bloom_buckets": self.cfg.bloom.n_buckets},
            },
        )
        return self.spark.read.parquet(os.path.join(d, "frontier"))

    def _read_host_spent(self, gen_dir: str, manifest: dict) -> DataFrame | None:
        """Quota ledger for resume: parquet if present, else the legacy
        manifest dict (older checkpoints), else None."""
        p = os.path.join(gen_dir, "host_spent")
        if os.path.isdir(p):
            return self.spark.read.parquet(p)
        legacy = manifest.get("host_spent")
        if legacy:
            pdf = pd.DataFrame(
                {"host": list(legacy.keys()), "spent": list(legacy.values())}
            )
            from ..functions.hashing import fnv64 as _f, pmod_bucket as _p

            pdf["host_bucket"] = _p(_f(pdf["host"]), self.cfg.n_host_buckets)
            return self.spark.createDataFrame(pdf)
        return None

    def latest_manifest(self) -> dict | None:
        if not self.cfg.checkpoint_dir or not os.path.isdir(self.cfg.checkpoint_dir):
            return None
        manifests = sorted(
            f for f in os.listdir(self.cfg.checkpoint_dir) if f.startswith("manifest_gen=")
        )
        if not manifests:
            return None
        with open(self._ckpt(manifests[-1])) as f:
            return json.load(f)

    # ---------- main loop ----------
    def run(self, seeds: DataFrame, resume: bool = False) -> CrawlResult:
        assert self.cfg.web.max_links < MAX_LINK_SLOTS, (
            f"max_links={self.cfg.web.max_links} must stay below "
            f"MAX_LINK_SLOTS={MAX_LINK_SLOTS}: the candidate agg packs "
            "(parent_priority, slot) into one long lexicographically"
        )
        if not self.cfg.scope_session_conf:
            return self._run_dispatch(seeds, resume)
        # Every exchange in the loop is hand-sized to n_host_buckets (the
        # cogroup, the rank, the checkpoint layout), so (a) the session's
        # generic shuffle width only adds empty reduce tasks, and (b)
        # AQE's query-stage materialization barrier is pure latency on
        # this fixed-size workload — the same finding the crawl BENCH
        # documents and configures (BENCH/BASELINE.md, AQE paragraph).
        # Scope both confs to the loop and restore on exit; partition
        # count never changes results (whole-registry
        # parallelism-determinism sweep) and results returned lazily in
        # CrawlResult re-plan under the caller's own confs.
        conf = self.spark.conf
        saved = {k: conf.get(k) for k in (
            "spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")}
        try:
            conf.set("spark.sql.shuffle.partitions",
                     str(self.cfg.n_host_buckets))
            conf.set("spark.sql.adaptive.enabled", "false")
            return self._run_dispatch(seeds, resume)
        finally:
            for k, v in saved.items():
                conf.set(k, v)

    def _run_dispatch(self, seeds: DataFrame, resume: bool = False) -> CrawlResult:
        if self.cfg.fused:
            return self._run_fused(seeds, resume)
        assert self.cfg.max_retries == 0, (
            "failed-fetch requeue is implemented in the fused loop only"
        )
        assert self.cfg.total_budget_per_host is None, (
            "lifetime host quotas are implemented in the fused loop only"
        )
        return self._run_composed(seeds, resume)

    def _run_composed(self, seeds: DataFrame, resume: bool = False) -> CrawlResult:
        spark, cfg = self.spark, self.cfg
        t0 = time.monotonic()
        pages_parts: list[DataFrame] = []
        log_parts: list[DataFrame] = []
        metrics_rows: list[tuple] = []
        totals = {"fetched": 0, "scheduled": 0}

        manifest = self.latest_manifest() if resume else None
        if manifest is not None:
            g0 = manifest["generation"] + 1
            next_priority = manifest["next_priority"]
            d = self._ckpt(f"gen={manifest['generation']:05d}")
            frontier = spark.read.parquet(os.path.join(d, "frontier"))
            seen_tbl = spark.read.parquet(os.path.join(d, "seen_exact"))
            if "tag" in seen_tbl.columns:  # written by the fused loop
                seen_tbl = seen_tbl.filter("tag = 's'").select(
                    "url_hash", "host_bucket", "bloom_bucket"
                )
            seen = SeenSet(
                spark, cfg.bloom,
                exact=seen_tbl,
                filters=spark.read.parquet(os.path.join(d, "filters")),
                filter_epoch=manifest["filter_epoch"],
                use_broadcast=cfg.bloom_broadcast,
            )
            totals = dict(manifest["totals"])
            n_frontier = manifest.get("frontier_count")
            if n_frontier is None:
                n_frontier = frontier.count()
        else:
            g0 = 0
            frontier = prepare_frontier(seeds, cfg.n_host_buckets).persist()
            first = frontier.agg(
                F.max("priority").alias("p"), F.count("*").alias("n")
            ).first()
            next_priority = (first["p"] or 0) + 1
            n_frontier = first["n"]
            seen = SeenSet(spark, cfg.bloom, use_broadcast=cfg.bloom_broadcast)
            if n_frontier:
                seen.add(frontier)

        generations = g0
        for g in range(g0, g0 + cfg.max_generations):
            gen_t0 = time.monotonic()
            if n_frontier == 0:
                break
            gen_frontier = frontier.withColumn("generation", F.lit(g))
            scheduled, deferred, disallowed = schedule_generation(
                gen_frontier, self.robots, cfg.scheduler
            )
            scheduled = scheduled.persist()
            fetched = fetch_scheduled(scheduled, cfg.web).persist()

            pages_g = fetched.filter("ok").select(
                *PAGES_COLS, "generation", "host_bucket", "priority", "url_canon"
            )
            log_g = fetched.select(
                "generation", "priority", "url_canon", "host", "host_bucket", "ok",
                "fetch_offset_ms",
            )

            links = canonize(
                fetched.select(
                    F.col("priority").alias("parent_priority"),
                    F.posexplode_outer("links").alias("slot", "url"),
                ).filter(F.col("url").isNotNull()),
                cfg.n_host_buckets,
            )
            # Lexicographic min over (parent_priority, slot) packed into
            # one long (slot < 16 = MAX_LINK_SLOTS) so the agg buffer is
            # fixed-width → HashAggregate; string cols are functions of
            # url_hash and ride in the grouping key.
            packed = F.col("parent_priority") * MAX_LINK_SLOTS + F.col("slot")
            candidates = (
                links.groupBy("url_hash", "url_canon", "host", "host_bucket")
                .agg(F.min(packed).alias("__pk"))
                .select(
                    "url_hash", "url_canon", "host", "host_bucket",
                    F.expr(f"__pk div {MAX_LINK_SLOTS}").alias("parent_priority"),
                    F.pmod("__pk", F.lit(MAX_LINK_SLOTS)).cast("int").alias("slot"),
                )
            )
            new_rows = seen.filter_new(candidates).persist()
            # global_rank's internal per-partition count collect doubles as
            # the n_new counter — no separate count job.
            # bounds are known by construction (parents were minted below
            # next_priority), so ranking takes the sample-free JVM path
            new_ranked, n_new = global_rank(
                new_rows, ["parent_priority", "slot", "url_hash"], "priority",
                start=next_priority, with_count=True,
                bounds=(0, next_priority),
            )
            new_ranked = new_ranked.persist()
            next_priority += n_new
            if n_new:
                seen.add(new_ranked)

            # ---- one aggregation job yields metrics AND all loop counters
            # (lineage: generation, bucket, epoch)
            m = (
                _counts_by_bucket(scheduled, "scheduled")
                .join(_counts_by_bucket(links, "discovered"), "host_bucket", "full")
                .join(_counts_by_bucket(new_ranked, "new"), "host_bucket", "full")
                .join(_counts_by_bucket(fetched.filter("ok"), "fetched"), "host_bucket", "full")
                .join(_counts_by_bucket(fetched.filter("not ok"), "failed"), "host_bucket", "full")
                .join(_counts_by_bucket(deferred, "deferred"), "host_bucket", "full")
                .fillna(0)
            )
            wall_ms = int((time.monotonic() - gen_t0) * 1000)
            n_sched = n_fetched = n_deferred = 0
            for r in m.collect():
                metrics_rows.append(
                    (g, r["host_bucket"], seen.filter_epoch, r["scheduled"],
                     r["discovered"] - r["new"], r["fetched"], r["failed"], wall_ms)
                )
                n_sched += r["scheduled"]
                n_fetched += r["fetched"]
                n_deferred += r["deferred"]
            totals["scheduled"] += n_sched
            totals["fetched"] += n_fetched
            n_frontier = n_deferred + n_new

            frontier = deferred.select(*FRONTIER_COLS).unionByName(
                new_ranked.select(*FRONTIER_COLS)
            )

            if cfg.checkpoint_dir:
                pages_g.write.mode("overwrite").parquet(self._ckpt(f"gen={g:05d}", "pages"))
                pages_parts.append(spark.read.parquet(self._ckpt(f"gen={g:05d}", "pages")))
                log_g.write.mode("overwrite").parquet(self._ckpt(f"gen={g:05d}", "crawl_log"))
                log_parts.append(spark.read.parquet(self._ckpt(f"gen={g:05d}", "crawl_log")))
                frontier = self._snapshot(g, frontier, seen, next_priority, totals, n_frontier)
                seen.exact = spark.read.parquet(self._ckpt(f"gen={g:05d}", "seen_exact"))
                # (composed snapshots write plain exact rows — no tag col)
                seen.filters = spark.read.parquet(self._ckpt(f"gen={g:05d}", "filters"))
            else:
                pages_parts.append(pages_g.localCheckpoint(eager=True))
                log_parts.append(log_g.localCheckpoint(eager=True))
                frontier = frontier.localCheckpoint(eager=True)
                seen.exact = seen.exact.localCheckpoint(eager=True)
                seen.filters = seen.filters.localCheckpoint(eager=True)

            if (g + 1) % cfg.compact_every == 0:
                seen.compact()

            scheduled.unpersist()
            fetched.unpersist()
            new_rows.unpersist()
            generations = g + 1

        empty_pages = spark.createDataFrame(
            [], schema="image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long, generation int, host_bucket int, "
            "priority long, url_canon string",
        )
        pages = empty_pages
        for p in pages_parts:
            pages = pages.unionByName(p)
        empty_log = spark.createDataFrame(
            [], schema="generation int, priority long, url_canon string, host string, "
            "host_bucket int, ok boolean, fetch_offset_ms long",
        )
        crawl_log = empty_log
        for p in log_parts:
            crawl_log = crawl_log.unionByName(p)
        metrics = spark.createDataFrame(metrics_rows, schema=METRICS_SCHEMA)
        seen.close()
        return CrawlResult(
            pages=pages,
            metrics=metrics,
            crawl_log=crawl_log,
            seen_exact=seen.exact,
            frontier_final=frontier,
            generations=generations,
            total_fetched=totals["fetched"],
            total_scheduled=totals["scheduled"],
            wall_s=time.monotonic() - t0,
        )

    def _bootstrap_schedule(self, frontier, g0, host_spent):
        """Schedule the first generation through the fused op (bypass-only
        input, equivalence-tested against the composed scheduler): one
        exchange instead of the two-window salted top-k chain, and the
        lifetime-quota cap (when configured) applies from generation 0
        exactly like later generations. ``host_spent`` is a small
        (host, host_bucket, spent) DataFrame or None."""
        cfg, spark = self.cfg, self.spark
        boot = fused_filter_schedule(
            spark, frontier.withColumn("is_new", F.lit(False)), None,
            self.robots, cfg.scheduler,
            total_budget_per_host=cfg.total_budget_per_host,
            n_salts=cfg.n_salts,
            state=self._state_for(None, host_spent),
            emit_strings="frontier",
        )
        return (
            boot.filter("status = 'scheduled'").withColumn("generation", F.lit(g0)),
            boot.filter("status = 'deferred'").select(*FRONTIER_COLS),
        )

    # ---------- fused loop ----------
    def _run_fused(self, seeds: DataFrame, resume: bool = False) -> CrawlResult:
        """One heavy exchange per generation: the fused bucket-local
        cogroup (operators/fused_schedule.py) runs dedup + exact
        seen-filter + robots + politeness for generation g+1 at the END of
        generation g, then global_rank mints priorities for the surviving
        new rows. Per-host order inside the cogroup uses
        ``(is_new, priority, url_hash)`` where new rows carry the packed
        ``(parent_priority, slot)`` key — exactly the order their minted
        priorities will have — so crawl order, seen membership, and
        metrics are bit-identical to ``_run_composed`` (golden +
        equivalence tests).

        Seen-set state is the exact table hash-partitioned by
        ``host_bucket``, re-read (co-located, never re-shuffled when the
        partitioning matches) by each generation's cogroup like a stateful
        stream-stream join; at 10^10 rows it stays sharded across
        executors and no blob or shard ever converges on the driver.
        """
        spark, cfg = self.spark, self.cfg
        t0 = time.monotonic()
        pages_parts: list[DataFrame] = []
        log_parts: list[DataFrame] = []
        metrics_rows: list[tuple] = []
        totals = {"fetched": 0, "scheduled": 0}
        next_statuses = ("scheduled", "deferred", "disallowed")

        manifest = self.latest_manifest() if resume else None
        scheduled: DataFrame | None = None
        deferred: DataFrame | None = None
        # per-host lifetime spend: a SMALL (host, host_bucket, spent)
        # DataFrame updated per generation — never a driver dict, so a
        # 10^7-host crawl keeps its quota ledger sharded
        host_spent: DataFrame | None = None
        ckpt_state: DataFrame | None = None  # bucketed tagged state table
        if manifest is not None:
            g0 = manifest["generation"] + 1
            next_priority = manifest["next_priority"]
            d = self._ckpt(f"gen={manifest['generation']:05d}")
            seen_tbl = spark.read.parquet(os.path.join(d, "seen_exact"))
            if "tag" in seen_tbl.columns:  # tagged state snapshot
                exact = seen_tbl.filter("tag = 's'").select("url_hash", "host_bucket")
            else:  # legacy layout: exact rows only
                exact = seen_tbl.select("url_hash", "host_bucket")
            totals = dict(manifest["totals"])
            n_frontier = manifest.get("frontier_count")
            host_spent = self._read_host_spent(d, manifest)
            fs_path = os.path.join(d, "frontier_sched")
            if os.path.isdir(fs_path):
                nxt = spark.read.parquet(fs_path)
                scheduled = nxt.filter("status = 'scheduled'")
                # keep retry_count across resume: dropping it would hand
                # every deferred requeued failure a fresh retry budget
                deferred = nxt.filter("status = 'deferred'").select(
                    *FRONTIER_COLS, "retry_count"
                )
            else:  # checkpoint written by the composed loop: re-schedule
                frontier = spark.read.parquet(os.path.join(d, "frontier"))
                if n_frontier is None:
                    n_frontier = frontier.count()
                if n_frontier:
                    scheduled, deferred = self._bootstrap_schedule(
                        frontier, g0, host_spent=host_spent
                    )
        else:
            g0 = 0
            frontier = prepare_frontier(seeds, cfg.n_host_buckets).persist()
            first = frontier.agg(
                F.max("priority").alias("p"), F.count("*").alias("n")
            ).first()
            next_priority = (first["p"] or 0) + 1
            n_frontier = first["n"]
            exact = frontier.select("url_hash", "host_bucket")
            if n_frontier:
                scheduled, deferred = self._bootstrap_schedule(
                    frontier, g0, host_spent=None
                )
        exact = exact.localCheckpoint(eager=True)

        gen_stats: dict[int, tuple[dict, int]] = {}
        prev_tbl: str | None = None
        cur_salts = cfg.n_salts
        generations = g0
        for g in range(g0, g0 + cfg.max_generations):
            gen_t0 = time.monotonic()
            if not n_frontier or scheduled is None:
                break
            sched_g = scheduled.drop("generation").withColumn("generation", F.lit(g))
            fetched = fetch_scheduled(sched_g, cfg.web).persist()
            pages_g = fetched.filter("ok").select(
                *PAGES_COLS, "generation", "host_bucket", "priority", "url_canon"
            )
            log_g = fetched.select(
                "generation", "priority", "url_canon", "host", "host_bucket", "ok",
                "fetch_offset_ms",
            )

            links = canonize(
                fetched.select(
                    F.col("priority").alias("parent_priority"),
                    F.posexplode_outer("links").alias("slot", "url"),
                ).filter(F.col("url").isNotNull()),
                cfg.n_host_buckets,
                keep_host=False,  # fused step re-derives host per bucket
            )
            cand = links.select(
                "url_hash", "url_canon", "host_bucket",
                (F.col("parent_priority") * MAX_LINK_SLOTS + F.col("slot"))
                .cast("long").alias("priority"),
                F.lit(True).alias("is_new"),
                F.lit(0).alias("retry_count"),
            )
            if deferred is not None:
                dcols = ["url_canon", "url_hash", "host_bucket", "priority"]
                if "retry_count" in deferred.columns:
                    d = deferred.select(*dcols, "retry_count")
                else:  # pre-retry checkpoint resume
                    d = deferred.select(*dcols).withColumn("retry_count", F.lit(0))
                cand = cand.unionByName(d.withColumn("is_new", F.lit(False)))
            if cfg.max_retries > 0:
                # bounded requeue: failed fetches re-enter the next
                # generation as bypass rows (already in the seen-set),
                # keeping their minted priority
                requeue = fetched.filter(
                    ~F.col("ok") & (F.col("retry_count") < cfg.max_retries)
                ).select(
                    "url_canon", "url_hash", "host_bucket", "priority",
                    F.lit(False).alias("is_new"),
                    (F.col("retry_count") + 1).alias("retry_count"),
                )
                cand = cand.unionByName(requeue)
            if cfg.total_budget_per_host is not None:
                # charge this generation's scheduled fetches, then expose
                # the remaining lifetime quota to the next schedule — as a
                # small aggregated DataFrame, never a driver dict
                delta = fetched.groupBy("host", "host_bucket").agg(
                    F.count("*").alias("spent")
                )
                host_spent = (
                    delta
                    if host_spent is None
                    else host_spent.unionByName(delta)
                    .groupBy("host", "host_bucket")
                    .agg(F.sum("spent").alias("spent"))
                ).localCheckpoint(eager=True)
            # eager localCheckpoint (not persist): the loop-carried
            # scheduled/deferred both re-reference this frame, so without a
            # lineage cut the logical plan tree grows multiplicatively per
            # generation (plan-string OOM by gen ~5)
            state = (
                ckpt_state
                if ckpt_state is not None and cfg.total_budget_per_host is None
                else self._state_for(exact, host_spent)
            )
            # emit_strings="frontier": dup/seen/disallowed rows come back
            # hash-only — this loop only counts them / folds them into
            # the seen-set by url_hash, so the dropped majority's string
            # bytes never ride the worker→JVM hop
            # lazy localCheckpoint: the counter collect right below is the
            # FIRST action on fused_out and scans every partition, so it
            # both materializes the checkpoint and cuts the lineage in the
            # same job — one fewer driver job per generation than an eager
            # cut followed by the collect
            fused_out = fused_filter_schedule(
                spark, cand, None, self.robots, cfg.scheduler, emit_dropped=True,
                total_budget_per_host=cfg.total_budget_per_host,
                n_salts=cur_salts,
                state=state,
                emit_strings="frontier",
            ).localCheckpoint(eager=False)

            # One small agg over the fused output drives every loop counter
            # (and materializes fetched + fused_out). Fetch ok/failed per
            # bucket is NOT collected per generation: crawl_log is 1:1 with
            # scheduled rows, so a single end-of-run agg over the cached
            # logs recovers (scheduled, fetched, failed) for every
            # (generation, bucket) in one job instead of one per loop.
            # The SAME agg also carries global_rank's per-bucket counts
            # (group by the ranker's own bucket expression) so the mint
            # below runs with zero internal jobs — one collect per
            # generation drives counters, auto-salt AND the rank offsets.
            rank_bounds = (0, next_priority * MAX_LINK_SLOTS)
            st: dict[tuple[int, str], int] = {}
            rank_counts: dict[int, int] = {}
            for r in (
                fused_out.groupBy(
                    "host_bucket", "status", "is_new",
                    rank_bucket_expr(
                        "priority", cfg.n_host_buckets, rank_bounds
                    ).alias("__b"),
                )
                .agg(F.count("*").alias("n")).collect()
            ):
                k = (r["host_bucket"], r["status"])
                st[k] = st.get(k, 0) + r["n"]
                if r["is_new"] and r["status"] in next_statuses:
                    rank_counts[r["__b"]] = rank_counts.get(r["__b"], 0) + r["n"]

            new_rows = fused_out.filter(
                F.col("is_new") & F.col("status").isin(*next_statuses)
            )
            # the packed key is parent_priority * MAX_LINK_SLOTS + slot and
            # every parent was minted below next_priority, so the key range
            # is known without sampling — global_rank takes the cheaper
            # bucket-offset JVM path (no Python worker in the ranking), and
            # with the counts pre-folded into the loop agg above it runs
            # ZERO jobs of its own: lazy localCheckpoint defers the
            # materialization (and the lineage cut) to the next
            # generation's fused-output checkpoint, which consumes
            # new_ranked on both its state and candidate sides in ONE
            # action — two fewer driver jobs per generation
            new_ranked, n_new = global_rank(
                new_rows, ["priority", "url_hash"], "__minted",
                start=next_priority, with_count=True,
                num_partitions=cfg.n_host_buckets, eager=False,
                bounds=rank_bounds, bucket_counts=rank_counts,
            )
            new_ranked = new_ranked.localCheckpoint(eager=False)
            new_ranked = new_ranked.withColumn("priority", F.col("__minted")).drop("__minted")
            next_priority += n_new
            if n_new:
                exact = exact.unionByName(
                    new_ranked.select("url_hash", "host_bucket")
                ).localCheckpoint(eager=False)

            nxt = fused_out.filter(
                ~F.col("is_new") & F.col("status").isin("scheduled", "deferred")
            ).unionByName(
                new_ranked.filter(F.col("status").isin("scheduled", "deferred"))
            )

            gen_stats[g] = (st, int((time.monotonic() - gen_t0) * 1000))
            n_frontier = sum(
                v for (_b, s), v in st.items() if s in next_statuses
            )
            if cfg.auto_salt:
                by_bucket: dict[int, int] = {}
                for (b, _s), v in st.items():
                    by_bucket[b] = by_bucket.get(b, 0) + v
                cur_salts = auto_salts(
                    by_bucket, cfg.n_host_buckets, base=cfg.n_salts
                )

            if cfg.checkpoint_dir:
                fm = fetched.groupBy("ok").agg(F.count("*").alias("n")).collect()
                totals["scheduled"] += sum(r["n"] for r in fm)
                totals["fetched"] += sum(r["n"] for r in fm if r["ok"])
                dgen = self._ckpt(f"gen={g:05d}")
                pages_g.write.mode("overwrite").parquet(os.path.join(dgen, "pages"))
                pages_parts.append(spark.read.parquet(os.path.join(dgen, "pages")))
                log_g.write.mode("overwrite").parquet(os.path.join(dgen, "crawl_log"))
                log_parts.append(spark.read.parquet(os.path.join(dgen, "crawl_log")))
                nxt.write.mode("overwrite").parquet(os.path.join(dgen, "frontier_sched"))
                nxt = spark.read.parquet(os.path.join(dgen, "frontier_sched"))
                nxt.select(*FRONTIER_COLS).write.mode("overwrite").parquet(
                    os.path.join(dgen, "frontier")
                )
                # snapshot the TAGGED STATE (seen rows + robots dimension
                # + quota spend) as ONE bucketed external table on
                # host_bucket: the next generation's cogroup then reads
                # its whole state side co-located and elides that exchange
                # entirely (plan-asserted in tests/test_plan_quality.py;
                # elision requires n_host_buckets ==
                # spark.sql.shuffle.partitions, else Spark re-shuffles one
                # side to align) — at 10^10 seen rows that exchange
                # dominates the loop. A union of separate seen/robots
                # tables would NOT preserve the partitioning, which is why
                # the dimension rows live in the same table. The files
                # stay plain parquet under the checkpoint dir (resume via
                # spark.read.parquet + tag filter still works; bucketing
                # metadata lives in the catalog entry only).
                import hashlib

                tbl = "crawl_seen_{}_{:05d}".format(
                    hashlib.md5(os.path.abspath(cfg.checkpoint_dir).encode())
                    .hexdigest()[:8], g,
                )
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                state_out = self._state_for(exact, host_spent).withColumn(
                    "bloom_bucket",
                    F.when(
                        F.col("tag") == "s",
                        F.pmod(F.col("url_hash"), F.lit(cfg.bloom.n_buckets)),
                    ).cast("int"),
                )
                (
                    state_out
                    .write.mode("overwrite").format("parquet")
                    .bucketBy(cfg.n_host_buckets, "host_bucket")
                    .sortBy("url_hash")
                    .option("path", os.path.join(dgen, "seen_exact"))
                    .saveAsTable(tbl)
                )
                ckpt_state = spark.table(tbl).select(*STATE_COLS)
                exact = (
                    spark.table(tbl).filter("tag = 's'")
                    .select("url_hash", "host_bucket")
                )
                if prev_tbl is not None:
                    spark.sql(f"DROP TABLE IF EXISTS {prev_tbl}")
                prev_tbl = tbl
                build_bucket_filters(exact, cfg.bloom).write.mode("overwrite").parquet(
                    os.path.join(dgen, "filters")
                )
                if host_spent is not None:
                    host_spent.write.mode("overwrite").parquet(
                        os.path.join(dgen, "host_spent")
                    )
                    host_spent = spark.read.parquet(os.path.join(dgen, "host_spent"))
                _atomic_write_json(
                    self._ckpt(f"manifest_gen={g:05d}.json"),
                    {
                        "generation": g,
                        "next_priority": next_priority,
                        "filter_epoch": 0,
                        "totals": totals,
                        "frontier_count": n_frontier,
                        "lineage": {"host_buckets": cfg.n_host_buckets,
                                    "bloom_buckets": cfg.bloom.n_buckets,
                                    "fused": True},
                    },
                )
            else:
                # eager localCheckpoint holds only the output columns, so
                # the full fetched frame (links arrays + working columns)
                # can be released below — executor storage stays flat at
                # output size instead of growing by one fetch cache per
                # generation. ONE combined checkpoint (not one each for
                # pages/log) saves a driver-latency job per generation;
                # pages/log are lazy projections of it.
                combined = fetched.select(
                    *PAGES_COLS, "generation", "host_bucket", "priority",
                    "url_canon", "host", "ok", "fetch_offset_ms",
                ).localCheckpoint(eager=True)
                pages_parts.append(
                    combined.filter("ok").select(
                        *PAGES_COLS, "generation", "host_bucket", "priority",
                        "url_canon",
                    )
                )
                log_parts.append(
                    combined.select(
                        "generation", "priority", "url_canon", "host",
                        "host_bucket", "ok", "fetch_offset_ms",
                    )
                )
            fetched.unpersist()
            scheduled = nxt.filter("status = 'scheduled'")
            deferred = nxt.filter("status = 'deferred'").select(
                *FRONTIER_COLS, "retry_count"
            )
            generations = g + 1

        empty_pages = spark.createDataFrame(
            [], schema="image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long, generation int, host_bucket int, "
            "priority long, url_canon string",
        )
        pages = empty_pages
        for p in pages_parts:
            pages = pages.unionByName(p)
        empty_log = spark.createDataFrame(
            [], schema="generation int, priority long, url_canon string, host string, "
            "host_bucket int, ok boolean, fetch_offset_ms long",
        )
        crawl_log = empty_log
        for p in log_parts:
            crawl_log = crawl_log.unionByName(p)

        # one end-of-run agg over the cached logs recovers per-(generation,
        # bucket) scheduled/fetched/failed for every generation at once
        # (crawl_log is 1:1 with scheduled rows)
        if gen_stats:
            fl = crawl_log.groupBy("generation", "host_bucket", "ok").agg(
                F.count("*").alias("n")
            ).collect()
            ok_n = {(r["generation"], r["host_bucket"]): r["n"] for r in fl if r["ok"]}
            fail_n = {(r["generation"], r["host_bucket"]): r["n"] for r in fl if not r["ok"]}
            for g, (st, wall_ms) in sorted(gen_stats.items()):
                buckets = (
                    {b for b, _s in st}
                    | {b for gg, b in ok_n if gg == g}
                    | {b for gg, b in fail_n if gg == g}
                )
                for b in sorted(buckets):
                    metrics_rows.append((
                        g, b, 0,
                        ok_n.get((g, b), 0) + fail_n.get((g, b), 0),
                        st.get((b, "dup"), 0) + st.get((b, "seen"), 0),
                        ok_n.get((g, b), 0), fail_n.get((g, b), 0), wall_ms,
                    ))
            if not cfg.checkpoint_dir:  # checkpoint mode accumulates per gen
                totals["scheduled"] += sum(ok_n.values()) + sum(fail_n.values())
                totals["fetched"] += sum(ok_n.values())
        metrics = spark.createDataFrame(metrics_rows, schema=METRICS_SCHEMA)
        if scheduled is not None and deferred is not None:
            frontier_final = scheduled.select(*FRONTIER_COLS).unionByName(
                deferred.select(*FRONTIER_COLS)
            )
        else:
            frontier_final = spark.createDataFrame(
                [], schema="url_canon string, url_hash long, host string, "
                "host_bucket int, priority long",
            ).select(*FRONTIER_COLS)
        return CrawlResult(
            pages=pages,
            metrics=metrics,
            crawl_log=crawl_log,
            seen_exact=exact,
            frontier_final=frontier_final,
            generations=generations,
            total_fetched=totals["fetched"],
            total_scheduled=totals["scheduled"],
            wall_s=time.monotonic() - t0,
        )
