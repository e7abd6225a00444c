"""Deterministic corpus-curation operators: mixture sampling and
benchmark decontamination.

Training-data pipelines over a crawled corpus need two curation steps
the crawl itself doesn't provide:

* **Mixture sampling** — downsample each stratum (language, domain,
  source) to a target rate so the training mix matches a spec. Must be
  deterministic (same corpus + same spec => same sample, across reruns
  AND across engines) — so the keep/drop decision is a pure hash of the
  row key, never an RNG: keep iff ``U(key) < rate * 2^60`` where
  ``U(key)`` is a uniform 60-bit integer from an md5 lane. The md5-lane
  construction (``conv(substring(md5(seed|key),1,15),16,10)``) is
  int64-identical in Spark and DuckDB, so the sample is fully
  oracle-checkable (same trick as dedup_minhash_md5 / simhash_banded).

* **Decontamination** — flag corpus documents sharing word n-grams with
  a held-out evaluation set, the standard guard against benchmark
  leakage into training data. Shape: distinct-gram equi-join (never
  all-pairs), eval side broadcast when small (benchmarks are MBs while
  the corpus is TBs — the corpus-side shingle table never shuffles).

Reference analog: the reference curates per-source row budgets by hand
(per-crawler row caps, /root/reference/nft/get_opensea_v1.1.py:61-66);
these operators are the engine-native generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5-lane hashes take 15 hex chars = 60 bits: max exact-integer range
# that still fits an int64 in BOTH Spark and DuckDB
MIX_SCALE = 1 << 60


def hash_uniform(key: Column, seed: str) -> Column:
    """Deterministic uniform bigint in [0, 2^60) from a key column.

    Cross-engine exact: Spark ``conv(substring(md5(...),1,15),16,10)``
    equals DuckDB ``('0x' || substring(md5(...),1,15))::BIGINT`` for the
    same ``seed|key`` string. JVM-side (no Python UDF).
    """
    s = F.concat_ws("|", F.lit(seed), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def mixture_thresholds(
    rates: dict[str, float], default_rate: float = 0.0
) -> tuple[dict[str, int], int]:
    """Exact integer keep-thresholds for a rate spec (shared with the
    oracle SQL so both engines compare against identical int64s)."""
    return (
        {s: int(r * MIX_SCALE) for s, r in rates.items()},
        int(default_rate * MIX_SCALE),
    )


def sample_mixture(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``hash_uniform(key) < rate[stratum] * 2^60``.

    The rate spec joins in as a broadcast dimension (a per-domain spec
    with 10^6 strata is still a few MB — far under broadcast limits; a
    larger spec would simply drop the hint and shuffle-join on the
    stratum key). Sampling itself is a filter on a hash — no shuffle,
    no RNG state, identical result at any partitioning or parallelism,
    and resumable: re-running over an extended corpus keeps exactly the
    rows it kept before (the decision depends only on the key).
    """
    spark = df.sparkSession
    thr, default_thr = mixture_thresholds(rates, default_rate)
    dim = spark.createDataFrame(
        [(s, t) for s, t in thr.items()], f"{stratum_col} string, _thr long"
    )
    return (
        df.join(F.broadcast(dim), stratum_col, "left")
        .filter(
            hash_uniform(F.col(key_col), seed)
            < F.coalesce(F.col("_thr"), F.lit(default_thr))
        )
        .drop("_thr")
    )


def contaminated_docs(
    corpus_shingles: DataFrame,
    eval_shingles: DataFrame,
    id_col: str = "doc_id",
    gram_col: str = "s",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-corpus-document benchmark contamination counts.

    Inputs are distinct (id, gram) shingle tables (string grams or
    hashed — the operator is representation-agnostic; use
    dedup.word_shingles for the hashed scale path). Output: one row per
    contaminated corpus doc — ``n_hit_grams`` distinct grams shared
    with the eval set, ``n_eval_docs`` distinct eval docs sharing at
    least one gram.

    Scale shape: equi-join on the gram (never all-pairs). With
    ``broadcast_eval`` the TB-scale corpus side never shuffles — the
    MB-scale benchmark set ships to the scan (the common case); turn it
    off to shuffle-join two large sides.
    """
    ev = eval_shingles.select(
        F.col(id_col).alias("_eval_id"), F.col(gram_col).alias(gram_col)
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        corpus_shingles.select(id_col, gram_col)
        .join(ev, gram_col)
        .groupBy(id_col)
        .agg(
            F.countDistinct(gram_col).alias("n_hit_grams"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
    )
