"""Corpus-curation operators: deterministic mixture sampling and
benchmark decontamination (operators/sampling.py).

The cross-engine exactness of both ops is proven by the oracle suite
(test_queries_oracle: sample_mixture, contamination_ngram); these tests
cover the operator-level contracts the oracle can't see — determinism
across partitionings, statistical rate accuracy, subset stability, and
the plan shapes (broadcast dims, no Python stages).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.sampling import (
    MIX_SCALE,
    contaminated_docs,
    hash_uniform,
    mixture_thresholds,
    sample_mixture,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    langs = ["en", "de", "fr", "es", "zh"]
    return (
        spark.range(20_000)
        .select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(*[F.lit(l) for l in langs]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("lang"),
        )
        .persist()
    )


class TestSampleMixture:
    RATES = {"en": 0.5, "de": 0.25, "zh": 1.0}
    DEFAULT = 0.1

    def test_rates_within_binomial_tolerance(self, corpus):
        out = (
            sample_mixture(corpus, "doc_id", "lang", self.RATES, self.DEFAULT)
            .groupBy("lang")
            .count()
            .collect()
        )
        got = {r["lang"]: r["count"] for r in out}
        n = 4_000  # rows per lang
        for lang, rate in {**self.RATES, "fr": self.DEFAULT, "es": self.DEFAULT}.items():
            sigma = math.sqrt(n * rate * (1 - rate))
            assert abs(got.get(lang, 0) - n * rate) <= 4 * sigma + 1, (
                lang, got.get(lang, 0), n * rate)

    def test_deterministic_across_partitionings(self, corpus):
        a = sample_mixture(corpus, "doc_id", "lang", self.RATES, self.DEFAULT)
        b = sample_mixture(
            corpus.repartition(17, "lang"), "doc_id", "lang",
            self.RATES, self.DEFAULT,
        )
        assert sorted(r["doc_id"] for r in a.collect()) == \
               sorted(r["doc_id"] for r in b.collect())

    def test_resumable_subset_stability(self, corpus):
        """Sampling a corpus prefix keeps exactly the rows the full-corpus
        sample keeps in that prefix — the decision is per-key, not global."""
        full = sample_mixture(corpus, "doc_id", "lang", self.RATES, self.DEFAULT)
        half = sample_mixture(
            corpus.filter("doc_id < 10000"), "doc_id", "lang",
            self.RATES, self.DEFAULT,
        )
        full_ids = {r["doc_id"] for r in full.collect() if r["doc_id"] < 10_000}
        assert {r["doc_id"] for r in half.collect()} == full_ids

    def test_rate_one_keeps_all_rate_zero_drops_all(self, corpus):
        zh = corpus.filter("lang = 'zh'")
        kept = sample_mixture(zh, "doc_id", "lang", {"zh": 1.0}, 0.0)
        assert kept.count() == zh.count()
        none = sample_mixture(zh, "doc_id", "lang", {"zh": 0.0}, 1.0)
        assert none.count() == 0

    def test_thresholds_exact_ints(self):
        thr, d = mixture_thresholds({"en": 0.5, "x": 0.125}, 0.0625)
        assert thr == {"en": MIX_SCALE // 2, "x": MIX_SCALE // 8}
        assert d == MIX_SCALE // 16

    def test_plan_broadcast_dim_no_python(self, corpus):
        plan = _plan(
            sample_mixture(corpus, "doc_id", "lang", self.RATES, self.DEFAULT)
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan

    def test_seed_changes_sample(self, corpus):
        a = sample_mixture(corpus, "doc_id", "lang", self.RATES, self.DEFAULT,
                           seed="s1")
        b = sample_mixture(corpus, "doc_id", "lang", self.RATES, self.DEFAULT,
                           seed="s2")
        ids_a = {r["doc_id"] for r in a.collect()}
        ids_b = {r["doc_id"] for r in b.collect()}
        assert ids_a != ids_b
        # both still statistically plausible sizes
        assert 0 < len(ids_a) < 20_000 and 0 < len(ids_b) < 20_000


def test_hash_uniform_is_uniform(spark):
    """Mean of U/2^60 over 10k keys ≈ 0.5 (binomial-ish tolerance)."""
    df = spark.range(10_000).select(
        (hash_uniform(F.col("id"), "u") / F.lit(float(MIX_SCALE))).alias("u")
    )
    row = df.agg(F.avg("u").alias("m"), F.min("u").alias("lo"),
                 F.max("u").alias("hi")).collect()[0]
    assert abs(row["m"] - 0.5) < 0.02
    assert row["lo"] >= 0.0 and row["hi"] < 1.0


class TestContamination:
    def _shingles(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, s string")

    def test_exact_counts_tiny_corpus(self, spark):
        ev = self._shingles(spark, [(100, "a b c"), (100, "x y z"),
                                    (200, "a b c")])
        co = self._shingles(spark, [
            (1, "a b c"),           # hits eval docs 100 and 200 via 1 gram
            (2, "x y z"), (2, "q r s"),  # hits eval doc 100 via 1 gram
            (3, "no hit here"),
        ])
        got = {
            r["doc_id"]: (r["n_hit_grams"], r["n_eval_docs"])
            for r in contaminated_docs(co, ev).collect()
        }
        assert got == {1: (1, 2), 2: (1, 1)}

    def test_multi_gram_hits_counted_distinct(self, spark):
        ev = self._shingles(spark, [(9, "g1"), (9, "g2"), (8, "g1")])
        co = self._shingles(spark, [(1, "g1"), (1, "g2")])
        [r] = contaminated_docs(co, ev).collect()
        assert (r["n_hit_grams"], r["n_eval_docs"]) == (2, 2)

    def test_plan_eval_side_broadcast(self, spark):
        ev = self._shingles(spark, [(9, "g1")])
        co = self._shingles(spark, [(1, "g1")])
        plan = _plan(contaminated_docs(co, ev))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        plan_big = _plan(contaminated_docs(co, ev, broadcast_eval=False))
        assert "BroadcastHashJoin" not in plan_big
