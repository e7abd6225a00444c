"""Connected components / cluster reps (operators/graph.py).

The cross-engine closure semantics are proven by the oracle suite
(test_queries_oracle: dedup_clusters vs a DuckDB recursive CTE); these
tests pin the operator-level contracts: transitivity on chains, cluster
merging, singleton handling, determinism across partitionings, and the
non-convergence guard.
"""

from __future__ import annotations

import pytest

from crawlers_spark.operators.graph import connected_components, dedup_cluster_reps


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_chain_closes_transitively(spark):
    # 1-2, 2-3, 3-4: one component labeled 1, though 1~4 never emitted
    got = _comp_map(connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4)])))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_clusters_stay_disjoint(spark):
    got = _comp_map(
        connected_components(_edges(spark, [(10, 11), (20, 21), (21, 22)]))
    )
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_bridge_merges_two_clusters(spark):
    # two triangles joined by one bridge edge -> single component
    pairs = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)]
    got = _comp_map(connected_components(_edges(spark, pairs)))
    assert set(got.values()) == {1}
    assert set(got) == {1, 2, 3, 7, 8, 9}


def test_deterministic_across_partitionings(spark):
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6), (11, 30)]
    e = _edges(spark, pairs)
    a = _comp_map(connected_components(e))
    b = _comp_map(connected_components(e.repartition(13, "id_b")))
    assert a == b


def test_long_path_needs_iterations(spark):
    # a 12-node path exercises multi-round propagation (diameter 11)
    got = _comp_map(
        connected_components(_edges(spark, [(i, i + 1) for i in range(11)]))
    )
    assert set(got.values()) == {0} and len(got) == 12


def test_max_iter_guard_raises(spark):
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(9)]), max_iter=2
        )


def test_cluster_reps_with_singletons(spark):
    all_ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    out = dedup_cluster_reps(
        _edges(spark, [(0, 3), (3, 5)]), all_ids=all_ids
    ).collect()
    got = {r["doc_id"]: (r["cluster"], r["cluster_size"], r["is_rep"]) for r in out}
    assert got == {
        0: (0, 3, True), 3: (0, 3, False), 5: (0, 3, False),
        1: (1, 1, True), 2: (2, 1, True), 4: (4, 1, True),
    }


def test_adversarial_long_path_converges_via_pointer_jumping(spark):
    """A 64-node path (diameter 63) converges within the default
    max_iter=25 only because of the pointer-jump (plain neighbor
    propagation needs 63 rounds)."""
    got = _comp_map(
        connected_components(_edges(spark, [(i, i + 1) for i in range(63)]))
    )
    assert set(got.values()) == {0} and len(got) == 64


def test_cluster_best_keeps_highest_quality(spark):
    """dedup_cluster_best keeps the max-(score, -id) member per cluster;
    singletons keep themselves; ties go to the smaller id."""
    from crawlers_spark.operators.graph import dedup_cluster_best

    all_ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 7, 8, 99)], "doc_id long")
    comps = dedup_cluster_reps(
        _edges(spark, [(1, 2), (2, 3), (7, 8)]), all_ids=all_ids
    ).select("doc_id", "cluster", "cluster_size")
    quality = spark.createDataFrame(
        # cluster {1,2,3}: 3 wins on score; {7,8}: tie -> 7; {99}: itself
        [(1, 10), (2, 5), (3, 40), (7, 7), (8, 7), (99, 0)],
        "doc_id long, q_score long",
    )
    got = {
        r["doc_id"]: (r["keep_id"], r["is_kept"])
        for r in dedup_cluster_best(comps, quality).collect()
    }
    assert got == {
        1: (3, 0), 2: (3, 0), 3: (3, 1),
        7: (7, 1), 8: (7, 0),
        99: (99, 1),
    }


def test_kcore_prunes_cascade(spark):
    """k-core pruning must cascade across rounds: a vertex that only
    falls below k AFTER its weak neighbor is removed goes in a later
    round, never the first."""
    import pyspark.sql.functions as F  # noqa: F401

    from crawlers_spark.operators.graph import kcore_prune

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    # 5 hangs off the clique with degree 3 (1, 2, 6); 6 is degree-1
    edges = clique + [(1, 5), (2, 5), (5, 6)]
    df = spark.createDataFrame(edges, "u long, v long")

    r1 = {r["node"] for r in kcore_prune(df, k=3, rounds=1).collect()}
    assert r1 == {1, 2, 3, 4, 5}  # 6 drops; 5 still has degree 3

    r2 = {r["node"]: r["degree"] for r in kcore_prune(df, k=3, rounds=2).collect()}
    assert set(r2) == {1, 2, 3, 4}  # 5 fell to degree 2 once 6 left
    assert all(d == 3 for d in r2.values())

    r3 = {r["node"] for r in kcore_prune(df, k=3, rounds=3).collect()}
    assert r3 == {1, 2, 3, 4}  # fixed point: the 3-core is the clique


def test_label_propagation_splits_bridged_cliques(spark):
    """Two 4-cliques joined by ONE bridge edge: connected components
    merges them (one component), label propagation must NOT — inside a
    clique the majority of every node's neighbors carry the clique's
    min label after round 1, so the thin bridge cannot flip either
    side. This is exactly the distinction the query docstring claims."""
    from crawlers_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    df = spark.createDataFrame(c1 + c2 + [(4, 11)], "u long, v long")

    lp = {r["node"]: r["community"] for r in
          label_propagation(df, rounds=3).collect()}
    left = {lp[n] for n in (1, 2, 3)}
    right = {lp[n] for n in (12, 13, 14)}
    assert len(left) == 1 and len(right) == 1
    assert left != right  # the bridge did not merge the communities

    cc = _comp_map(connected_components(df.selectExpr(
        "u as id_a", "v as id_b")))
    assert len({cc[n] for n in (1, 2, 3, 12, 13, 14)}) == 1  # CC merges


def test_label_propagation_deterministic_across_partitionings(spark):
    from crawlers_spark.operators.graph import label_propagation

    edges = [(a, b) for a in range(1, 9) for b in range(a + 1, 9) if (a + b) % 3]
    df = spark.createDataFrame(edges, "u long, v long")
    r1 = sorted(label_propagation(df.repartition(1), rounds=3).collect())
    r13 = sorted(label_propagation(df.repartition(13), rounds=3).collect())
    assert r1 == r13
