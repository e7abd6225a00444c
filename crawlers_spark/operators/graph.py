"""Connected components over a near-dup pair graph (iterative DataFrame
label propagation).

Pairwise near-dup detectors (n-gram Jaccard, MinHash-LSH, SimHash,
phash bands) emit EDGES; a dedup pipeline must collapse them into
CLUSTERS and keep one representative per cluster — A~B and B~C must
retire both B and C even when A~C was never emitted as a pair. That
closure is connected components: ``component(v) = min(id) reachable
from v``.

Algorithm: min-label propagation with pointer jumping. Every node
starts labeled with its own id; each round every node takes the min of
its label, its neighbors' labels, AND its label's label (the pointer
jump — one self-join of the label table that halves remaining path
lengths, the same doubling idea as the small-star/large-star
construction [Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14, public]); stop when a round changes nothing. Rounds
are pure DataFrame ops (joins + groupBy-min), so each round shuffles
the edge list once and the label table twice, and converges in
O(log diameter) rounds — ~3 for dedup-shaped graphs (unions of small
dense clusters), ~6 for a 64-node adversarial path (tested), where
plain propagation needs diameter rounds. The jump does not change the
fixpoint (labels stay min-monotone within a component), only reaches it
exponentially faster. Lineage is cut per round with ``localCheckpoint``
so the plan stays flat across iterations (same pattern as the crawl
loop).

Determinism: min() is order-independent, so the result is identical at
any partitioning/parallelism — and cross-engine checkable (the oracle
computes the same closure with a recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected connected components: (node, component) for every node
    appearing in ``edges``, component = min reachable node id.

    Raises after ``max_iter`` non-converged rounds (a near-dup graph
    that deep means the pair threshold is broken, not the closure).
    """
    a, b = F.col(src).alias("u"), F.col(dst).alias("v")
    und = edges.select(a, b).union(edges.select(b.alias("u"), a.alias("v")))
    # adjacency is loop-invariant: one shuffle into its final layout
    adj = und.repartition("u").localCheckpoint(eager=True)

    labels = (
        adj.select("u")
        .distinct()
        .select("u", F.col("u").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor minimum: edge (u,v) proposes label(v) to u
        proposals = (
            adj.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nmin"))
        )
        # pointer jump: my label's label (halves remaining path lengths)
        jump = labels.select(
            F.col("u").alias("comp"), F.col("comp").alias("jmin")
        )
        nxt = (
            labels.join(proposals, "u", "left")
            .join(jump, "comp", "left")
            .select(
                "u",
                F.least("comp", "nmin", "jmin").alias("comp"),
                (F.least(F.col("nmin"), F.col("jmin")) < F.col("comp"))
                .alias("chg"),
            )
        ).localCheckpoint(eager=True)
        changed = nxt.filter("chg").limit(1).count()
        labels = nxt.select("u", "comp")
        if changed == 0:
            return labels.select(F.col("u").alias("node"), "comp")
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} rounds "
        "(pair-graph diameter > max_iter — check the near-dup threshold)"
    )


def dedup_cluster_reps(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster assignment for dedup: (doc_id, cluster, cluster_size,
    is_rep). ``cluster`` = min doc_id of the near-dup component; docs in
    ``all_ids`` that appear in no pair are singleton clusters of
    themselves. Downstream keeps ``is_rep`` rows only."""
    comps = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), "comp"
    )
    if all_ids is not None:
        singles = (
            all_ids.select(id_col)
            .join(comps.select(id_col), id_col, "left_anti")
            .select(id_col, F.col(id_col).alias("comp"))
        )
        comps = comps.unionByName(singles)
    sizes = comps.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        comps.join(sizes, "comp")
        .select(
            id_col,
            F.col("comp").alias("cluster"),
            "cluster_size",
            (F.col(id_col) == F.col("comp")).alias("is_rep"),
        )
    )


def dedup_cluster_best(
    comps: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "q_score",
) -> DataFrame:
    """Quality-aware cluster retirement: keep each near-dup cluster's
    best member instead of its min-id label.

    ``comps`` is (id, cluster, cluster_size) — e.g. from
    ``dedup_cluster_reps`` — and ``quality`` is (id, score). The kept
    member maximizes (score, -id): highest score, smallest id on ties —
    a total order, so the choice is deterministic on any executor
    layout. One hash-agg (``max_by`` with map-side partials) per
    cluster; no window, no sort of the full membership. At corpus scale
    the score column rides the existing cluster shuffle — nothing new
    is broadcast or collected.
    """
    best = (
        comps.join(quality, id_col)
        .groupBy("cluster")
        .agg(
            F.expr(f"max_by({id_col}, struct({score_col}, -{id_col}))").alias("keep_id")
        )
    )
    return comps.join(best, "cluster").select(
        id_col,
        "cluster",
        "cluster_size",
        "keep_id",
        (F.col(id_col) == F.col("keep_id")).cast("int").alias("is_kept"),
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT int64 fixed-point arithmetic.

    Link analysis is the canonical crawl-corpus ranking signal (Page et
    al. 1999); the reference ranks serially by collection order, so this
    is an engine addition sized for the link graph a 100-TB crawl
    actually produces. Each iteration is one shuffle join (ranks onto
    edges by source) plus one hash aggregation (sum contributions by
    destination) — the standard distributed PR shape; nothing is ever
    driver-resident but the node count.

    Float PageRank cannot be oracle-checked bit-exactly (sum order
    perturbs low bits), so ranks are int64 micro-units of ``scale``:

    * ``r0 = scale // n`` for every node,
    * contribution = ``rank DIV out_degree`` (exact integer floor),
    * ``r' = (15 * scale) // (100 * n) + (85 * sum_contrib) DIV 100``
      (damping 0.85, teleport 0.15, all integer).

    Integer sums are order-independent, so the result is bit-identical
    at any parallelism AND in any engine that floors integer division
    the same way for positive operands (DuckDB ``//``) — giving an
    iterative graph algorithm a full value-hash oracle. The per-node
    quantization error is < iters * (1 + 0.85 * max_outdeg) micro-units
    — ~1e-9 relative at the default scale, far below ranking noise.

    Dangling nodes: callers supply edges where every node has outdegree
    >= 1 (an undirected/bidirectional edge list satisfies this by
    construction); nodes never appearing as ``src`` are dropped rather
    than silently re-weighted.
    """
    deg = edges.groupBy(src).agg(F.count("*").alias("__od"))
    # max(n, 1): an EMPTY edge set must yield an empty result, not a
    # driver-side ZeroDivisionError (ranks is already empty; the divisor
    # value is then irrelevant)
    n = max(deg.count(), 1)
    teleport = (15 * scale) // (100 * n)
    ranks = deg.select(
        F.col(src).alias("node"), F.lit(scale // n).cast("long").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, src)
            .join(ranks, F.col(src) == F.col("node"))
            .select(F.col(dst).alias("__to"), F.expr("rank DIV __od").alias("__c"))
            .groupBy("__to")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            deg.select(F.col(src).alias("node"))
            .join(contrib, F.col("node") == F.col("__to"), "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr("(85 * coalesce(__s, cast(0 as bigint))) DIV 100")
                ).cast("long").alias("rank"),
            )
        )
    return ranks


def kcore_prune(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """``rounds`` iterations of k-core pruning over an undirected edge
    list (one row per u<v pair): each round drops every vertex whose
    degree in the SURVIVING subgraph is < k, then re-filters the edges
    to surviving endpoints. Returns (node, degree) on the subgraph left
    after the final round — a fixed-round prefix of the k-core
    fixed-point, the classic "strip the periphery" graph-curation pass
    (run with rounds >= graph diameter to reach the true core).

    Each round is one hash-agg + two semi-joins on the shrinking edge
    set; like pagerank_int the fixed ``rounds`` keeps the whole thing a
    single declarative plan (cross-engine checkable). For a
    convergence-probed variant at scale, cut lineage per round with
    localCheckpoint exactly as connected_components does."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    for _ in range(rounds):
        deg = sym.groupBy("a").agg(F.count("*").alias("n"))
        keep = deg.filter(F.col("n") >= k).select("a")
        sym = (
            sym.join(keep, "a")
            .join(keep.select(F.col("a").alias("b")), "b")
            .select("a", "b")
        )
    return sym.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("degree")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """``rounds`` synchronous label-propagation steps (Raghavan et al.
    2007, public) over an undirected edge list (one row per u<v pair):
    every node starts labeled with its own id; each round every node
    adopts the most frequent label among its NEIGHBORS, ties broken by
    the smallest label. Returns (node, community) after the final
    round — the cheap community detector a link-graph curation pass
    runs to group hosts/pages before per-community work (unlike
    connected_components it splits dense regions joined by thin
    bridges, not just disconnected ones).

    Sync updates + a total tie order (count desc, label asc) make each
    round a pure function of the previous labeling — deterministic at
    any parallelism and cross-engine checkable by unrolling the rounds
    as a WITH chain (same fixed-round pattern as pagerank_int/
    kcore_prune). Each round: one join (labels onto the adjacency),
    one hash-agg for (node, label) frequencies, one per-node window
    top-1 — all keyed shuffles on the node id, nothing driver-side.
    At scale, cut lineage per round with localCheckpoint exactly as
    connected_components does; sync LPA can oscillate on bipartite
    structures, which fixed rounds keep deterministic (documented
    LPA behavior, not an implementation artifact)."""
    from pyspark.sql import Window

    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    top1 = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("lbl").asc()
    )
    for _ in range(rounds):
        freq = (
            sym.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            freq.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return labels.select("node", F.col("lbl").alias("community"))


def trustrank_int(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration TrustRank in exact int64 fixed-point (Gyöngyi,
    Garcia-Molina & Pedersen, "Combating web spam with TrustRank",
    VLDB 2004, public) — personalized PageRank whose teleport mass goes
    ONLY to a vetted seed whitelist, so trust decays with link distance
    from the seeds and link-farm islands (unreachable from any seed)
    score exactly the teleport floor: zero. This is the crawl-side spam
    demotion signal a frontier scheduler mixes into its priority (the
    complement of link_reciprocity's local heuristic; reference ranks
    purely by collection order).

    Same integer conventions as pagerank_int (teleport DIV'd over the
    SEED count, contribution = rank DIV out_degree, damping 85/100 in
    integer form), so the result is bit-identical at any parallelism
    and in any engine flooring positive integer division. Directed
    edges; nodes = union of endpoints; dangling nodes simply leak mass
    (fixed iterations make that an exact, stated law, not drift).
    Each iteration: one join of ranks onto edges by source + one
    hash-agg by destination — the standard distributed shape; only the
    node count is driver-resident.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("__od"))
    sd = nodes.join(seeds.select(F.col("node")), "node")
    ns = max(sd.count(), 1)  # empty-graph / no-seed guard (result empty anyway)
    teleport = (15 * scale) // (100 * ns)
    ranks = nodes.join(sd.select("node", F.lit(1).alias("__s")), "node", "left").select(
        "node",
        F.when(F.col("__s").isNotNull(), F.lit(scale // ns).cast("long"))
        .otherwise(F.lit(0).cast("long")).alias("rank"),
        F.coalesce(F.col("__s"), F.lit(0)).alias("__seed"),
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, src)
            .join(ranks.select("node", "rank"), F.col(src) == F.col("node"))
            .select(F.col(dst).alias("__to"), F.expr("rank DIV __od").alias("__c"))
            .groupBy("__to")
            .agg(F.sum("__c").alias("__sum"))
        )
        ranks = (
            ranks.select("node", "__seed")
            .join(contrib, F.col("node") == F.col("__to"), "left")
            .select(
                "node",
                (
                    F.when(F.col("__seed") == 1, F.lit(teleport)).otherwise(F.lit(0))
                    + F.expr("(85 * coalesce(__sum, cast(0 as bigint))) DIV 100")
                ).cast("long").alias("rank"),
                "__seed",
            )
        )
    return ranks.select("node", "rank", F.col("__seed").alias("is_seed"))


def opic_int(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round OPIC — On-line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003, public): the crawl-priority estimator that
    needs NO stored link matrix. Every page holds CASH; each round a
    page distributes its cash equally over its out-links and banks what
    it held into its HISTORY; importance ≈ history + cash. Crawlers use
    it because the frontier can update priorities incrementally as pages
    are fetched — this is the batch (synchronous-rounds) statement of
    that law, in exact int64 fixed-point so it is bit-identical at any
    parallelism and cross-engine checkable.

    Integer form: cash0 = scale DIV n for every node, history0 = 0;
    round: history += cash; cash'(v) = Σ_{u→v} cash(u) DIV od(u).
    Dangling nodes bank their cash but distribute none (the paper routes
    it to a virtual node; the fixed-round integer law states evaporation
    explicitly). Each round is one join + one hash-agg, node count only
    on the driver.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("__od"))
    n = max(nodes.count(), 1)
    state = nodes.select(
        "node",
        F.lit(scale // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("history"),
    )
    for _ in range(iters):
        dist = (
            edges.join(deg, src)
            .join(state.select("node", "cash"), F.col(src) == F.col("node"))
            .select(F.col(dst).alias("__to"), F.expr("cash DIV __od").alias("__c"))
            .groupBy("__to")
            .agg(F.sum("__c").alias("__sum"))
        )
        state = (
            state.select("node", (F.col("history") + F.col("cash")).alias("history"))
            .join(dist, F.col("node") == F.col("__to"), "left")
            .select(
                "node",
                F.coalesce(F.col("__sum"), F.lit(0)).cast("long").alias("cash"),
                "history",
            )
        )
    return state.select(
        "node", "cash", "history",
        (F.col("cash") + F.col("history")).cast("long").alias("importance"),
    )
