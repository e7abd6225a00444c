"""Distributed exclusive prefix sum and sequence packing.

``prefix_sum`` is the scan primitive a training-data pipeline needs for
concat-and-chunk sequence packing (every doc needs the total token count
of all docs before it in a global order). A naive ``sum() OVER (ORDER BY
...)`` collapses to a single partition — fatal at corpus scale. This is
the same two-phase shape as ``ranking.global_rank``'s bounds path: bin
rows by a monotone arithmetic bucket of the leading order key, collect
per-bucket sums (one small job: <= 4x shuffle-partitions longs), prefix-
sum the bucket totals on the driver, and finish with a within-bucket
window sum plus the bucket's offset. One exchange, all JVM-side, no
sampling job, no Python worker.

Determinism: bucket boundaries are a pure monotone function of the
leading key (floor of a positive-scaled difference — IEEE multiply and
divide by positive constants are monotone, floor preserves it), so equal
keys always land in the same bucket and the within-bucket window sees the
full order columns. Loose bounds cost only balance, never correctness.

``pack_sequences`` applies it to the concat-and-chunk packing used by
LLM training pipelines: documents are concatenated in a deterministic
order and split into fixed-size token bins; a doc's bin span is pure
integer arithmetic on (offset, n_tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
    bounds: tuple[int, int] | None = None,
    with_total: bool = False,
):
    """Add ``out_col`` = sum of ``val_col`` over all rows strictly before
    this row in the total order given by ``order_cols`` (exclusive scan,
    first row gets 0). ``order_cols`` must form a unique key for the
    output to be deterministic, and ``order_cols[0]`` must be NUMERIC
    (the bucket map is arithmetic; string keys ride along as tie-break
    columns — give them an integer lane up front, see crawl_to_corpus).
    ``bounds=(lo, hi)`` is an optional known value range for
    ``order_cols[0]`` (``lo <= v < hi``); without it one tiny min/max
    job discovers the range."""
    spark = df.sparkSession
    parts = int(
        num_partitions or spark.conf.get("spark.sql.shuffle.partitions")
    )
    if bounds is None:
        row = df.agg(
            F.min(order_cols[0]).alias("lo"), F.max(order_cols[0]).alias("hi")
        ).collect()[0]
        if row["lo"] is None:  # empty input
            out = df.withColumn(out_col, F.lit(0).cast("long"))
            return (out, 0) if with_total else out
        bounds = (int(row["lo"]), int(row["hi"]) + 1)
    lo, hi = bounds
    nb = max(4 * parts, 16)
    span = float(max(1, hi - lo))
    key = F.col(order_cols[0])
    b = F.least(
        F.lit(nb - 1),
        F.greatest(
            F.lit(0),
            F.floor((key - F.lit(lo)).cast("double") / F.lit(span) * F.lit(nb)).cast(
                "int"
            ),
        ),
    )
    binned = df.withColumn("__b", b)
    sums = {
        r["__b"]: r["s"]
        for r in binned.groupBy("__b")
        .agg(F.sum(F.col(val_col).cast("long")).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for bid in sorted(sums):
        offsets[bid] = acc
        acc += sums[bid]
    if sums:
        omap = F.create_map(*[F.lit(x) for bid in sums for x in (bid, offsets[bid])])
    else:  # zero rows: any correctly-typed map (an untyped empty map is VOID)
        omap = F.create_map(F.lit(0), F.lit(0))
    w = (
        Window.partitionBy("__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(F.col(val_col).cast("long")).over(w), F.lit(0))
    out = binned.withColumn(
        out_col, (omap[F.col("__b")] + local).cast("long")
    ).drop("__b")
    if with_total:
        return out, acc
    return out


def pack_sequences(
    docs: DataFrame,
    tokens_col: str,
    bin_tokens: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: concatenate docs in ``order_cols`` order
    and split into ``bin_tokens``-sized training bins. Adds ``offset``
    (global token offset of the doc's first token), ``bin_first`` /
    ``bin_last`` (the bins the doc's tokens land in), and ``n_bins``
    (how many bins the doc spans — boundary docs split across bins, the
    standard GPT-style packing). Zero-token docs must be filtered by the
    caller (they have no token to place)."""
    order_cols = order_cols or ["doc_id"]
    out = prefix_sum(docs, order_cols, tokens_col, "offset")
    first = F.expr(f"offset div {int(bin_tokens)}")
    last = F.expr(f"(offset + {tokens_col} - 1) div {int(bin_tokens)}")
    return (
        out.withColumn("bin_first", first)
        .withColumn("bin_last", last)
        .withColumn("n_bins", (F.col("bin_last") - F.col("bin_first") + 1).cast("long"))
    )
