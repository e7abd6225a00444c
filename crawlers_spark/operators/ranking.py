"""Deterministic, scalable global ranking (no single-partition window).

A naive ``row_number() OVER (ORDER BY ...)`` collapses to one partition —
fatal at 10^10 rows. This operator assigns a contiguous 0-based global
rank that follows a total order with bounded per-task work:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order columns
   (globally ordered across partition boundaries),
2. count rows per partition (small collect: one long per partition),
3. ``mapInPandas`` adds each partition's prefix-sum offset to a running
   local count.

Determinism: range-boundary placement may vary run to run, but ranks
follow the total order regardless, so the output is deterministic as long
as the order columns form a unique key (callers include ``url_hash``).

The crawl engine uses this to mint frontier priorities — the scalar that
reproduces the reference's serial discovery order (SURVEY.md §4.2 item 5)
under full parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
    with_count: bool = False,
    eager: bool = False,
):
    """Add ``out_col`` = deterministic global 0-based rank + ``start``.

    With ``with_count=True`` returns ``(df, n_rows)`` — the row count is
    free here (it is the sum of the per-partition counts this operator
    already collects), saving callers a separate count job.

    With ``eager=True`` the result is materialized via an eager
    ``localCheckpoint`` and the internal sorted cache is unpersisted
    before returning — loop callers get a lineage-cut result with no
    leaked cache entry. (The internal persist is load-bearing: the
    prefix-sum offsets are computed from one concrete range partitioning,
    and a recompute could sample different boundaries.)"""
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ordered = (
        df.repartitionByRange(int(parts), *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    ordered = ordered.persist()
    counts = {r["__pid"]: r["cnt"] for r in ordered.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = StructType(list(ordered.schema.fields) + [StructField(out_col, LongType())])

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen_in_pid: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = offsets.get(pid, 0) + seen_in_pid.get(pid, 0)
            pdf = pdf.copy()
            pdf[out_col] = base + pd.RangeIndex(len(pdf)).to_numpy()
            seen_in_pid[pid] = seen_in_pid.get(pid, 0) + len(pdf)
            yield pdf

    out = ordered.mapInPandas(add_rank, schema=schema).drop("__pid")
    if eager:
        out = out.localCheckpoint(eager=True)
        ordered.unpersist()
    if with_count:
        return out, acc - start
    return out
