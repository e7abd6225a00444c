"""Keyed merge: upsert-latest-per-entity (freshness-guard semantics).

The reference updates a row only when the incoming record is fresher,
else inserts (/root/reference/worldcup/db/deal_mysql_info.py:44-57 —
query-then-update-or-insert per row). Spark-first that is a MERGE whose
match condition is "newer wins": union the base table with the delta and
keep, per key, the row with the highest (version, source) — delta wins
version ties, reproducing update-if-same-version-overwrite.

Physical shape: ONE hash aggregation via ``max_by(struct(payload),
struct(version, source))`` — map-side partial combine, no window sort, no
join; scales to any key cardinality with a single shuffle on the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_latest(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """One row per key: the freshest of base ∪ delta (delta wins ties).

    Output schema = base schema (delta must carry the same columns).
    """
    cols = base.columns
    assert set(cols) == set(delta.columns), "base/delta schemas must match"
    payload = [c for c in cols if c not in keys]
    u = base.withColumn("__src", F.lit(0)).unionByName(
        delta.select(*cols).withColumn("__src", F.lit(1))
    )
    agg = u.groupBy(*keys).agg(
        F.max_by(
            F.struct(*payload), F.struct(F.col(version_col), F.col("__src"))
        ).alias("__row")
    )
    return agg.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in payload])
