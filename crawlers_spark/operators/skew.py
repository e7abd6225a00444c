"""Skew-salted large-large equi-join.

AQE's skew-join split handles most skew at runtime, but it only fires
when partition-size stats reveal the skew AND both sides are
sort-merge-joinable; a pathological key (one host with 30% of a 10^10-row
table) is better handled structurally. ``salted_join`` splits every hot
key's rows across ``n_salt`` sub-keys on the large side and replicates
the other side's matching rows to all sub-keys — turning one oversized
shuffle partition into ``n_salt`` bounded ones at the cost of
replicating the right side ``n_salt``-fold (so salt the side that is
large and skewed, keep the replicated side the smaller of the two).

The salt must be deterministic but uncorrelated with the join key —
here ``pmod(xxhash64(all non-key columns), n_salt)`` — so re-runs and
resumes produce identical partitioning. (A key-only left side has no
payload to hash; the fallback salts by ``monotonically_increasing_id``,
which keeps the OUTPUT identical but makes the physical row placement
layout-dependent — indistinguishable rows have no deterministic
identity to salt by.) The same technique (auto-salt
on mega-hosts) lives inside the crawl scheduler
(operators/fused_schedule.py); this is the standalone relational form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on column ``on`` with the left
    side salted ``n_salt`` ways and the right side replicated to every
    salt. Output equals ``left.join(right, on, how)`` row-for-row.
    Supported ``how``: inner / left — flavors where a salted left row
    still sees every matching right row inside its salt bucket."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    payload = [c for c in left.columns if c != on]
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in payload]), F.lit(n_salt))
        if payload
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    l_s = left.withColumn("__salt", salt.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l_s.join(r_s, [on, "__salt"], how)
    return out.drop("__salt")
