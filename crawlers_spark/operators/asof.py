"""As-of (time-travel) join: latest right row at-or-before each left row.

The classic time-series enrichment the reference performs serially —
"attach the most recent snapshot row to each observation" (reference
analog: per-coin latest-quote lookup attached row by row inside the
collection loop, /root/reference/coinmarketcap/coin_market_cap_api_2.0.py:200-206,283)
— re-expressed as ONE distributed pass with no range-explosion:

1. tag both inputs and union them on a common schema,
2. one shuffle on the join key,
3. per key, a single ordered window pass where each left row picks up
   ``last(<right col>, ignorenulls=True)`` over ``(time, side, tiebreak)``
   rows-unbounded-preceding — right rows at the same timestamp sort
   before left rows, giving at-or-before (``<=``) semantics.

Scale: cost is one exchange + one per-key sort (the same price as any
windowed agg); there is never an intermediate bigger than |L| + |R|.
A naive range join (``l.key = r.key AND r.ts <= l.ts`` + max-per-row)
materializes O(|L| x matches) pairs — quadratic per hot key — which is
why this union-window form is the 100-TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str],
    right_order: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` from the
    latest ``right`` row with the same ``on`` key and
    ``right_time <= left_time`` (nulls when none exists).

    ``right_order`` breaks ties among right rows sharing a timestamp
    (ascending; the LAST one wins). Payload column names must be
    disjoint between the two inputs.
    """
    right_order = list(right_order or [])
    left_pay = [c for c in left.columns if c not in on]
    l2 = left.select(
        *on,
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_pay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_order
            if c not in right_cols
        ],
    )
    r2 = right.select(
        *on,
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_pay],
        *[F.col(c) for c in right_cols],
        *[F.col(c) for c in right_order if c not in right_cols],
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*on)
        .orderBy(_TIME, _SIDE, *right_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *on,
        _TIME,
        _SIDE,
        *left_pay,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE, _TIME)
