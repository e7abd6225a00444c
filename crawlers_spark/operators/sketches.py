"""HyperLogLog distinct-count sketch with bit-exact cross-engine math.

The reference counts distinct keys by accumulating them in Python sets
(e.g. the seen-id sets in /root/reference/nft_go/get_nftgo1.1.py:200-210)
— O(cardinality) driver memory. At 10^10 keys a mergeable fixed-size
sketch is the only shape that works: this is Flajolet et al.'s
HyperLogLog (AofA 2007) with m = 256 registers, ~6.5% relative error,
64 bytes of state per group, arbitrarily mergeable (register-wise max).

Everything before the single final division is INTEGER arithmetic, so
the sketch is bit-identical across engines and oracle-checkable:

* the hash is the repo's md5 lane (60-bit int64 from the md5 hex prefix,
  identical in Spark and DuckDB — see queries.py dedup_minhash_md5);
* register index = ``h % m``; the remaining 52 bits feed the register;
* rho (position of the first set bit, counting from the LSB side — a
  reflection of the classic MSB scan, statistically identical because
  the bits are i.i.d.) is ``length(bin(rest & -rest))``, pure int ops;
* the harmonic sum is kept in EXACT int64: ``sum(2^(53 - rho))`` over
  registers (empty registers contribute 2^53), at most 256 * 2^53 < 2^62;
* the estimate is ONE double division of two exactly-known operands:
  ``alpha_m * m^2 * 2^53 / S`` — IEEE-identical in any engine;
* the small-range linear-counting correction (``m * ln(m / zeros)``
  below 2.5m) is the single non-rational step: both engines' ``ln`` are
  within 1 ulp and the final integer round absorbs that (measure-zero
  boundary, same exactness rule as the repo's cosine/sqrt queries).

Spark-side whole pipeline is JVM codegen (md5/conv/bin/bitwise + two
hash aggs); no Python touches the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256  # registers (p = 8 index bits out of the 60-bit lane)
RBITS = 52  # register payload bits: 60 - 8
RHO_CAP = RBITS + 1
# alpha_256 * m^2 * 2^(RHO_CAP): the whole numerator folded into ONE
# double literal (computed once here, embedded verbatim in oracle SQL)
ALPHA_M = 0.7213 / (1.0 + 1.079 / M)
EST_NUM = ALPHA_M * (M * M) * float(1 << RHO_CAP)


def _lane(col: str) -> str:
    """60-bit md5 lane of a string column (SQL fragment)."""
    return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"


# --- Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) ----------------
#
# Mergeable point-frequency sketch: D independent hash lanes, each a
# W-bucket counter row; estimate(key) = min over lanes of its bucket.
# State is a FIXED D*W int64 grid regardless of corpus size (the reference
# counts frequencies in unbounded Python dicts, e.g. the per-key tallies
# in its crawler stats; at 10^10 keys only a fixed-size mergeable grid
# works). Bit-exact across engines: the D lanes are four disjoint 32-bit
# slices of ONE md5 evaluation, bucket = lane mod W, and every count is
# int64 — no floats anywhere.

CMS_D = 4  # depth: md5's 128 bits give exactly four independent 32-bit lanes
CMS_W = 1024  # width: eps ~ 2/W of total mass per point query


def cms_buckets(col: str, k: int, width: int = CMS_W) -> str:
    """SQL fragment: bucket index of lane ``k`` (0-based) for a string
    column — the k-th 8-hex-char slice of md5, mod width. Non-negative,
    so ``%`` and ``pmod`` agree across engines."""
    return (
        f"cast(conv(substring(md5({col}), {1 + 8 * k}, 8), 16, 10) as bigint)"
        f" % {width}"
    )


def cms_estimate(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    out_col: str = "n_cms",
    depth: int = CMS_D,
    width: int = CMS_W,
) -> DataFrame:
    """Count-min estimates for every key in ``df`` (one row per key,
    ``weight_col`` its exact weight — callers pre-combine with a
    groupBy, the distributed analog of map-side combine; feeding raw
    occurrences gives the identical grid since CMS is linear in its
    input). Returns ``df``'s columns plus ``out_col``.

    Shape at scale: the grid is depth*width rows TOTAL (broadcast back
    for the lookup join), so sketch state never grows with the corpus —
    the one big shuffle is the caller's key combine. Persist ``df`` if
    it is expensive: the grid branch and the lookup branch each compile
    their own copy of its plan (Catalyst does not reuse the exchange
    across them)."""
    lanes = df.select(
        key_col,
        F.col(weight_col).alias("__w"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("lane"),
                    F.expr(cms_buckets(key_col, k, width)).alias("bucket"),
                )
                for k in range(depth)
            ])
        ).alias("__lb"),
    ).select(key_col, "__w", F.col("__lb.lane").alias("__lane"), F.col("__lb.bucket").alias("__bucket"))
    grid = lanes.groupBy("__lane", "__bucket").agg(F.sum("__w").alias("__bn"))
    est = (
        lanes.join(F.broadcast(grid), ["__lane", "__bucket"])
        .groupBy(key_col)
        .agg(F.min("__bn").cast("long").alias(out_col))
    )
    return df.join(est, key_col)


def cms_oracle_sql(
    wc_cte: str,
    key_col: str,
    weight_col: str,
    out_col: str = "n_cms",
    depth: int = CMS_D,
    width: int = CMS_W,
) -> str:
    """DuckDB fragment computing the identical grid + estimate over a
    CTE named ``wc_cte`` holding (key, exact weight) rows. Returns a
    SELECT yielding (key, out_col)."""
    lane = (
        f"(('0x' || substring(md5({key_col}), 1 + 8 * i.k, 8))::BIGINT) % {width}"
    )
    ks = ", ".join(f"({k})" for k in range(depth))
    return f"""
SELECT {key_col}, CAST(min(bn) AS BIGINT) AS {out_col}
FROM (
  SELECT {key_col}, i.k AS lane, {lane} AS bucket
  FROM {wc_cte}, (VALUES {ks}) AS i(k)
) lk
JOIN (
  SELECT i.k AS lane, {lane} AS bucket, sum({weight_col}) AS bn
  FROM {wc_cte}, (VALUES {ks}) AS i(k)
  GROUP BY 1, 2
) grid USING (lane, bucket)
GROUP BY 1
"""


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "n_hll"
) -> DataFrame:
    """Per-group HLL cardinality estimate of ``value_col`` (a string
    column; cast upstream). Two hash aggregations, no Python."""
    g = [F.col(c) for c in group_cols]
    pre = df.select(*g, F.expr(_lane(value_col)).alias("__h"))
    rest = F.expr(f"__h DIV {M}")
    rho = (
        F.when(rest == 0, F.lit(RHO_CAP))
        .otherwise(F.length(F.bin(F.expr(f"(__h DIV {M}) & -(__h DIV {M})"))))
        .cast("int")
    )
    regs = (
        pre.select(*g, F.pmod(F.col("__h"), F.lit(M)).alias("__reg"), rho.alias("__rho"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__mr"))
    )
    sums = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {RHO_CAP} - __mr)")).alias("__s"),
        F.count("*").alias("__used"),
    )
    s_total = F.col("__s") + (F.lit(M) - F.col("__used")) * F.lit(1 << RHO_CAP)
    raw = F.lit(EST_NUM) / s_total.cast("double")
    # small-range (linear counting) correction, Flajolet et al. §4: below
    # 2.5m the raw estimator saturates at alpha*m, so use m*ln(m/zeros).
    # ln is the one non-rational step; both engines' libm are within 1 ulp
    # (~3e-13 here), which the final integer round makes invisible except
    # on a measure-zero boundary (same rule as the cosine/sqrt queries).
    zeros = (F.lit(M) - F.col("__used")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (F.col("__used") < F.lit(M)),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros),
    ).otherwise(raw)
    return sums.select(
        *group_cols, F.round(est).cast("long").alias(out_col)
    )


def hll_oracle_sql(table: str, group_col: str, value_expr: str, out_col: str = "n_hll") -> str:
    """DuckDB SQL computing the identical sketch (same md5 lane, same
    integer register math, same single final division). Emitted as
    nested subqueries so callers can embed it inside their own WITH."""
    lane = f"('0x' || substring(md5({value_expr}), 1, 15))::BIGINT"
    raw = f"({EST_NUM!r} / CAST(s + ({M} - used) * (CAST(1 AS BIGINT) << {RHO_CAP}) AS DOUBLE))"
    est = (
        f"CASE WHEN {raw} <= {2.5 * M!r} AND used < {M} "
        f"THEN {float(M)!r} * ln({float(M)!r} / CAST({M} - used AS DOUBLE)) "
        f"ELSE {raw} END"
    )
    return f"""
SELECT {group_col},
       CAST(round({est}) AS BIGINT) AS {out_col}
FROM (
  SELECT {group_col},
         sum((CAST(1 AS BIGINT) << ({RHO_CAP} - mr))) AS s,
         count(*) AS used
  FROM (
    SELECT {group_col}, reg, max(rho) AS mr
    FROM (
      SELECT {group_col},
             ({lane}) % {M} AS reg,
             CASE WHEN ({lane}) // {M} = 0 THEN {RHO_CAP}
                  ELSE length(bin((({lane}) // {M}) & (-(({lane}) // {M}))))
             END AS rho
      FROM {table}
    ) rr GROUP BY 1, 2
  ) regs GROUP BY 1
) sums
"""
