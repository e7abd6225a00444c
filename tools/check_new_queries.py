"""Ad-hoc driver-compare for a named subset of queries (dev loop).

Usage: python tools/check_new_queries.py name1 name2 ... [--sf DIR]
Mimics tests/test_queries_oracle.py's compare (row count, sorted column
names, order-insensitive value hash) without the pytest machinery.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlers_spark.queries import QUERIES  # noqa: E402
from crawlers_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "\x01".join(_canon_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    names = args or [n for n, (_f, s) in QUERIES.items() if s is not None]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    spark = get_spark("check-new-queries")
    bad = 0
    for name in names:
        fn, sql = QUERIES[name]
        try:
            df = fn(spark, sf)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and _canon_rows(scols, srows) == _canon_rows(
            ocols, orows
        )
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={ok_schema} hash={ok_hash}"
        )
        if status == "FAIL":
            bad += 1
            if not ok_schema:
                print(f"  spark cols: {sorted(scols)}")
                print(f"  oracle cols: {sorted(ocols)}")
            else:
                a = _canon_rows(scols, srows)
                b = _canon_rows(ocols, orows)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"  spark:  {x!r}")
                    print(f"  oracle: {y!r}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
