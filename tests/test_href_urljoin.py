"""Differential check: the href_resolve law vs urllib.parse.urljoin.

The registered oracle already proves Spark == DuckDB; this pins BOTH to
the RFC 3986 reference implementation in the Python stdlib for every
planted case. One documented divergence: a fragment-only href resolves
to the bare base (crawler-canonical — canon strips fragments before the
frontier), where urljoin keeps '#frag' appended.
"""

from __future__ import annotations

from urllib.parse import urljoin

import duckdb

from crawlers_spark.queries import ORACLE_HREF_RESOLVE

HREFS = {
    "absolute": "http://other.test/x/y",
    "protocol_relative": "//cdn.test/img/logo.png",
    "root_relative": "/root/section/item",
    "relative": "../.././up/./two",
    "fragment": "#frag",
}


def test_href_resolve_matches_urljoin_on_all_planted_cases():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    )
    rows = con.execute(ORACLE_HREF_RESOLVE).fetchall()
    cols = [d[0] for d in con.description]
    assert rows
    i_kind, i_base, i_res = (
        cols.index("kind"), cols.index("base"), cols.index("resolved")
    )
    for r in rows:
        kind, base, resolved = r[i_kind], r[i_base], r[i_res]
        href = HREFS[kind]
        if kind == "fragment":
            expect = base  # crawler-canonical: fragment-only -> base
        else:
            expect = urljoin(base, href)
        assert resolved == expect, (kind, base, resolved, expect)
    con.close()
