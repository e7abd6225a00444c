#!/usr/bin/env python
"""Regenerate QUERIES.md from the queries.py registry docstrings."""
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlers_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    lines = [
        "# Query catalog (generated from crawlers_spark/queries.py docstrings)",
        "",
        "One row per `queries()` entry in the driver contract. `oracle` = the",
        "driver value-hash-compares the Spark result against this DuckDB SQL at",
        "sf0.01; `rows-only` = not SQL-expressible (crawl/binary/hash-specific),",
        "pytest-verified instead. Regenerate with `python tools/gen_query_catalog.py`.",
        "",
        "| # | query | check | what it does |",
        "|---|---|---|---|",
    ]
    for i, (name, (fn, sql)) in enumerate(QUERIES.items(), 1):
        doc = inspect.getdoc(fn) or ""
        first = doc.split("\n\n")[0].replace("\n", " ").strip()
        if len(first) > 220:
            first = first[:217] + "..."
        first = first.replace("|", "\\|")
        lines.append(
            f"| {i} | `{name}` | {'oracle' if sql else 'rows-only'} | {first} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(QUERIES)} rows to {out}")


if __name__ == "__main__":
    main()
