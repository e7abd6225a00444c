"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship aggregation on sf0.001; ``queries`` /
``oracle_sql`` expose the full operator battery from
``crawlers_spark/queries.py`` (SURVEY.md §2 inventory + the training-data
toolkit + rows-only crawl-engine queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawlers_spark.queries import oracle_dict, q_pricing_summary, queries_dict  # noqa: E402
from crawlers_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ship_package(spark)
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ship_package(spark)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in queries_dict().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return oracle_dict()
