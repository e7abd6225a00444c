"""Spark fetch stage: Arrow-batched ``mapInPandas`` over scheduled URLs.

One task fetches one partition's batch of URLs against the deterministic
synthetic web (sources/synthweb.py) — the Spark-parallel re-expression of
the reference's serial fetch loops (S2–S6 in SURVEY.md §2.1). Each input
row yields one output row carrying the page payload (image bytes +
caption + phash, exact ``input_hint`` columns) and the extracted child
links; callers ``posexplode`` the links for frontier fan-out (UDTF-style
1→N, reference analog /root/reference/nft/get_opensea_v1.1.py:243-297).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .synthweb import SynthWebConfig, fetch_pages_pdf

FETCH_RESULT_SCHEMA = (
    "url_canon string, url_hash long, host string, host_bucket int, priority long, "
    "generation int, fetch_offset_ms long, retry_count int, ok boolean, image_id string, "
    "bytes binary, w int, h int, fmt string, caption string, phash long, links array<string>"
)

_PASSTHROUGH = ["url_canon", "url_hash", "host", "host_bucket", "priority", "generation",
                "fetch_offset_ms", "retry_count"]


def fetch_scheduled(scheduled: DataFrame, web: SynthWebConfig, mirror: bool = True) -> DataFrame:
    """Fetch every scheduled URL; returns FETCH_RESULT_SCHEMA rows.

    ``retry_count`` (0 when the input lacks it) is the attempt number fed
    to the transient-failure model and echoed for the requeue policy."""
    from pyspark.sql import functions as F

    if "retry_count" not in scheduled.columns:
        scheduled = scheduled.withColumn("retry_count", F.lit(0))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fetched = fetch_pages_pdf(
                web, pdf["url_canon"], mirror=mirror,
                attempt=pdf["retry_count"].to_numpy(),
            )
            out = pdf[_PASSTHROUGH].reset_index(drop=True)
            fetched = fetched.reset_index(drop=True)
            for c in ["ok", "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "links"]:
                out[c] = fetched[c]
            yield out

    return scheduled.select(*_PASSTHROUGH).mapInPandas(run, schema=FETCH_RESULT_SCHEMA)
