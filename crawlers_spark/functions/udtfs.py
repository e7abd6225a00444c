"""Python UDTF surface (Spark 4 table functions).

Completes the UDF/UDAF/UDTF family of SURVEY.md §2.9: scalar Arrow UDFs
(urls/hashing), pandas grouped/cogrouped kernels (fused scheduler), and
here a table function. The engine's position stays: the DECLARATIVE
form (``transform(sequence(...)) + explode``, see dedup.word_shingles)
is the hot path — codegen'd, no Python workers; the UDTF exists for
logic Catalyst genuinely can't express (imperative per-row expansion
with state across yielded rows), and the test pins that on expressible
logic both forms return identical rows, so reaching for the UDTF is an
explicit choice, not an accident.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class WordNGrams:
    """Emit (position, word n-gram) rows for one text value.

    Whitespace tokenization, lowercased — mirrors
    ``dedup.normalize_text`` + the shingle transform so the two paths
    are row-identical on any input.
    """

    def eval(self, text: str, n: int):  # noqa: D102
        words = (text or "").lower().split()
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL callers (lateral join syntax)."""
    spark.udtf.register("word_ngrams", WordNGrams)
