"""crawlers_spark — a PySpark-native URL-frontier & fetch-scheduler engine.

A from-scratch re-expression of the capabilities of tf-swarm/Crawlers
(reference at /root/reference, see SURVEY.md) as an idiomatic Spark
DataFrame + vectorized pandas/Arrow-UDF pipeline:

* ``functions``  — vectorized kernels: URL canonicalization + 64-bit
  hashing, numpy image codecs (PNG/PPM), perceptual hash, PSNR,
  text-analysis functions (lang-id, quality, tokens, fingerprints).
* ``sources``    — table IO facade (Parquet now, Iceberg-compatible
  layout), the deterministic synthetic web + ``mapInPandas`` fetch stage.
* ``operators``  — partitioned Bloom seen-set (treeAggregate merge),
  politeness-aware priority scheduler, dedup family (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  near-dup cluster closure (connected components), deterministic
  mixture sampling + benchmark decontamination.
* ``plans``      — the generation crawl loop with checkpoint/resume,
  per-partition lineage and metrics.
* ``streaming``  — Structured-Streaming generation driver.

Everything data-parallel is DataFrame-first; Python appears only inside
Arrow-batched pandas UDFs (no per-row Python in any hot path).
"""

__version__ = "0.1.0"
