"""Deduplication family for training-data pipelines — all Catalyst-side.

Five strategies over a documents table (doc_id, text), each expressed
with built-in expressions (whole-stage codegen, map-side partial aggs) —
no Python in any hot path:

* exact          — md5 fingerprint of normalized text, keep min doc_id.
* minhash_lsh    — word-shingle MinHash signatures (k independent hash
  functions via seeded ``xxhash64(seed, j, shingle_hash)`` — wraparound-
  free, so safe under Spark 4 ANSI arithmetic), banded into LSH buckets;
  candidate pairs verified with exact Jaccard. The scale path: only
  same-band pairs are joined, never the full cross product.
* simhash        — 64-bit sign-vote fingerprint over word hashes;
  near-dups = equal simhash (or small hamming distance on a band join).
* ngram_jaccard  — exact Jaccard over word n-grams for candidate pairs.
* embedding near-dup — see similarity.py (cosine over vector columns).

Reference analog: the reference dedups only by exact membership in
Python lists (/root/reference/coinmarketcap/coin_market_cap_api_2.0.py:136-144);
the near-dup family is the 100 TB-scale extension the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def normalize_text(col):
    """Lower, collapse whitespace, strip — shared by all strategies."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: (fingerprint, keep_id, n_dups)."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            (F.count("*") - F.lit(1)).alias("n_dups"),
        )
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle_hash) — distinct word k-grams as int64 hashes.

    One codegen'd projection: ``transform(sequence(0, size(w)-k), i ->
    xxhash64(gram))`` + explode — ZERO shuffles before the distinct
    (the previous posexplode + k-way self-equi-join form shuffled
    (id, pos, word) triples k times; this is ~2.5x faster with
    set-identical output). The size guard matters: sequence() goes
    descending for docs shorter than k words and w[i+j] would index out
    of bounds.
    """
    w = F.split(normalize_text(F.col(text_col)), " ")
    # the gram CONCAT stays in the (interpreted) lambda, but the hash is
    # hoisted to a post-explode column so it runs in whole-stage codegen
    # — HOF lambda bodies are evaluated interpreted per element, and
    # xxhash64 was the expensive part (~15% off the shingle stage,
    # hash-identical output)
    gram_expr = F.expr(
        f"transform(sequence(0, size(w) - {k}),"
        f" i -> concat_ws(' ', {', '.join(f'w[i+{j}]' for j in range(k))}))"
    )
    return (
        df.select(F.col(id_col), w.alias("w"))
        .filter(F.size("w") >= k)
        .select(id_col, F.explode(gram_expr).alias("g"))
        .select(id_col, F.xxhash64("g").alias("shingle_hash"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", n_perm: int = 16, seed: int = 42
) -> DataFrame:
    """(id, sig_0..sig_{n-1}) — one hash-min aggregation, n_perm agg exprs.

    Each "permutation" j is the independent hash x → xxhash64(seed, j, x)
    (wraparound-free under ANSI arithmetic, all inside codegen). Map-side
    partial min means no extra shuffle beyond the groupBy(id).
    """
    aggs = [
        F.min(F.xxhash64(F.lit(seed), F.lit(j), F.col("shingle_hash"))).alias(f"sig_{j}")
        for j in range(n_perm)
    ]
    return shingles.groupBy(F.col(id_col)).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", n_bands: int = 4
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 LSH band bucket.

    Band value = xxhash64 of the band's signature slice; the self-join is
    an equi-join on (band_idx, band_hash) — shuffle-partitioned by
    bucket, never a cross product. Hot buckets are exactly the skew AQE's
    skew-join splitting handles.
    """
    sig_cols = [c for c in signatures.columns if c.startswith("sig_")]
    rows_per_band = max(1, len(sig_cols) // n_bands)
    bands = []
    for b in range(n_bands):
        chunk = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        bands.append(F.struct(F.lit(b).alias("band_idx"), F.xxhash64(*chunk).alias("band_hash")))
    exploded = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, id_col: str = "doc_id", threshold: float = 0.7
) -> DataFrame:
    """Exact Jaccard for candidate pairs: |A∩B| via join, |A∪B| = |A|+|B|-∩."""
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle_hash")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle_hash")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle_hash"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full pipeline: shingle → sign → band → verify. Returns verified
    near-dup pairs (id_a, id_b, jaccard)."""
    sh = word_shingles(df, text_col, id_col, k_shingle)
    sig = minhash_signatures(sh, id_col, n_perm)
    cand = lsh_candidate_pairs(sig, id_col, n_bands)
    return jaccard_verify(cand, sh, id_col, threshold)


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 64-bit sign-vote fingerprint, pure aggregation.

    bit_i = 1 iff Σ_words (2·bit_i(xxhash64(w)) - 1) > 0; computed as 64
    conditional-sum agg expressions (codegen'd), one shuffle on id.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).withColumn("wh", F.xxhash64("w"))
    votes = [
        F.sum(F.shiftright(F.col("wh"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{i}")
        for i in range(64)
    ]
    agg = words.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0))
        )
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash60_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 60-bit sign-vote fingerprint with an ORACLE-PORTABLE
    word hash: the first 15 hex chars of md5(word) parsed as an integer,
    which evaluates to the identical int64 in Spark SQL
    (``conv(substring(md5(w),1,15),16,10)``) and DuckDB
    (``('0x' || substring(md5(w),1,15))::BIGINT``) — so the banded
    near-dup pipeline downstream is fully checkable cross-engine, unlike
    the xxhash64 variant (simhash64). 60 bits keep the value inside a
    signed BIGINT without overflow in either engine."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).withColumn(
        "wh", F.expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)")
    )
    votes = [
        F.sum(F.shiftright(F.col("wh"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{i}")
        for i in range(60)
    ]
    agg = words.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(60):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0))
        )
    return agg.select(F.col(id_col), sim.alias("simhash"))


def hamming64(a, b):
    """Popcount of XOR via bit_count (Spark 3.4+)."""
    return F.bit_count(a.bitwiseXOR(b))


def hash_band_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """Complete hamming-<=k pair enumeration over a 64-bit hash column.

    Splits the hash into ``k+1`` disjoint bands (pigeonhole: a pair
    differing in <= k bits must agree on at least one band), equi-joins
    per band, then verifies with exact ``bit_count(xor)``. Never an
    all-pairs crossJoin — the band equi-join shuffles on (band_idx,
    band_val) and AQE skew-split bounds hot bands. Zero false negatives
    by construction (asserted vs brute force in tests/test_kernels.py);
    cost grows with band-collision frequency, so k stays small
    (band width = 64 // (k+1) bits).
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    assert width >= 4, "max_hamming too large: bands narrower than 4 bits"
    mask = (1 << width) - 1
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band_idx"),
            F.shiftright(F.col(hash_col), i * width).bitwiseAND(F.lit(mask)).alias("band_val"),
        )
        for i in range(n_bands)
    ])
    e = df.select(id_col, hash_col, F.explode(bands).alias("b")).select(
        id_col, hash_col, "b.band_idx", "b.band_val"
    )
    return (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming64(F.col(f"l.{hash_col}"), F.col(f"r.{hash_col}")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def shingle_candidate_pairs(
    shingles: DataFrame, id_col: str = "doc_id", df_cap: int = 64
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 shingle, bounded by a
    document-frequency cap.

    Without the cap, one shingle shared by d documents contributes d²/2
    candidate pairs — a stop-word 3-gram in 10⁵ docs makes 10¹⁰ pairs (a
    scale-killer on a real corpus). Shingles with document frequency >
    ``df_cap`` are excluded from candidate GENERATION only (verification
    still counts them), bounding any shingle's contribution at df_cap²/2.
    Pairs whose every shared shingle is hot are missed — on a near-dup
    workload such pairs share mostly rare shingles, and the oracle SQL
    mirrors the same cap so the check stays exact.
    """
    freq = shingles.groupBy("shingle_hash").agg(F.count("*").alias("df"))
    hot = freq.filter(F.col("df") > df_cap).select("shingle_hash")
    # hot list is tiny by construction (few shingles exceed the cap) —
    # broadcast anti-join, no shuffle of the shingle table
    cold = shingles.join(F.broadcast(hot), "shingle_hash", "left_anti")
    return (
        cold.alias("a")
        .join(
            cold.alias("b"),
            (F.col("a.shingle_hash") == F.col("b.shingle_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    divisor: int = 8,
) -> DataFrame:
    """Content-defined chunking at word granularity: (id, chunk_id,
    chunk_text, n_words) with boundaries decided by each word's own
    hash, not its position.

    A word is the LAST word of its chunk when its 60-bit md5 lane is
    ``0 mod divisor`` — so chunk boundaries depend only on local
    content (expected chunk length = ``divisor`` words). That is the
    property fixed-stride shingles lack: prepending one word to a
    document shifts EVERY k-gram, but here all chunks after the first
    surviving boundary re-synchronize and hash identically, which is
    what lets chunk-level dedup catch documents that share a long tail
    after divergent headers (the FastCDC/rsync boundary idea applied to
    tokens; boundary hash = the repo's cross-engine md5 lane so the
    whole pass is oracle-checkable).

    Shape at scale: posexplode is per-row local; the only shuffle is
    the per-document window that turns boundary flags into chunk ids
    (partitioned by document — bounded by max doc length, never corpus
    size), then one hash-agg rebuilds chunk text. Reference analog: the
    reference dedups fetched pages byte-exact per URL
    (/root/reference/utils/call_mysql.py's keyed upserts); chunk-level
    dedup is the corpus-curation generalization.
    """
    lane = "cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)"
    toks = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "pos", "w"
            ),
        )
        .filter(F.col("w") != "")
        .withColumn("cut", (F.expr(lane) % divisor == 0).cast("long"))
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = toks.withColumn("chunk_id", F.coalesce(F.sum("cut").over(win), F.lit(0)))
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count("*").alias("n_words"),
        )
    )
