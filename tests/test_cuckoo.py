"""Cuckoo-filter kernel: no false negatives, bounded FPR, deletions."""

from __future__ import annotations

import numpy as np

from crawlers_spark.operators.cuckoo import CuckooFilter, CuckooParams

RNG = np.random.RandomState(123)


def _fresh(n=20_000):
    keys = RNG.randint(-(2**62), 2**62, n).astype(np.int64)
    cf = CuckooFilter(CuckooParams.size_for(n))
    failed = cf.insert(keys)
    return cf, keys, failed


def test_no_false_negatives():
    cf, keys, failed = _fresh()
    assert failed == 0
    assert cf.contains(keys).all()


def test_fpr_bounded():
    cf, keys, _ = _fresh()
    probe = RNG.randint(-(2**62), 2**62, 50_000).astype(np.int64)
    probe = probe[~np.isin(probe, keys)]
    fpr = cf.contains(probe).mean()
    # 16-bit fingerprints, 4-way: theoretical FPR ~ 8/2^16 ~ 1.2e-4
    assert fpr < 0.002, fpr


def test_delete_then_absent():
    cf, keys, _ = _fresh(5_000)
    victims = keys[:500]
    ok = cf.delete(victims)
    assert ok.all()
    # a deleted key may still test positive if ANOTHER key shares its
    # (fingerprint, bucket-pair) — bounded by the fp collision rate
    assert cf.contains(victims).mean() < 0.01
    # survivors stay present except (fp, bucket-pair) collisions with a
    # deleted victim — bounded by the fingerprint collision rate
    assert cf.contains(keys[500:]).mean() > 0.999


def test_roundtrip_and_merge():
    p = CuckooParams.size_for(4_000)
    a, b = CuckooFilter(p), CuckooFilter(p)
    ka = RNG.randint(-(2**62), 2**62, 2_000).astype(np.int64)
    kb = RNG.randint(-(2**62), 2**62, 2_000).astype(np.int64)
    a.insert(ka)
    b.insert(kb)
    a2 = CuckooFilter.from_bytes(a.to_bytes(), p)
    assert a2.contains(ka).all()
    merged = a2.merge(b)
    assert merged.contains(ka).all()
    assert merged.contains(kb).all()


def test_insert_idempotent_across_pair_orientations():
    """Two keys sharing (fingerprint, unordered bucket pair) but entering
    via opposite orientations (i1(a) == i2(b)) must store ONE copy in a
    single insert batch, exactly like the scalar _place path — the
    vectorized bulk rounds previously double-placed this collision class
    (delete() then left a stranded copy, breaking the documented
    fingerprint-idempotence)."""
    p = CuckooParams(n_buckets_pow2=64)
    cf = CuckooFilter(p)
    rng = np.random.RandomState(7)
    cand = rng.randint(-(2**62), 2**62, 400_000).astype(np.int64)
    fp = cf._fingerprints(cand)
    i1 = cf._index1(cand)
    i2 = cf._alt_index(i1, fp)
    lo, hi = np.minimum(i1, i2), np.maximum(i1, i2)
    key = (lo.astype(np.uint64) << np.uint64(32)) | (
        hi.astype(np.uint64) << np.uint64(16)
    ) | fp.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    dup = np.flatnonzero(ks[1:] == ks[:-1])
    pairs = [
        (order[d], order[d + 1])
        for d in dup
        if i1[order[d]] != i1[order[d + 1]]  # opposite orientations
    ]
    assert pairs, "fixture search found no orientation collision; widen the sample"
    a, b = pairs[0]
    batch = np.array([cand[a], cand[b]], np.int64)
    assert cf.insert(batch) == 0
    f = fp[a]
    copies = int((cf.table[i1[a]] == f).sum() + (cf.table[i2[a]] == f).sum())
    assert copies == 1, f"expected one shared copy, found {copies}"
    assert cf.contains(batch).all()
