"""Unit tests for the pure numpy/pandas kernels (no Spark)."""

import numpy as np
import pandas as pd
import pytest

from crawlers_spark.functions.hashing import fnv64, pmod_bucket, splitmix64
from crawlers_spark.functions.images import (
    phash64, png_decode, png_encode, ppm_decode, ppm_encode, psnr, quantize, synth_image,
)
from crawlers_spark.functions.urls import canon_urls, url_host
from crawlers_spark.operators.seen_set import (
    BloomParams, bloom_build_blob, bloom_merge_blobs, bloom_test_blob,
)
from crawlers_spark.sources.synthweb import (
    SynthWebConfig, fetch_pages_pdf, make_seed_urls, page_specs, parse_page_urls,
)


class TestHashing:
    def test_deterministic(self):
        s = pd.Series(["abc", "abd", "", "abc"])
        h = fnv64(s)
        assert h[0] == h[3] and h[0] != h[1]
        assert (fnv64(s) == h).all()

    def test_padding_no_collision(self):
        # "a" vs "a\x00"-like padding must not collide
        h = fnv64(pd.Series(["a", "a" + "\x00"]))
        assert h[0] != h[1]

    def test_distribution(self):
        n = 20000
        h = fnv64(pd.Series([f"http://h{i}.test/p/{i*7}" for i in range(n)]))
        assert len(np.unique(h)) == n
        buckets = pmod_bucket(h, 64)
        counts = np.bincount(buckets, minlength=64)
        assert counts.min() > n / 64 * 0.7 and counts.max() < n / 64 * 1.3

    def test_splitmix_avalanche(self):
        x = np.arange(1000, dtype=np.uint64)
        y = splitmix64(x)
        assert len(np.unique(y)) == 1000


CANON_CASES = [
    ("HTTP://WWW.Example.COM:80/a/b#frag", "http://example.com/a/b"),
    ("https://example.com:443/a/", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/x/../y/./z", "http://example.com/y/z"),
    ("http://example.com/p?utm_source=x&b=2&a=1", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?utm_source=x&utm_b=1", "http://example.com/p"),
    ("http://example.com./p/", "http://example.com/p"),
    ("  http://example.com/p  ", "http://example.com/p"),
    ("http://example.com//a///b", "http://example.com/a/b"),
]


class TestCanon:
    @pytest.mark.parametrize("raw,expected", CANON_CASES)
    def test_cases(self, raw, expected):
        assert canon_urls(pd.Series([raw])).iloc[0] == expected

    def test_batch_matches_single(self):
        raws = pd.Series([r for r, _ in CANON_CASES])
        batch = canon_urls(raws)
        for i, (_, expected) in enumerate(CANON_CASES):
            assert batch.iloc[i] == expected

    def test_idempotent(self):
        once = canon_urls(pd.Series([r for r, _ in CANON_CASES]))
        twice = canon_urls(once)
        assert (once == twice).all()

    def test_host(self):
        assert url_host(pd.Series(["http://a.b.test:8080/x?q=1"])).iloc[0] == "a.b.test"


class TestImages:
    def test_png_roundtrip(self):
        px = synth_image(99, 64, 32)
        assert (png_decode(png_encode(px)) == px).all()

    def test_ppm_roundtrip(self):
        px = synth_image(7, 32, 128)
        assert (ppm_decode(ppm_encode(px)) == px).all()

    def test_quantize_psnr_above_40(self):
        for seed in [1, 12345, 999999]:
            px = synth_image(seed, 128, 128)
            assert psnr(px, quantize(px)) >= 40.0

    def test_phash_deterministic_and_discriminative(self):
        a, b = synth_image(1, 64, 64), synth_image(2, 64, 64)
        assert phash64(a) == phash64(a)
        assert phash64(a) != phash64(b)

    def test_synth_deterministic(self):
        assert (synth_image(5, 32, 32) == synth_image(5, 32, 32)).all()


class TestBloom:
    def test_no_false_negatives(self):
        params = BloomParams.size_for(5000, fpp=0.01, n_buckets=1)
        keys = fnv64(pd.Series([f"u{i}" for i in range(5000)]))
        blob = bloom_build_blob(keys, params)
        assert bloom_test_blob(keys, blob, params).all()

    def test_fpr_bounded(self):
        params = BloomParams.size_for(5000, fpp=0.01, n_buckets=1)
        keys = fnv64(pd.Series([f"u{i}" for i in range(5000)]))
        blob = bloom_build_blob(keys, params)
        probe = fnv64(pd.Series([f"v{i}" for i in range(20000)]))
        fpr = bloom_test_blob(probe, blob, params).mean()
        assert fpr < 0.03, fpr

    def test_merge_is_union(self):
        params = BloomParams(n_buckets=1, bits_per_bucket=1 << 14, n_hashes=5)
        a = fnv64(pd.Series([f"a{i}" for i in range(100)]))
        b = fnv64(pd.Series([f"b{i}" for i in range(100)]))
        merged = bloom_merge_blobs(bloom_build_blob(a, params), bloom_build_blob(b, params))
        assert bloom_test_blob(np.concatenate([a, b]), merged, params).all()

    def test_empty_blob(self):
        params = BloomParams()
        assert not bloom_test_blob(np.array([1, 2], np.int64), None, params).any()


class TestSynthWeb:
    def test_seed_variants_canonicalize(self):
        cfg = SynthWebConfig()
        seeds = make_seed_urls(cfg, 500)
        canon = canon_urls(seeds["url"])
        hi, _ = parse_page_urls(canon)
        assert (hi >= 0).all()

    def test_fetch_deterministic(self):
        cfg = SynthWebConfig()
        canon = canon_urls(make_seed_urls(cfg, 50)["url"])
        a, b = fetch_pages_pdf(cfg, canon), fetch_pages_pdf(cfg, canon)
        assert (a["caption"] == b["caption"]).all()
        assert (a["phash"] == b["phash"]).all()

    def test_mirror_lossy_within_psnr(self):
        from crawlers_spark.functions.images import decode_image

        cfg = SynthWebConfig()
        canon = canon_urls(make_seed_urls(cfg, 120)["url"]).drop_duplicates()
        mirrored = fetch_pages_pdf(cfg, canon, mirror=True)
        pristine = fetch_pages_pdf(cfg, canon, mirror=False)
        checked = 0
        for i in range(len(mirrored)):
            if not mirrored["ok"].iloc[i]:
                continue
            fmt = mirrored["fmt"].iloc[i]
            m = decode_image(mirrored["bytes"].iloc[i], fmt)
            p = decode_image(pristine["bytes"].iloc[i], fmt)
            if fmt == "ppm":
                assert psnr(p, m) >= 40.0
                checked += 1
            else:
                assert (p == m).all()
        assert checked > 0  # lossy path exercised
