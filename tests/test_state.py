"""Cuckoo filter + canonicalization unit tests."""

import numpy as np

from edgar_ray.state.canonical import canonicalize, url_sha1
from edgar_ray.state.cuckoo import CuckooFilter, hash_urls


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=4096)
    urls = [f"https://www.sec.gov/Archives/edgar/data/1/{i}/R{i % 9}.htm"
            for i in range(3000)]
    h = hash_urls(urls)
    fresh = f.add_many(h)
    assert fresh.all()
    assert f.contains_many(h).all()  # no false negatives, ever


def test_cuckoo_dedup_within_batch():
    f = CuckooFilter(capacity=1024)
    h = hash_urls(["https://a/x", "https://a/y", "https://a/x"])
    fresh = f.add_many(h)
    assert fresh.tolist() == [True, True, False]


def test_cuckoo_low_false_positive_rate():
    f = CuckooFilter(capacity=1 << 14)
    ins = hash_urls([f"https://h/{i}" for i in range(8000)])
    f.add_many(ins)
    probe = hash_urls([f"https://other/{i}" for i in range(8000)])
    fp_rate = f.contains_many(probe).mean()
    assert fp_rate < 0.01  # 16-bit fingerprints -> ~2^-13 expected


def test_cuckoo_serialize_roundtrip():
    f = CuckooFilter(capacity=2048)
    h = hash_urls([f"https://h/{i}" for i in range(1000)])
    f.add_many(h)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.contains_many(h).all()
    assert np.array_equal(f.table, g.table)
    # restored filter reports duplicates as not-fresh
    assert not g.add_many(h[:5]).any()


def test_canonicalize():
    assert canonicalize("HTTP://WWW.SEC.GOV:80/a?b=1&") == "http://www.sec.gov/a?b=1"
    assert canonicalize("https://www.sec.gov/x#frag") == "https://www.sec.gov/x"
    assert len(url_sha1("https://www.sec.gov/x")) == 20
