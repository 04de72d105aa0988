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


def _candidates(rows):
    """rows: (url, host, seed_rank, filing_type, filed_date, report_num)."""
    import pyarrow as pa

    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "host": pa.array([r[1] for r in rows], pa.string()),
        "seed_rank": pa.array([r[2] for r in rows], pa.int32()),
        "filing_type": pa.array([r[3] for r in rows], pa.string()),
        "filed_date": pa.array([r[4] for r in rows], pa.string()),
        "report_num": pa.array([r[5] for r in rows], pa.int32()),
    })


def test_frontier_multi_host(ray_session):
    """Politeness budgets are per-host-independent; robots rules only block
    their own host; dedup spans hosts via url-hash shards."""
    from edgar_ray.state.frontier import Frontier

    f = Frontier(num_shards=2, capacity=4096, host_budget=2.0,
                 robots_rules={"b.com": ["https://b.com/private/"]})
    rows = [
        (f"https://a.com/p{i}", "a.com", 0, "10-K", "2018-01-01", i)
        for i in range(4)
    ] + [
        (f"https://b.com/p{i}", "b.com", 0, "10-K", "2018-01-01", i)
        for i in range(4)
    ] + [
        ("https://b.com/private/x", "b.com", 0, "10-K", "2018-01-01", 9),
        ("https://a.com/p0", "a.com", 1, "10-K", "2017-01-01", 0),  # dup url
    ]
    admitted = f.admit_wave(_candidates(rows), 0)
    urls = admitted["url"].to_pylist()
    assert "https://b.com/private/x" not in urls       # robots (host-scoped)
    assert urls.count("https://a.com/p0") == 1         # cross-batch dup dropped
    assert len(urls) == 8
    # the duplicate's WINNER is the higher-priority copy (seed_rank 0)
    row = admitted.filter(
        __import__("pyarrow").compute.equal(admitted["url"], "https://a.com/p0")
    ).to_pylist()[0]
    assert row["seed_rank"] == 0

    # per-host politeness: each host's slots start at 0 and step by 1/budget
    by_host = {}
    for r in admitted.sort_by([("seq", "ascending")]).to_pylist():
        by_host.setdefault(r["host"], []).append(r["scheduled_at"])
    for host, slots in by_host.items():
        assert slots == sorted(slots)
        assert abs(slots[0]) < 1e-9, host  # independent clocks
        diffs = [b - a for a, b in zip(slots, slots[1:])]
        assert all(abs(d - 0.5) < 1e-9 for d in diffs), host  # 1/2.0 rps

    # a second wave re-offering the same urls dedups everything
    again = f.admit_wave(_candidates(rows[:4]), 1)
    assert again.num_rows == 0
    lineage = f.lineage_table().to_pylist()
    assert sum(r["robots_blocked"] or 0 for r in lineage) == 1


def test_cuckoo_high_load():
    """Inserts stay reliable near the ~95% design load for 4-slot buckets."""
    cap = 1 << 12  # 4096 slots
    f = CuckooFilter(cap)
    n = int(cap * 0.94)
    h = hash_urls([f"https://load/{i}" for i in range(n)])
    fresh = f.add_many(h)
    # a tiny fraction may be cuckoo false-positive "dups"; everything else
    # must insert, and membership must hold for all inserted keys
    assert fresh.sum() >= n * 0.98
    assert f.contains_many(h).all()
    assert f.count == int((f.table != 0).sum())


def test_cuckoo_overflow_counted_not_masked():
    """A saturated filter reports insert failures via .overflow instead of
    silently dropping keys as if they were duplicates."""
    f = CuckooFilter(capacity=64)  # tiny: rounds to 16 buckets x 4 slots
    h = hash_urls([f"https://h/{i}" for i in range(500)])
    fresh = f.add_many(h)
    dropped = int((~fresh).sum())
    assert dropped > 0               # far over capacity: some must fail
    assert f.overflow > 0            # ...and every failure is counted
    # distinct keys: not-fresh == overflow (nothing masquerades as a dup)
    assert f.overflow == dropped


def test_frontier_shard_overflow_in_lineage(ray_session):
    """The per-wave lineage row separates seen_set_overflow from dedup_hits.
    With the growable seen-set a 8x-over-capacity wave produces NO overflow
    (the shard grows instead) and nothing is miscounted as a dup; the
    overflow column remains as the counted last-resort for pathological
    eviction failures."""
    import ray as _ray

    from edgar_ray.state.frontier import FrontierShard

    shard = FrontierShard.remote(0, capacity=64)
    h = hash_urls([f"https://h/{i}" for i in range(500)])
    _ray.get(shard.add_keys.remote(h, 0))
    rows = _ray.get(shard.lineage_rows.remote())
    assert len(rows) == 1
    r = rows[0]
    assert r["seen_set_overflow"] == 0   # grown, not dropped
    assert r["seen_set_reshards"] >= 1
    assert r["dedup_hits"] == 0      # all keys distinct: none were dups
    assert r["admitted"] + r["seen_set_overflow"] == r["urls_in"]


def test_admit_tiebreak_parity_duplicate_metadata(ray_session):
    """Duplicate copies of one canonical URL that tie on all priority
    components but differ in metadata resolve by the SHARED _TIE_COLS
    comparator on the driver path — identical to the distributed
    bucket_admit winner (min doc_type here), regardless of arrival order."""
    import pyarrow as pa

    from edgar_ray.state.frontier import Frontier

    url = "https://www.sec.gov/Archives/edgar/data/9/idx.htm"
    base = _candidates([(url, "www.sec.gov", 0, "10-K", "2020-01-01", 0),
                        (url, "www.sec.gov", 0, "10-K", "2020-01-01", 0)])
    # arrival order puts doc_type 'z-last' FIRST: stable first-arrival would
    # keep it; the _TIE_COLS comparator must keep 'a-first'
    cand = base.append_column(
        "doc_type", pa.array(["z-last", "a-first"], pa.string()))
    f = Frontier(num_shards=2, capacity=4096, host_budget=1000.0)
    admitted = f.admit_wave(cand, wave=0)
    assert admitted.num_rows == 1
    assert admitted["doc_type"].to_pylist() == ["a-first"]
    # lineage counts the dropped copy as a dedup hit (urls_in stays 2)
    rows = [r for r in f.lineage_table().to_pylist() if r["shard"] >= 0]
    assert sum(r["urls_in"] for r in rows) == 2
    assert sum(r["dedup_hits"] for r in rows) == 1


def test_growable_cuckoo_reshards_past_design_load():
    """Driving a shard far past its design capacity grows new layers
    (recorded events) with ZERO overflow-masked admissions: every distinct
    key either inserts fresh or is a counted in-layer fingerprint dup —
    nothing is dropped."""
    from edgar_ray.state.cuckoo import GrowableCuckoo

    g = GrowableCuckoo(capacity=256)  # design load ~230 keys
    h = hash_urls([f"https://grow/{i}" for i in range(5000)])
    fresh = g.add_many(h)
    assert g.overflow == 0                      # nothing dropped
    assert len(g.growth_events) >= 1            # reshard happened + recorded
    assert g.growth_events[0]["new_capacity"] >= 512
    assert g.contains_many(h).all()             # no false negatives
    # distinct keys: allow only a tiny fp-collision "dup" fraction
    assert fresh.sum() >= 5000 * 0.995
    # a second offer of the same keys dedups across layers
    assert not g.add_many(h).any()
    # checkpoint round-trips the whole layer stack
    g2 = GrowableCuckoo.from_bytes(g.to_bytes())
    assert g2.contains_many(h).all()
    assert len(g2.layers) == len(g.layers)
    # ...and incremental inserts after restore keep working
    h2 = hash_urls([f"https://grow2/{i}" for i in range(1000)])
    assert g2.add_many(h2).sum() >= 1000 * 0.99
    assert g2.overflow == 0


def test_frontier_shard_reshard_in_lineage(ray_session):
    """A FrontierShard whose waves exceed the initial capacity records the
    growth in its lineage rows (seen_set_reshards) and keeps admitting."""
    import ray as _ray

    from edgar_ray.state.frontier import FrontierShard

    shard = FrontierShard.remote(0, capacity=128)
    h1 = hash_urls([f"https://a/{i}" for i in range(100)])
    h2 = hash_urls([f"https://b/{i}" for i in range(400)])
    f1 = _ray.get(shard.add_keys.remote(h1, 0))
    f2 = _ray.get(shard.add_keys.remote(h2, 1))
    assert f1.sum() >= 99 and f2.sum() >= 398  # all admitted (mod fp dups)
    rows = _ray.get(shard.lineage_rows.remote())
    assert sum(r["seen_set_overflow"] for r in rows) == 0
    assert sum(r["seen_set_reshards"] for r in rows) >= 1
