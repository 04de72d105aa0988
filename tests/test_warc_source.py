"""WARC ingest edge: round-trip (plain + multi-member gzip), truncation
tolerance, and the full crawl running from a WARC-sourced pages factory."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from edgar_ray.sources.warc import (gunzip_members, parse_warc, read_warc,
                                    write_warc)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    from edgar_ray.sources.synth import write_corpus

    out = str(tmp_path_factory.mktemp("warc_corpus"))
    return write_corpus(out, 3, 2)


def _pages_table(corpus):
    t = pq.read_table(corpus["pages"])
    html = [(h if isinstance(h, bytes) else h.encode())
            for h in t["html"].to_pylist()]
    return pa.table({"url": t["url"],
                     "warc_ts": t["warc_ts"],
                     "html": pa.array(html, pa.binary())})


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(corpus, tmp_path, gz, ray_session):
    pages = _pages_table(corpus)
    path = os.path.join(tmp_path, "seg.warc" + (".gz" if gz else ""))
    write_warc(pages, path, gzip_records=gz)
    got = read_warc(path).to_pandas().sort_values("url").reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in want["html"]]
    # timestamps survive at second precision (the WARC-Date grain)
    assert (got["warc_ts"].dt.floor("s")
            == want["warc_ts"].dt.floor("s")).all()


def test_warc_multi_member_gzip(corpus, tmp_path):
    pages = _pages_table(corpus).slice(0, 5)
    path = os.path.join(tmp_path, "m.warc.gz")
    write_warc(pages, path, gzip_records=True)
    blob = open(path, "rb").read()
    # the writer emits one gzip member per record; a single-member reader
    # would see only the first record
    assert gunzip_members(blob).count(b"WARC/1.0") == 5
    assert len(parse_warc(blob)) == 5


def test_warc_truncation_yields_prefix(corpus, tmp_path):
    pages = _pages_table(corpus).slice(0, 4)
    path = os.path.join(tmp_path, "t.warc")
    write_warc(pages, path)
    blob = open(path, "rb").read()
    full = parse_warc(blob)
    assert len(full) == 4
    # cut mid-way through the SECOND record's bytes
    second = blob.find(b"WARC/1.0", 1)
    cut = parse_warc(blob[: second + 40])
    assert len(cut) == 1
    assert cut == full[:1]


def test_crawl_over_warc_source(corpus, tmp_path, ray_session):
    """The 3-wave crawl runs with WARC as the pages source and produces the
    same facts as the parquet path (vs the independent golden)."""
    from edgar_ray.pipelines.crawl import crawl

    pages = _pages_table(corpus)
    path = os.path.join(tmp_path, "pages.warc.gz")
    write_warc(pages, path, gzip_records=True)
    seeds = pq.read_table(corpus["seed_tickers"])
    warc_ds = read_warc(path).map_batches(
        lambda t: t.select(["url", "html"]), batch_format="pyarrow"
    ).materialize()
    res = crawl(None, seeds, pages_ds_factory=lambda: warc_ds, num_shards=2)
    facts = res.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c


def test_distributed_warc_sink_roundtrip(tmp_path, ray_session):
    """write_warc_segments: pages Dataset -> N .warc.gz segments via the
    block prefix-scan, read back through read_warc == the input, at an
    sf0.1-scale corpus (thousands of pages). A rerun skips finished
    segments (resumable)."""
    import ray.data as rd

    from edgar_ray.sources.synth import write_corpus
    from edgar_ray.sources.warc import read_warc, write_warc_segments

    d = os.path.join(tmp_path, "corpus")
    paths = write_corpus(d, n_tickers=40, filings_per_type=4)
    pages = pq.read_table(paths["pages"]).select(["url", "warc_ts", "html"])
    n = pages.num_rows
    assert n > 2000  # sf0.1-scale page count

    out = os.path.join(tmp_path, "segments")
    ds = rd.from_arrow(pages).repartition(8)
    manifest = write_warc_segments(ds, out, num_segments=6)
    assert manifest.num_rows == 6
    assert int(pa.compute.sum(manifest["n_records"]).as_py()) == n
    files = sorted(os.listdir(out))
    assert files == [f"part-{s:05d}.warc.gz" for s in range(6)]

    back = read_warc([os.path.join(out, f) for f in files]) \
        .to_arrow_refs()
    import ray as _ray
    got = pa.concat_tables([t for t in _ray.get(back) if t.num_rows]).combine_chunks()
    assert got.num_rows == n
    a = {(u, h): t for u, h, t in zip(got["url"].to_pylist(),
                                      got["html"].to_pylist(),
                                      got["warc_ts"].to_pylist())}
    b = {(u, (h if isinstance(h, bytes) else h.encode())): t
         for u, h, t in zip(pages["url"].to_pylist(),
                            pages["html"].to_pylist(),
                            pages["warc_ts"].to_pylist())}
    assert set(a) == set(b)
    # timestamps round-trip at WARC's second granularity
    for k in list(b)[:50]:
        assert int(a[k].timestamp()) == int(b[k].timestamp())

    # resumability: second run rewrites nothing (mtimes unchanged)
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    manifest2 = write_warc_segments(ds, out, num_segments=6)
    assert manifest2.num_rows == 6
    assert {f: os.path.getmtime(os.path.join(out, f)) for f in files} \
        == mtimes


def test_warc_sink_auto_segments(tmp_path, ray_session):
    """num_segments=None sizes segments from pass-1 payload bytes."""
    import ray.data as rd

    from edgar_ray.sources.warc import write_warc_segments

    pages = pa.table({
        "url": pa.array([f"https://x.test/{i}" for i in range(100)]),
        "html": pa.array([b"a" * 10_000] * 100, pa.binary()),
    })
    out = os.path.join(tmp_path, "auto")
    # 1 MB payload, 300 KB target -> ceil(1e6 / 3e5) = 4 segments
    m = write_warc_segments(rd.from_arrow(pages).repartition(5), out,
                            num_segments=None,
                            target_segment_bytes=300_000)
    assert m.num_rows == 4
    assert int(pa.compute.sum(m["n_records"]).as_py()) == 100


def test_wet_roundtrip(tmp_path, ray_session):
    """WET conversion records (the CC extracted-text format): unicode text
    round-trips byte-identically; truncation keeps the complete prefix."""
    from edgar_ray.sources.warc import parse_wet, read_wet, write_wet

    docs = pa.table({
        "url": pa.array([f"https://w.test/{i}" for i in range(6)]),
        "text": pa.array(["plain ascii", "unicodé 中文 ✓", "", "a\nb\r\nc",
                          "x" * 5000, "final"], pa.string()),
    })
    path = os.path.join(tmp_path, "d.wet.gz")
    write_wet(docs, path, gzip_records=True)
    got = read_wet(path).to_pandas().sort_values("url")
    want = docs.to_pandas().sort_values("url")
    assert got["text"].tolist() == want["text"].tolist()
    # truncation tolerance on the uncompressed form
    raw = os.path.join(tmp_path, "d.wet")
    write_wet(docs, raw)
    blob = open(raw, "rb").read()
    second = blob.find(b"WARC/1.0", 1)
    assert len(parse_wet(blob[: second + 30])) == 1
