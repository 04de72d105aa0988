"""Depth-N web-graph crawl: the frontier-driven loop vs the spec-level
golden evaluator (sources/synth_graph.py) on an 8-wave mixed-class corpus."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from edgar_ray.pipelines.crawl import crawl
from edgar_ray.pipelines.webgraph import web_graph
from edgar_ray.sources.synth_graph import (
    gen_graph_corpus,
    simulate_crawl,
    web_seed_candidates,
    write_graph_corpus,
)

SITES, BRANCHING, DEPTH = 4, 2, 7


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("webgraph"))
    write_graph_corpus(d, SITES, BRANCHING, DEPTH)
    return d


@pytest.fixture(scope="module")
def crawl_result(corpus_dir):
    seeds = web_seed_candidates(SITES)
    return crawl(os.path.join(corpus_dir, "pages.parquet"), None,
                 graph=web_graph(), seed_candidates=seeds, num_shards=2)


def test_corpus_deterministic():
    a = gen_graph_corpus(2, 2, 4)
    b = gen_graph_corpus(2, 2, 4)
    assert a["pages"].equals(b["pages"])
    assert a["crawl_order_golden"].equals(b["crawl_order_golden"])
    assert a["site_stats_golden"].equals(b["site_stats_golden"])


def test_runs_depth_waves(crawl_result):
    # hubs at depths 0..6 crawl in waves 0..6; leaves trail one wave behind,
    # so the final (pure-leaf) wave is wave 7 — 8 waves, frontier-driven
    waves = [w for w in crawl_result.metrics["wave_timings"]
             if isinstance(w, int)]
    assert max(waves) == DEPTH
    assert crawl_result.metrics["waves_run"] == DEPTH + 1
    # middle waves are MIXED: hubs expand while leaves extract
    wt = crawl_result.metrics["wave_timings"]
    for w in range(1, DEPTH):
        assert 0 < wt[w]["pages_terminal"] < wt[w]["pages"], w
    assert wt[DEPTH]["pages_terminal"] == wt[DEPTH]["pages"]


def test_crawl_order_matches_golden(crawl_result, corpus_dir):
    golden = pq.read_table(os.path.join(corpus_dir,
                                        "crawl_order_golden.parquet"))
    got = crawl_result.crawl_order.select(["seq", "wave", "url", "host"])
    got = got.sort_by("seq")
    assert got.num_rows == golden.num_rows
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    assert got["wave"].to_pylist() == golden["wave"].to_pylist()
    assert got["host"].to_pylist() == golden["host"].to_pylist()


def test_facts_match_golden(crawl_result, corpus_dir):
    golden = pq.read_table(os.path.join(corpus_dir,
                                        "site_stats_golden.parquet"))
    got = pa.Table.from_pandas(
        crawl_result.filings_facts.to_pandas().sort_values("ticker")
        .reset_index(drop=True), preserve_index=False)
    assert got["ticker"].to_pylist() == golden["ticker"].to_pylist()
    for c in ("n_docs", "total_value_cents", "total_words"):
        assert got[c].to_pylist() == golden[c].to_pylist(), c


def test_dedup_and_fetch_miss_accounting(crawl_result):
    m = crawl_result.metrics
    # backlinks + duplicate child links + cross-site re-links all dedup
    assert m["dedup_hits"] > 0
    # one dangling doc link per site: admitted but absent from pages
    errs = sum(wt.get("pages_err", 0)
               for w, wt in m["wave_timings"].items() if isinstance(w, int))
    assert errs == SITES


def test_checkpoint_resume_deep(corpus_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    seeds = web_seed_candidates(SITES)
    pages = os.path.join(corpus_dir, "pages.parquet")
    partial = crawl(pages, None, graph=web_graph(), seed_candidates=seeds,
                    num_shards=2, checkpoint_dir=ckpt, stop_after_wave=3)
    assert max(w for w in partial.metrics["wave_timings"]
               if isinstance(w, int)) == 3
    resumed = crawl(pages, None, graph=web_graph(), seed_candidates=seeds,
                    num_shards=2, checkpoint_dir=ckpt, resume=True)
    golden = pq.read_table(os.path.join(corpus_dir,
                                        "crawl_order_golden.parquet"))
    got = resumed.crawl_order.select(["seq", "wave", "url"]).sort_by("seq")
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    assert got["wave"].to_pylist() == golden["wave"].to_pylist()
    stats = pq.read_table(os.path.join(corpus_dir,
                                       "site_stats_golden.parquet"))
    got_f = resumed.filings_facts.to_pandas().sort_values(
        "ticker").reset_index(drop=True)
    assert got_f["total_value_cents"].tolist() == \
        stats["total_value_cents"].to_pylist()
    assert got_f["n_docs"].tolist() == stats["n_docs"].to_pylist()


def test_join_regime_matches_broadcast(crawl_result, corpus_dir):
    """join_threshold=0 forces the hash-join fetch on every wave; the facts
    and order must not change."""
    seeds = web_seed_candidates(SITES)
    res = crawl(os.path.join(corpus_dir, "pages.parquet"), None,
                graph=web_graph(), seed_candidates=seeds, num_shards=2,
                join_threshold=0)
    base = crawl_result.crawl_order.select(["seq", "url"]).sort_by("seq")
    got = res.crawl_order.select(["seq", "url"]).sort_by("seq")
    assert got["url"].to_pylist() == base["url"].to_pylist()
    a = res.filings_facts.to_pandas().sort_values("ticker")
    b = crawl_result.filings_facts.to_pandas().sort_values("ticker")
    assert a["total_value_cents"].tolist() == b["total_value_cents"].tolist()


def test_wave_partitioned_source_matches_golden(corpus_dir, tmp_path,
                                                ray_session):
    """The prune-at-the-read layout (pages partitioned by fetch wave) must
    yield the exact golden crawl: page_fetch_wave's uniqueness argument is
    what this checks end-to-end (a mis-partitioned page would fetch-miss
    and drop facts or order rows)."""
    import ray.data as rd

    from edgar_ray.sources.synth_graph import write_graph_corpus

    d = str(tmp_path / "part")
    paths = write_graph_corpus(d, SITES, BRANCHING, DEPTH,
                               partition_by_wave=True)
    base = paths["pages_by_wave"]

    def factory(wave=None):
        dd = os.path.join(base, f"wave={0 if wave is None else int(wave)}")
        if not os.path.isdir(dd):
            dd = os.path.join(base, "wave=0")
        return rd.read_parquet(dd, columns=["url", "html"])

    res = crawl(None, None, graph=web_graph(),
                seed_candidates=web_seed_candidates(SITES),
                pages_ds_factory=factory, num_shards=2)
    golden = pq.read_table(os.path.join(corpus_dir,
                                        "crawl_order_golden.parquet"))
    got = res.crawl_order.select(["seq", "wave", "url"]).sort_by("seq")
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    assert got["wave"].to_pylist() == golden["wave"].to_pylist()
    stats = pq.read_table(os.path.join(corpus_dir,
                                       "site_stats_golden.parquet"))
    f = res.filings_facts.to_pandas().sort_values("ticker") \
        .reset_index(drop=True)
    assert f["total_value_cents"].tolist() == \
        stats["total_value_cents"].to_pylist()
    assert f["n_docs"].tolist() == stats["n_docs"].to_pylist()


def test_deep_crawl_live_transport(corpus_dir, ray_session):
    """The depth-8 frontier loop over the injectable live-HTTP transport:
    fetcher-side retries/politeness with the GENERAL graph (the loopback
    e2e covers the EDGAR graph; this pins the live path's generality).
    Hosts publish no robots.txt — the transport 404 (KeyError) must
    disable rules per host, not fail the crawl."""
    from edgar_ray.stages.fetch_http import DictTransport, FakeClock

    full = pq.read_table(os.path.join(corpus_dir, "pages.parquet"))
    pages = {u: (h if isinstance(h, bytes) else h.encode())
             for u, h in zip(full["url"].to_pylist(),
                             full["html"].to_pylist())}
    clock = FakeClock()
    res = crawl(None, None, graph=web_graph(),
                seed_candidates=web_seed_candidates(SITES), num_shards=2,
                live_transport=DictTransport(pages, clock=clock),
                live_clock=clock)
    golden = pq.read_table(os.path.join(corpus_dir,
                                        "crawl_order_golden.parquet"))
    got = res.crawl_order.select(["seq", "url"]).sort_by("seq")
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    stats = pq.read_table(os.path.join(corpus_dir,
                                       "site_stats_golden.parquet"))
    f = res.filings_facts.to_pandas().sort_values("ticker") \
        .reset_index(drop=True)
    assert f["total_value_cents"].tolist() == \
        stats["total_value_cents"].to_pylist()


def test_deep_crawl_over_warc_segments(corpus_dir, tmp_path, ray_session):
    """End-to-end composition of the round-5 pieces: deep pages ->
    distributed WARC segmenter -> read_warc source -> depth-8 frontier
    crawl == the spec goldens (CC-native ingest of a general web graph)."""
    import ray.data as rd

    from edgar_ray.sources.warc import read_warc, write_warc_segments

    pages_tbl = pq.read_table(os.path.join(corpus_dir, "pages.parquet"))
    out = os.path.join(tmp_path, "segs")
    write_warc_segments(rd.from_arrow(pages_tbl).repartition(4), out,
                        num_segments=4)
    files = sorted(os.path.join(out, f) for f in os.listdir(out))
    warc_ds = read_warc(files).map_batches(
        lambda t: t.select(["url", "html"]),
        batch_format="pyarrow").materialize()
    res = crawl(None, None, graph=web_graph(),
                seed_candidates=web_seed_candidates(SITES),
                pages_ds_factory=lambda: warc_ds, num_shards=2)
    golden = pq.read_table(os.path.join(corpus_dir,
                                        "crawl_order_golden.parquet"))
    got = res.crawl_order.select(["seq", "url"]).sort_by("seq")
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    stats = pq.read_table(os.path.join(corpus_dir,
                                       "site_stats_golden.parquet"))
    f = res.filings_facts.to_pandas().sort_values("ticker") \
        .reset_index(drop=True)
    assert f["n_docs"].tolist() == stats["n_docs"].to_pylist()
    assert f["total_value_cents"].tolist() == \
        stats["total_value_cents"].to_pylist()


def test_deep_crawl_politeness_spacing(crawl_result):
    """Host-global politeness holds through the general loop: per host,
    consecutive scheduled_at slots are spaced >= 1/host_budget across ALL
    waves (the budget is the crawl() default here)."""
    df = crawl_result.crawl_order.select(
        ["host", "scheduled_at"]).to_pandas()
    step = 1.0 / 1000.0  # crawl() default host_budget
    for host, g in df.groupby("host"):
        s = g["scheduled_at"].sort_values().to_numpy()
        assert (s[1:] - s[:-1] >= step - 1e-9).all(), host


def test_dead_end_pages_metric(crawl_result):
    """/about.html is fetched then dead-ends (no parser, not terminal):
    exactly one per site, counted in crawl metrics."""
    assert crawl_result.metrics["dead_end_pages"] == SITES
