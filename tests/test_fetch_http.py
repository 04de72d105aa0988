"""Live-HTTP fetch stage: retries with backoff, error rows survive as data,
politeness enforced AT the fetcher, and the full crawl runs over an
injected transport with results equal to the parquet-join path."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from edgar_ray.pipelines.crawl import crawl
from edgar_ray.sources.synth import write_corpus
from edgar_ray.stages.fetch_http import (
    DictTransport as FlakyTransport,
    FakeClock,
    HttpFetcher,
    fetch_live,
)




def test_fetcher_retries_and_error_rows(ray_session):
    pages = {f"https://h/x{i}": f"body{i}".encode() for i in range(6)}
    clock = FakeClock()
    transport = FlakyTransport(
        pages, fail_n={"https://h/x1": 2, "https://h/x2": 99}, clock=clock)
    t = pa.table({
        "url": pa.array(sorted(pages)),
        "scheduled_at": pa.array([0.0] * 6, pa.float64()),
    })
    f = HttpFetcher(transport=transport, clock=clock, max_retries=3,
                    backoff_s=0.1)
    out = f(t)
    by_url = {u: (s, a) for u, s, a in zip(out["url"].to_pylist(),
                                           out["fetch_status"].to_pylist(),
                                           out["fetch_attempts"].to_pylist())}
    assert by_url["https://h/x0"] == ("ok", 1)
    assert by_url["https://h/x1"] == ("ok", 3)       # 2 transient failures
    assert by_url["https://h/x2"][0] == "error"      # permanent failure
    assert by_url["https://h/x2"][1] == 4            # 1 + max_retries
    ok_html = dict(zip(out["url"].to_pylist(), out["html"].to_pylist()))
    assert ok_html["https://h/x1"] == b"body1"
    assert ok_html["https://h/x2"] == b""


def test_fetcher_enforces_politeness(ray_session):
    clock = FakeClock()
    pages = {f"https://h/p{i}": b"x" for i in range(20)}
    transport = FlakyTransport(pages, clock=clock)
    urls = sorted(pages)
    sched = [i * 0.5 for i in range(20)]  # 2 rps budget slots
    t = pa.table({"url": pa.array(urls),
                  "scheduled_at": pa.array(sched, pa.float64())})
    HttpFetcher(transport=transport, clock=clock)(t)
    at = dict(clock.fetch_log)
    for u, s in zip(urls, sched):
        assert at[u] >= s - 1e-9  # never fetched before its slot


def test_transport_required():
    with pytest.raises(NotImplementedError):
        HttpFetcher()  # no network in this environment: must inject


@pytest.fixture(scope="module")
def live_corpus(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("live_corpus"))
    return write_corpus(out, 3, 2)


def test_crawl_over_live_transport(live_corpus, ray_session):
    """Full 3-wave crawl over the injected transport equals the parquet-join
    path: same crawl order vs golden, same facts."""
    full = pq.read_table(live_corpus["pages"])
    pages = {u: (h if isinstance(h, bytes) else h.encode())
             for u, h in zip(full["url"].to_pylist(),
                             full["html"].to_pylist())}
    clock = FakeClock()
    transport = FlakyTransport(pages, clock=clock)
    seeds = pq.read_table(live_corpus["seed_tickers"])
    res = crawl(None, seeds, num_shards=2, host_budget=1000.0,
                live_transport=transport, live_clock=clock)
    golden = pq.read_table(live_corpus["crawl_order_golden"])
    got = res.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    facts = res.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    gold = pq.read_table(live_corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c


def test_shared_clock_anchor():
    """SystemClocks built at different times from ONE t0_epoch agree — the
    pool-shared anchor that keeps host-global slots comparable across
    actors (per-actor construction anchors would skew origins)."""
    import time

    from edgar_ray.stages.fetch_http import SystemClock

    t0 = time.time()
    a = SystemClock(t0_epoch=t0)
    time.sleep(0.05)
    b = SystemClock(t0_epoch=t0)  # later construction, same anchor
    assert abs(a.now() - b.now()) < 0.01
    assert b.now() >= 0.05 - 0.01


def test_host_min_gap_floor(ray_session):
    """host_min_gap re-spaces same-host fetches inside an actor even when
    every row's slot is already in the past (retry-stall scenario)."""
    clock = FakeClock()
    pages = {f"https://h/g{i}": b"x" for i in range(5)}
    transport = FlakyTransport(pages, clock=clock)
    urls = sorted(pages)
    t = pa.table({"url": pa.array(urls),
                  "scheduled_at": pa.array([0.0] * 5, pa.float64())})
    HttpFetcher(transport=transport, clock=clock, host_min_gap=0.5)(t)
    times = [ts for _, ts in clock.fetch_log]
    gaps = np.diff(np.asarray(times))
    assert (gaps >= 0.5 - 1e-9).all()


def test_robots_transient_fetch_retries(live_corpus, ray_session):
    """A transiently-failing robots.txt fetch retries instead of silently
    disabling robots for the host; rules still apply after recovery."""
    full = pq.read_table(live_corpus["pages"])
    pages = {u: (h if isinstance(h, bytes) else h.encode())
             for u, h in zip(full["url"].to_pylist(),
                             full["html"].to_pylist())}
    robots_urls = [u for u in pages if u.endswith("/robots.txt")]
    assert robots_urls
    clock = FakeClock()
    transport = FlakyTransport(pages, fail_n={robots_urls[0]: 2}, clock=clock)
    seeds = pq.read_table(live_corpus["seed_tickers"])
    res = crawl(None, seeds, num_shards=2, host_budget=1000.0,
                live_transport=transport, live_clock=clock)
    blocked = sum(r["robots_blocked"] or 0 for r in res.lineage.to_pylist())
    assert blocked > 0  # rules recovered via retry and were enforced


def test_robots_persistent_failure_surfaces(live_corpus, ray_session):
    """A persistently-failing robots fetch RAISES — never crawl a host
    whose robots rules could not be read."""
    full = pq.read_table(live_corpus["pages"])
    pages = {u: (h if isinstance(h, bytes) else h.encode())
             for u, h in zip(full["url"].to_pylist(),
                             full["html"].to_pylist())}
    robots_urls = [u for u in pages if u.endswith("/robots.txt")]
    clock = FakeClock()
    transport = FlakyTransport(pages, fail_n={robots_urls[0]: 99},
                               clock=clock)
    seeds = pq.read_table(live_corpus["seed_tickers"])
    with pytest.raises(RuntimeError, match="robots.txt"):
        crawl(None, seeds, num_shards=2, host_budget=1000.0,
              live_transport=transport, live_clock=clock)


# -- round 4: production default transport + strict per-host serialization --


@pytest.fixture(scope="module")
def live_http_server(live_corpus):
    """stdlib http.server serving the corpus pages over loopback — the
    closest thing to a live host this sandbox allows."""
    import http.server
    import threading

    full = pq.read_table(live_corpus["pages"])
    by_path = {}
    for u, h in zip(full["url"].to_pylist(), full["html"].to_pylist()):
        path = "/" + u.split("/", 3)[3]  # path + query after the host
        by_path[path] = h if isinstance(h, bytes) else h.encode()
    fail_once = set()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path in fail_once:
                fail_once.discard(self.path)
                self.send_response(503)
                self.end_headers()
                return
            body = by_path.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield {"port": srv.server_port, "paths": by_path, "fail_once": fail_once}
    srv.shutdown()


def test_urllib_transport_semantics(live_http_server):
    from edgar_ray.stages.fetch_http import UrllibTransport

    port = live_http_server["port"]
    tr = UrllibTransport(
        rewrite=("https://www.sec.gov", f"http://127.0.0.1:{port}"))
    path = sorted(live_http_server["paths"])[0]
    assert tr("https://www.sec.gov" + path) == live_http_server["paths"][path]
    with pytest.raises(KeyError):  # 404 -> permanent (no-robots contract)
        tr("https://www.sec.gov/definitely-absent-page.html")
    # transient 503 raises a retryable (non-KeyError) error
    live_http_server["fail_once"].add(path)
    with pytest.raises(Exception) as ei:
        tr("https://www.sec.gov" + path)
    assert not isinstance(ei.value, KeyError)
    assert tr("https://www.sec.gov" + path) == live_http_server["paths"][path]


def test_default_transport_flag(monkeypatch):
    from edgar_ray.stages.fetch_http import HttpFetcher, UrllibTransport

    monkeypatch.delenv("EDGAR_RAY_LIVE_HTTP", raising=False)
    with pytest.raises(NotImplementedError):
        HttpFetcher()
    monkeypatch.setenv("EDGAR_RAY_LIVE_HTTP", "1")
    f = HttpFetcher()  # reference parity: works without injection
    assert isinstance(f.transport, UrllibTransport)


def test_crawl_over_real_http_server(live_corpus, live_http_server,
                                     ray_session):
    """End-to-end: the 3-wave crawl drives the REAL urllib transport through
    a live (loopback) HTTP server — retries on a 503, robots.txt 404 treated
    as no-rules — and the facts equal the independent golden evaluator's."""
    from edgar_ray.stages.fetch_http import UrllibTransport

    port = live_http_server["port"]
    # one transient 503 on a real filing page exercises the retry path
    live_http_server["fail_once"].add(sorted(live_http_server["paths"])[-1])
    tr = UrllibTransport(
        rewrite=("https://www.sec.gov", f"http://127.0.0.1:{port}"),
        timeout=10.0)
    seeds = pq.read_table(live_corpus["seed_tickers"])
    res = crawl(None, seeds, num_shards=2, host_budget=1000.0,
                live_transport=tr)
    facts = res.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    gold = pq.read_table(live_corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c


def test_strict_per_host_group_serializes(ray_session):
    """strict mode's group handler re-sorts a scrambled host group by the
    frontier's scheduled_at slots and fetches serially in slot order."""
    from edgar_ray.stages.fetch_http import (HttpFetcher,
                                             strict_host_fetch_group)

    clock = FakeClock()
    pages = {f"https://h/p{i}": b"x" for i in range(12)}
    transport = FlakyTransport(pages, clock=clock)
    urls = sorted(pages)
    sched = [i * 0.25 for i in range(12)]
    rng = np.random.default_rng(3)
    perm = rng.permutation(12)
    t = pa.table({
        "url": pa.array([urls[i] for i in perm]),
        "scheduled_at": pa.array([sched[i] for i in perm], pa.float64()),
        "host": pa.array(["h"] * 12),
    })
    f = HttpFetcher(transport=transport, clock=clock)
    strict_host_fetch_group(t, f)
    fetched_urls = [u for u, _ in clock.fetch_log]
    assert fetched_urls == urls  # slot order restored
    times = [at for _, at in clock.fetch_log]
    assert times == sorted(times)
    at = dict(clock.fetch_log)
    for u, s in zip(urls, sched):
        assert at[u] >= s - 1e-9


def test_crawl_strict_per_host_equals_golden(live_corpus, ray_session):
    full = pq.read_table(live_corpus["pages"])
    pages = {u: (h if isinstance(h, bytes) else h.encode())
             for u, h in zip(full["url"].to_pylist(),
                             full["html"].to_pylist())}
    clock = FakeClock()
    transport = FlakyTransport(pages, clock=clock)
    seeds = pq.read_table(live_corpus["seed_tickers"])
    res = crawl(None, seeds, num_shards=2, host_budget=1000.0,
                live_transport=transport, live_clock=clock,
                live_strict_per_host=True)
    facts = res.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    gold = pq.read_table(live_corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c
