"""Generic web link-graph crawl: the depth-N demonstration of the
frontier-driven wave loop (pipelines/crawl.py + stages/graph.py).

Where the EDGAR graph is the reference's fixed 3-level walk
(/root/reference/page.go:42-73), this graph is an unbounded-depth web:
``hub`` pages link to deeper hubs, to ``doc`` leaf pages (the terminal
class, carrying extractable facts), to dead-end ``other`` pages, and back
to already-crawled pages (cuckoo dedup hits). Every wave past the first is
MIXED (hubs + leaves + dead ends together), so the loop's single-fetch
outbox dispatch is exercised wave after wave until the frontier empties.

Priority mapping into the fixed frontier comparator ``(seed_rank,
filing_type, filed_date desc, report_num, url)``: seed_rank = the seeding
site's rank (inherited down the link chain, including cross-site links),
filing_type/filed_date = "" constants, and report_num encodes the link
target deterministically from the URL alone:

  hub  /hub/{d}/{i}.html     -> d * 100_000 + i
  doc  /doc/{j}.html (local) -> 1_000_000 + j
  doc  (cross-site)          -> 2_000_000 + j
  other /about.html          -> 3_000_000

The corpus generator (sources/synth_graph.py) guarantees these are unique
per (seed_rank, wave) after in-wave dedup, so the spec-level golden
evaluator can reproduce the exact crawl order without hashing.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

from ..stages.extract import _frontier_table, absolutize
from ..stages.graph import CrawlGraph

CLASS_HUB = "hub"
CLASS_LEAF = "leaf"
CLASS_OTHER = "other"

_RE_HREF = re.compile(r'href="([^"]+)"')
_RE_HUB = re.compile(r"/hub/(\d+)/(\d+)\.html$")
_RE_DOC = re.compile(r"/doc/(\d+)\.html$")
_RE_VALUE = re.compile(r'<meta name="value-cents" content="(\d+)"')
_RE_PARA = re.compile(r"<p>(.*?)</p>", re.S)
_RE_SITE = re.compile(r"site(\d+)\.test")


def classify_web_url(url: str) -> str:
    if _RE_HUB.search(url):
        return CLASS_HUB
    if _RE_DOC.search(url):
        return CLASS_LEAF
    return CLASS_OTHER


def site_of(url: str) -> str:
    m = _RE_SITE.search(url)
    return f"S{int(m.group(1)):02d}" if m else ""


def _target_rep(url: str, page_host: str) -> int:
    m = _RE_HUB.search(url)
    if m:
        return int(m.group(1)) * 100_000 + int(m.group(2))
    m = _RE_DOC.search(url)
    if m:
        j = int(m.group(1))
        local = urlsplit(url).netloc == page_host
        return (1_000_000 if local else 2_000_000) + j
    return 3_000_000


def parse_web_pages(batch: pa.Table) -> pa.Table:
    """Hub pages -> next-wave frontier candidates: every href, absolutized
    against the SOURCE page (cross-site links keep their host), with the
    deterministic report_num priority slot derived from the target URL and
    seed_rank inherited from the source page's frontier metadata."""
    rows = {c: [] for c in ("url", "depth", "ticker", "cik", "filing_type",
                            "filed_date", "accession", "doc_type", "report_num",
                            "seed_rank")}
    cols = batch.to_pydict()
    for i in range(batch.num_rows):
        html = cols["html"][i]
        if isinstance(html, bytes):
            html = html.decode()
        page_url = cols["url"][i]
        page_host = urlsplit(page_url).netloc
        for href in _RE_HREF.findall(html):
            url = absolutize(href, page_url)
            cls = classify_web_url(url)
            m = _RE_HUB.search(url)
            rows["url"].append(url)
            rows["depth"].append(int(m.group(1)) if m else 0)
            rows["ticker"].append(site_of(url))
            rows["cik"].append("")
            rows["filing_type"].append("")
            rows["filed_date"].append("")
            rows["accession"].append("")
            rows["doc_type"].append(cls)
            rows["report_num"].append(_target_rep(url, page_host))
            rows["seed_rank"].append(cols["seed_rank"][i])
    return _frontier_table(rows)


_DOC_FIELDS = [("ticker", pa.string()), ("doc_id", pa.int64()),
               ("value_cents", pa.int64()), ("n_words", pa.int64())]


def extract_web_docs(batch: pa.Table) -> pa.Table:
    """Leaf pages -> one fact row per doc: the embedded value (integer
    cents — exact under any summation order) and the body word count.
    ``ticker`` is the doc's OWN site (from its URL), so cross-site-linked
    docs aggregate to the right site regardless of who discovered them."""
    out = {name: [] for name, _ in _DOC_FIELDS}
    cols = batch.to_pydict()
    for i in range(batch.num_rows):
        html = cols["html"][i]
        if isinstance(html, bytes):
            html = html.decode()
        url = cols["url"][i]
        m = _RE_DOC.search(url)
        mv = _RE_VALUE.search(html)
        mp = _RE_PARA.search(html)
        out["ticker"].append(site_of(url))
        out["doc_id"].append(int(m.group(1)) if m else -1)
        out["value_cents"].append(int(mv.group(1)) if mv else 0)
        out["n_words"].append(len(mp.group(1).split()) if mp else 0)
    return pa.table({n: pa.array(out[n], t) for n, t in _DOC_FIELDS})


def _isum(col, inv: np.ndarray, g: int) -> pa.Array:
    """Exact int64 segment sum (bincount's float64 weights would round
    above 2^53; these are money counters)."""
    acc = np.zeros(g, np.int64)
    np.add.at(acc, inv,
              col.to_numpy(zero_copy_only=False).astype(np.int64))
    return pa.array(acc, pa.int64())


_PARTIAL_FIELDS = [("ticker", pa.string()), ("n_docs", pa.int64()),
                   ("total_value_cents", pa.int64()),
                   ("total_words", pa.int64()),
                   ("pages_in_partial", pa.int64())]


def web_partial(num_buckets: int):
    """Map-side combiner: one partial row per (batch, site) — integer sums
    are associative and exact, so the post-loop reduce just re-sums."""

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({n: pa.array([], typ)
                             for n, typ in _PARTIAL_FIELDS})
        site = np.asarray(t["ticker"].to_pylist(), dtype=object)
        uniq, inv = np.unique(site, return_inverse=True)
        g = len(uniq)
        counts = np.bincount(inv, minlength=g)
        return pa.table({
            "ticker": pa.array(list(uniq), pa.string()),
            "n_docs": pa.array(counts.astype(np.int64), pa.int64()),
            "total_value_cents": _isum(t["value_cents"], inv, g),
            "total_words": _isum(t["n_words"], inv, g),
            "pages_in_partial": pa.array(counts.astype(np.int64), pa.int64()),
        })

    return combine


def _reduce_group(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({n: pa.array([], typ)
                         for n, typ in _PARTIAL_FIELDS[:4]})
    site = np.asarray(t["ticker"].to_pylist(), dtype=object)
    uniq, inv = np.unique(site, return_inverse=True)
    g = len(uniq)
    return pa.table({"ticker": pa.array(list(uniq), pa.string()),
                     "n_docs": _isum(t["n_docs"], inv, g),
                     "total_value_cents": _isum(t["total_value_cents"], inv, g),
                     "total_words": _isum(t["total_words"], inv, g)})


def web_reduce(num_buckets: int):
    """Final reduce: groupby(site) re-sum of the partials. Sites are the
    natural partition key; partial fusion already shrank the shuffle to
    ~1 row per (batch, site)."""

    def reduce(ds):
        if "pages_in_partial" in ds.schema().names:
            ds = ds.drop_columns(["pages_in_partial"])
        return ds.groupby("ticker").map_groups(_reduce_group,
                                               batch_format="pyarrow")

    return reduce


def web_graph() -> CrawlGraph:
    return CrawlGraph(
        classify=classify_web_url,
        parsers={CLASS_HUB: parse_web_pages},
        terminal=frozenset({CLASS_LEAF}),
        extractor=extract_web_docs,
        partial_factory=web_partial,
        reduce_factory=web_reduce,
        partition_col="ticker",
    )
