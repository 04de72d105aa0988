"""Stateless ``map_batches`` stages: URL classing, page parsing, fact extraction.

Arrow in / Arrow out (``batch_format="pyarrow"``). Each stage carries the
frontier metadata of its input rows through to its outputs so the downstream
merge never needs a side lookup. The HTML walk itself is per-page Python (the
page is the vectorization unit — one token stream per document, exactly the
reference's unit of work, /root/reference/parser.go); everything row-shaped
around it stays in Arrow.
"""

from __future__ import annotations

import re
import zlib
from urllib.parse import urlsplit

import pyarrow as pa

from ..functions.parse import (
    extracted_text,
    filing_page_parser,
    fin_report_raw,
    query_page_parser,
)

BASE_URL = "https://www.sec.gov"

# page classes (derivable from URL shape alone)
CLASS_QUERY = "query"
CLASS_INDEX = "index"
CLASS_REPORT = "report"
CLASS_OTHER = "other"

_RE_CIK = re.compile(r"[?&]CIK=([^&]+)", re.I)
_RE_TYPE = re.compile(r"[?&]type=([^&]+)")
_RE_ACC = re.compile(r"[?&]accession_number=([^&]+)")
_RE_VIEW_CIK = re.compile(r"[?&]cik=(\d+)")
_RE_REPORT = re.compile(r"/Archives/edgar/data/(\d+)/(\d+)/R(\d+)\.htm")


def classify_url(url: str) -> str:
    """URL -> page class (mirrors the reference's three fetch sites:
    /root/reference/page.go:13,55,58)."""
    if "browse-edgar" in url and "action=getcompany" in url:
        return CLASS_QUERY
    if "cgi-bin/viewer" in url and "accession_number=" in url:
        return CLASS_INDEX
    if _RE_REPORT.search(url):
        return CLASS_REPORT
    return CLASS_OTHER


def url_host(url: str) -> str:
    return urlsplit(url).netloc or ""


def absolutize(href: str, page_url: str | None = None) -> str:
    """Resolve a relative href against the SOURCE PAGE's scheme+host (real
    crawler semantics: a relative link on a mirror host stays on that host);
    hrefs on the canonical single-host corpus resolve identically to the
    reference's constant-prefix concat (/root/reference/page.go:13)."""
    if href.startswith("http"):
        return href
    if page_url:
        sp = urlsplit(page_url)
        if sp.scheme and sp.netloc:
            return f"{sp.scheme}://{sp.netloc}{href}"
    return BASE_URL + href


FRONTIER_COLS = [
    "url", "host", "depth", "ticker", "cik", "filing_type", "filed_date",
    "accession", "doc_type", "report_num", "seed_rank",
    "url_sha1", "url_canon_hash",
]


def _frontier_table(rows: dict[str, list]) -> pa.Table:
    """Build a frontier-candidate table. The seen-set keys — ``url_sha1``
    (raw-url sha1, the crawl-order identity) and ``url_canon_hash`` (uint64
    prefix of sha1(canonicalize(url)), the cuckoo/shard-routing key) — are
    computed HERE, inside the distributed parse stages, so the frontier
    admission path never hashes serially on the driver."""
    import hashlib

    import numpy as np

    from ..state.canonical import canonicalize

    n = len(rows["url"])
    if not n:
        return pa.table({c: pa.array([], t) for c, t in [
            ("url", pa.string()), ("host", pa.string()), ("depth", pa.int32()),
            ("ticker", pa.string()), ("cik", pa.string()), ("filing_type", pa.string()),
            ("filed_date", pa.string()), ("accession", pa.string()),
            ("doc_type", pa.string()), ("report_num", pa.int32()),
            ("seed_rank", pa.int32()), ("url_sha1", pa.binary()),
            ("url_canon_hash", pa.uint64()),
        ]})
    sha = []
    canon_hash = np.empty(n, dtype=np.uint64)
    for i, u in enumerate(rows["url"]):
        sha.append(hashlib.sha1(u.encode()).digest())
        cu = canonicalize(u)
        canon_hash[i] = int.from_bytes(hashlib.sha1(cu.encode()).digest()[:8], "big")
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "host": pa.array([url_host(u) for u in rows["url"]], pa.string()),
            "depth": pa.array(rows["depth"], pa.int32()),
            "ticker": pa.array(rows["ticker"], pa.string()),
            "cik": pa.array(rows["cik"], pa.string()),
            "filing_type": pa.array(rows["filing_type"], pa.string()),
            "filed_date": pa.array(rows["filed_date"], pa.string()),
            "accession": pa.array(rows["accession"], pa.string()),
            "doc_type": pa.array(rows["doc_type"], pa.string()),
            "report_num": pa.array(rows["report_num"], pa.int32()),
            "seed_rank": pa.array(rows["seed_rank"], pa.int32()),
            "url_sha1": pa.array(sha, pa.binary()),
            "url_canon_hash": pa.array(canon_hash, pa.uint64()),
        }
    )


def seed_frontier(seed_tickers: pa.Table, filing_types: tuple[str, ...] = ("10-K", "10-Q")
                  ) -> pa.Table:
    """Seed (wave-0) frontier: one query URL per (ticker, filing type)
    (/root/reference/page.go:13,42-52)."""
    rows = {c: [] for c in ("url", "depth", "ticker", "cik", "filing_type",
                            "filed_date", "accession", "doc_type", "report_num",
                            "seed_rank")}
    tickers = seed_tickers["ticker"].to_pylist()
    ciks = seed_tickers["cik"].to_pylist()
    ranks = seed_tickers["seed_rank"].to_pylist()
    for ticker, cik, rank in zip(tickers, ciks, ranks):
        for ft in filing_types:
            url = (f"{BASE_URL}/cgi-bin/browse-edgar?action=getcompany&CIK={ticker}"
                   f"&type={ft}&dateb=&owner=include&count=10&action=getcompany")
            rows["url"].append(url)
            rows["depth"].append(0)
            rows["ticker"].append(ticker)
            rows["cik"].append(cik)
            rows["filing_type"].append(ft)
            rows["filed_date"].append("")
            rows["accession"].append("")
            rows["doc_type"].append("")
            rows["report_num"].append(0)
            rows["seed_rank"].append(rank)
    return _frontier_table(rows)


def parse_query_pages(batch: pa.Table) -> pa.Table:
    """Query pages -> wave-1 frontier rows (viewer/index URLs).

    One input row per fetched query page (url, html + frontier metadata);
    output: one row per kept filing (AMEND + pre-threshold already dropped by
    the parser, /root/reference/parser.go:34-53).
    """
    rows = {c: [] for c in ("url", "depth", "ticker", "cik", "filing_type",
                            "filed_date", "accession", "doc_type", "report_num",
                            "seed_rank")}
    cols = batch.to_pydict()
    for i in range(batch.num_rows):
        html = cols["html"][i]
        ft = cols["filing_type"][i]
        links = query_page_parser(html, ft)
        for date, href in links.items():
            m = _RE_ACC.search(href)
            rows["url"].append(absolutize(href.replace("&amp;", "&"),
                                          cols["url"][i]))
            rows["depth"].append(1)
            rows["ticker"].append(cols["ticker"][i])
            # carry the seed-table CIK (zero-padded, the J1 broadcast lookup
            # /root/reference/page.go:30-39), not the URL's integer form
            rows["cik"].append(cols["cik"][i])
            rows["filing_type"].append(ft)
            rows["filed_date"].append(date)
            rows["accession"].append(m.group(1) if m else "")
            rows["doc_type"].append("")
            rows["report_num"].append(0)
            rows["seed_rank"].append(cols["seed_rank"][i])
    return _frontier_table(rows)


def parse_index_pages(batch: pa.Table) -> pa.Table:
    """Filing index pages -> wave-2 frontier rows (one per classified R-doc,
    /root/reference/parser.go:86-127 + reportmap.go:114-169)."""
    rows = {c: [] for c in ("url", "depth", "ticker", "cik", "filing_type",
                            "filed_date", "accession", "doc_type", "report_num",
                            "seed_rank")}
    cols = batch.to_pydict()
    for i in range(batch.num_rows):
        docs = filing_page_parser(cols["html"][i], cols["filing_type"][i])
        for doc_type, href in docs.items():
            m = _RE_REPORT.search(href)
            rows["url"].append(absolutize(href, cols["url"][i]))
            rows["depth"].append(2)
            rows["ticker"].append(cols["ticker"][i])
            rows["cik"].append(cols["cik"][i])
            rows["filing_type"].append(cols["filing_type"][i])
            rows["filed_date"].append(cols["filed_date"][i])
            rows["accession"].append(cols["accession"][i])
            rows["doc_type"].append(doc_type)
            rows["report_num"].append(int(m.group(3)) if m else 0)
            rows["seed_rank"].append(cols["seed_rank"][i])
    return _frontier_table(rows)


def _facts_raw_fields() -> list[tuple[str, pa.DataType]]:
    from ..schema import FACT_FIELDS, fact_col

    return (
        [
            ("ticker", pa.string()), ("cik", pa.string()), ("accession", pa.string()),
            ("filing_type", pa.string()), ("filed_date", pa.string()),
            ("doc_type", pa.string()), ("report_num", pa.int32()),
        ]
        + [(fact_col(f), pa.float64()) for f in FACT_FIELDS]
        + [(f"collected_{s}", pa.uint64()) for s in ("entity", "ops", "bs", "cf")]
        # stable per-page tie-break component for the merge order key: if a
        # duplicate page of one accession ever reaches the merge (replayed
        # fetch, double-written checkpoint), ties at (doc_priority,
        # report_num) resolve by this url hash instead of partial arrival
        # order (see stages/merge.py order-key layout)
        + [("page_crc", pa.int32())]
    )


FACTS_RAW_FIELDS = _facts_raw_fields()


def extract_facts(batch: pa.Table) -> pa.Table:
    """R-report pages -> facts_raw: ONE fully-parsed row per page.

    The entire per-document half of the reference's finReportParser runs
    HERE, in the embarrassingly-parallel map stage: tokenizer walk, heading
    -> scale inference (/root/reference/parser.go:307-316), XBRL tag lookup,
    number normalization, strict doc gating and within-doc first-write-wins
    (/root/reference/data_def.go:185-248) — all doc-local because
    ``doc_type`` is frontier metadata on the fetched row. The output is 27
    floats + 4 presence bitmasks per page, so the merge shuffle ships ~100
    bytes/doc instead of every raw table cell, and the cross-doc merge
    reduces to first-nonzero-by-doc-priority + OR of bitmasks (exactly
    equivalent to the shared-struct replay, see stages/merge.py)."""
    from ..functions.report import apply_doc_rows, new_financial_report
    from ..schema import FACT_FIELDS, fact_col

    out = {name: [] for name, _ in FACTS_RAW_FIELDS}
    cols = batch.to_pydict()
    for i in range(batch.num_rows):
        headings, rows = fin_report_raw(cols["html"][i])
        doc_type = cols["doc_type"][i]
        fr = new_financial_report(cols["filing_type"][i])
        apply_doc_rows(fr, doc_type, headings, rows)
        for key in ("ticker", "cik", "accession", "filing_type", "filed_date",
                    "doc_type", "report_num"):
            out[key].append(cols[key][i])
        for f in FACT_FIELDS:
            out[fact_col(f)].append(fr[f.struct][f.name])
        for s in ("entity", "ops", "bs", "cf"):
            out[f"collected_{s}"].append(fr[s]["CollectedData"])
        out["page_crc"].append(
            zlib.crc32(cols["url"][i].encode()) & 0x7FFFFF)
    return pa.table({name: pa.array(out[name], typ) for name, typ in FACTS_RAW_FIELDS})


class ExtractFactsActor:
    """Actor-pool variant of :func:`extract_facts` (north-star phrasing: "a
    stateful actor-pool stage extracting filing facts"): per-actor state —
    the XBRL tag map, compiled row/scale patterns, the report schema — is
    bound once in ``__init__`` and reused across batches. The stateless task
    form is the default here because this state is cheap to import; swap to
    ``map_batches(ExtractFactsActor, concurrency=(m, n))`` when the
    extraction state becomes heavy (a real tokenizer/model)."""

    def __init__(self):
        from ..functions.report import apply_doc_rows, new_financial_report
        from ..functions.xbrl import XBRL_TAGS
        from ..schema import FACT_FIELDS

        self._apply = apply_doc_rows
        self._new_report = new_financial_report
        self._tag_map = XBRL_TAGS  # bound per actor
        self._fields = FACT_FIELDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_facts(batch)


def recompute_text(batch: pa.Table) -> pa.Table:
    """Per-row invariant stage, oracle-comparable form: recompute the
    canonical extracted text from html (input_hint byte-identity — the
    driver hashes this against the stored golden ``text`` column)."""
    cols = batch.to_pydict()
    return pa.table({
        "url": pa.array(cols["url"], pa.string()),
        "text": pa.array([extracted_text(u, h)
                          for u, h in zip(cols["url"], cols["html"])],
                         pa.string()),
    })


def verify_text(batch: pa.Table) -> pa.Table:
    """Per-row invariant stage: recompute the canonical extracted text from
    html and compare against the stored ``text`` column (the input_hint
    byte-identity check). Emits one row per page with a match flag."""
    cols = batch.to_pydict()
    matches = [extracted_text(u, h) == t
               for u, h, t in zip(cols["url"], cols["html"], cols["text"])]
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "text_match": pa.array(matches, pa.bool_()),
        }
    )
