"""Deterministic synthetic DEEP link-graph corpus (the depth-N web the
EDGAR corpus cannot model) + its spec-level goldens.

Structure (all derived from ``(sites, branching, depth, seed)``):

- ``sites`` hosts ``www.site{s:02d}.test``; seed page = ``/hub/0/0.html``.
- hub ``(s, d, i)`` (for ``d < depth``, ``i < branching**d``) links to:
    1. its ``branching`` child hubs at depth ``d+1`` (while ``d+1 < depth``),
       with the FIRST child linked twice (an in-page duplicate the in-wave
       dedup must collapse);
    2. its ``leaves_per_hub`` local doc pages ``/doc/{ord*L + k}.html``
       (``ord`` = the hub's site-wide ordinal, so leaf ids never collide);
    3. ONE cross-site doc on the next site, ``/doc/{i}.html`` (discovered
       under the LINKING site's seed_rank — the cross-host admission case);
    4. the site's own seed hub (a backlink: a guaranteed cuckoo dedup hit
       after wave 0);
    5. ``/about.html`` (class ``other`` — fetched, then dead-ends: no
       parser, not terminal);
    6. hub ``(s, depth-1, 0)`` only: one DANGLING doc link
       ``/doc/{999000+s}.html`` with no page behind it (a fetch miss:
       admitted into the crawl order, absent from the facts).
- doc ``(s, j)``: html with ``<meta name="value-cents" content="N">`` and a
  body of exactly ``n_words`` tokens; both derive from sha1(seed, s, j).

Goldens are computed by an INDEPENDENT evaluator over this abstract spec —
never by the parsers under test: the crawl-order golden simulates the BFS
wave-by-wave with the frontier's comparator ``(seed_rank, report_num)``
(the generator ASSERTS the (rank, rep) pairs are unique per wave after
in-wave dedup, so the hash tie-break can never fire and the golden needs
no hashing), and the site-stats golden sums each crawled doc's spec values
per site.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

L_PER_HUB = 2


def host_of(s: int) -> str:
    return f"www.site{s:02d}.test"


def site_label(s: int) -> str:
    return f"S{s:02d}"


def hub_url(s: int, d: int, i: int) -> str:
    return f"https://{host_of(s)}/hub/{d}/{i}.html"


def doc_url(s: int, j: int) -> str:
    return f"https://{host_of(s)}/doc/{j}.html"


def about_url(s: int) -> str:
    return f"https://{host_of(s)}/about.html"


def hub_ordinal(d: int, i: int, branching: int) -> int:
    """Site-wide hub ordinal: hubs at depths < d, then i."""
    if branching == 1:
        return d + i
    return (branching**d - 1) // (branching - 1) + i


def doc_spec(s: int, j: int, seed: int,
             words_mult: int = 1) -> tuple[int, int]:
    """(value_cents, n_words) for doc (s, j) — pure function of the key.
    ``words_mult`` scales doc weight (bench corpora use it to move wave
    cost from per-wave constants to real per-page bytes; goldens default
    to 1)."""
    h = int.from_bytes(
        hashlib.sha1(f"doc|{seed}|{s}|{j}".encode()).digest()[:8], "big")
    return h % 10_000_000, (5 + (h >> 32) % 60) * max(1, words_mult)


def hub_links(s: int, d: int, i: int, sites: int, branching: int,
              depth: int) -> list[tuple[str, int]]:
    """The abstract link list of hub (s, d, i): (target_url, report_num)
    pairs, in page order. report_num follows the URL-derived rule in
    pipelines/webgraph.py — duplicated here ON PURPOSE (the golden encodes
    the spec, the parser re-derives it from rendered HTML)."""
    out: list[tuple[str, int]] = []
    if d + 1 < depth:
        for k in range(branching):
            ic = i * branching + k
            out.append((hub_url(s, d + 1, ic), (d + 1) * 100_000 + ic))
        out.append((hub_url(s, d + 1, i * branching),
                    (d + 1) * 100_000 + i * branching))  # in-page dup
    ordn = hub_ordinal(d, i, branching)
    for k in range(L_PER_HUB):
        j = ordn * L_PER_HUB + k
        out.append((doc_url(s, j), 1_000_000 + j))
    out.append((doc_url((s + 1) % sites, i), 2_000_000 + i))  # cross-site
    if ordn != 0:
        out.append((hub_url(s, 0, 0), 0))  # backlink -> dedup hit
    out.append((about_url(s), 3_000_000))
    if d == depth - 1 and i == 0:
        out.append((doc_url(s, 999_000 + s), 1_000_000 + 999_000 + s))
    return out


def render_hub(s: int, d: int, i: int, sites: int, branching: int,
               depth: int) -> str:
    anchors = []
    for url, _ in hub_links(s, d, i, sites, branching, depth):
        host = host_of(s)
        href = url[len(f"https://{host}"):] if url.startswith(
            f"https://{host}/") else url
        anchors.append(f'<li><a href="{href}">{href}</a></li>')
    body = "\n".join(anchors)
    return (f"<html><body><h1>Hub {d}/{i}</h1>\n<ul>\n{body}\n</ul>\n"
            "</body></html>\n")


def render_doc(s: int, j: int, seed: int, words_mult: int = 1) -> str:
    value_cents, n_words = doc_spec(s, j, seed, words_mult)
    words = " ".join(f"tok{(j + k) % 997}" for k in range(n_words))
    return (f'<html><head><meta name="value-cents" '
            f'content="{value_cents}"></head>\n'
            f"<body><h1>Doc {j}</h1><p>{words}</p></body></html>\n")


def render_about(s: int) -> str:
    return (f"<html><body><h1>About {site_label(s)}</h1>"
            "<p>no links here</p></body></html>\n")


def simulate_crawl(sites: int, branching: int, depth: int
                   ) -> list[tuple[int, int, str, str]]:
    """Spec-level BFS evaluator -> [(seq, wave, url, host)] in the exact
    admission order the frontier produces: per wave, dedup candidates by
    url keeping the min (seed_rank, report_num) copy, drop urls already
    admitted, order by (seed_rank, report_num). Only admitted HUB pages
    expand. Uniqueness of (rank, rep) per distinct url per wave is
    asserted — it is what makes this evaluator hash-free and exact."""
    seen: set[str] = set()
    order: list[tuple[int, int, str, str]] = []
    seq = 0
    # wave-0 candidates: the seeds (rank = site, rep = 0)
    cands: list[tuple[str, int, int]] = [
        (hub_url(s, 0, 0), s, 0) for s in range(sites)]
    wave = 0
    while cands:
        best: dict[str, tuple[int, int]] = {}
        for url, rank, rep in cands:
            key = (rank, rep)
            if url not in best or key < best[url]:
                best[url] = key
        admitted = [(rank, rep, url) for url, (rank, rep) in best.items()
                    if url not in seen]
        keys = {(rank, rep) for rank, rep, _ in admitted}
        assert len(keys) == len(admitted), \
            "priority collision — golden would need the hash tie-break"
        admitted.sort()
        nxt: list[tuple[str, int, int]] = []
        for rank, rep, url in admitted:
            seen.add(url)
            from urllib.parse import urlsplit

            order.append((seq, wave, url, urlsplit(url).netloc))
            seq += 1
            # expand hubs only (the spec twin of the class dispatch)
            if "/hub/" in url:
                parts = url.rsplit("/hub/", 1)[1][:-5].split("/")
                d, i = int(parts[0]), int(parts[1])
                s = int(url.split("site")[1][:2])
                for turl, trep in hub_links(s, d, i, sites, branching, depth):
                    nxt.append((turl, rank, trep))
        cands = nxt
        wave += 1
    return order


def golden_tables(sites: int, branching: int, depth: int, seed: int
                  ) -> dict[str, pa.Table]:
    order = simulate_crawl(sites, branching, depth)
    crawl_tbl = pa.table({
        "seq": pa.array([o[0] for o in order], pa.int64()),
        "wave": pa.array([o[1] for o in order], pa.int32()),
        "url": pa.array([o[2] for o in order], pa.string()),
        "host": pa.array([o[3] for o in order], pa.string()),
    })
    # site stats over CRAWLED docs that exist (dangling links are admitted
    # but produce no page, hence no facts)
    stats: dict[str, list[int]] = {}
    for _, _, url, _ in order:
        if "/doc/" not in url:
            continue
        s = int(url.split("site")[1][:2])
        j = int(url.rsplit("/doc/", 1)[1][:-5])
        if j >= 999_000:  # dangling
            continue
        value_cents, n_words = doc_spec(s, j, seed)
        row = stats.setdefault(site_label(s), [0, 0, 0])
        row[0] += 1
        row[1] += value_cents
        row[2] += n_words
    labels = sorted(stats)
    stats_tbl = pa.table({
        "ticker": pa.array(labels, pa.string()),
        "n_docs": pa.array([stats[t][0] for t in labels], pa.int64()),
        "total_value_cents": pa.array([stats[t][1] for t in labels],
                                      pa.int64()),
        "total_words": pa.array([stats[t][2] for t in labels], pa.int64()),
    })
    return {"crawl_order_golden": crawl_tbl, "site_stats_golden": stats_tbl}


def web_seed_candidates(sites: int) -> pa.Table:
    """Frontier-schema seed table: one /hub/0/0.html per site, rank = s."""
    from ..stages.extract import _frontier_table

    rows = {c: [] for c in ("url", "depth", "ticker", "cik", "filing_type",
                            "filed_date", "accession", "doc_type",
                            "report_num", "seed_rank")}
    for s in range(sites):
        rows["url"].append(hub_url(s, 0, 0))
        rows["depth"].append(0)
        rows["ticker"].append(site_label(s))
        rows["cik"].append("")
        rows["filing_type"].append("")
        rows["filed_date"].append("")
        rows["accession"].append("")
        rows["doc_type"].append("hub")
        rows["report_num"].append(0)
        rows["seed_rank"].append(s)
    return _frontier_table(rows)


def gen_site_pages(s: int, sites: int, branching: int, depth: int,
                   seed: int, words_mult: int = 1) -> list[tuple[str, str]]:
    """All pages of one site, in deterministic order (pure function — the
    per-site unit the parallel generator fans out on)."""
    pages: list[tuple[str, str]] = []
    for d in range(depth):
        for i in range(branching**d):
            pages.append((hub_url(s, d, i),
                          render_hub(s, d, i, sites, branching, depth)))
    n_hubs = hub_ordinal(depth - 1, branching**(depth - 1) - 1,
                         branching) + 1
    for j in range(n_hubs * L_PER_HUB):
        pages.append((doc_url(s, j), render_doc(s, j, seed, words_mult)))
    pages.append((about_url(s), render_about(s)))
    return pages


def _pages_table(site_pages: list[list[tuple[str, str]]],
                 seed: int) -> pa.Table:
    pages = [p for sp in site_pages for p in sp]
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pages))
    urls, htmls = [], []
    for idx in order:
        url, html = pages[idx]
        urls.append(url)
        htmls.append(html.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def gen_graph_corpus(sites: int = 4, branching: int = 2, depth: int = 7,
                     seed: int = 42) -> dict[str, pa.Table]:
    """Pages table (shuffled deterministically) + goldens + seeds."""
    pages_tbl = _pages_table(
        [gen_site_pages(s, sites, branching, depth, seed)
         for s in range(sites)], seed)
    out = {"pages": pages_tbl, "seeds": web_seed_candidates(sites)}
    out.update(golden_tables(sites, branching, depth, seed))
    return out


def page_fetch_wave(url: str, branching: int) -> int:
    """The (unique) wave at which a page is first admitted — the partition
    key of the wave-partitioned pages layout (prune-at-the-read: wave w's
    fetch scans ONLY its partition instead of the whole corpus).

    Safe by construction: a hub (s,d,i) is first discovered by its parent
    at wave d; a doc j is first discovered by its OWNING hub (ordinal
    j // L) at that hub's depth + 1 — every cross-site link to doc j comes
    from a hub at depth d > d_local(j) (the link rule uses j = i < B^d, so
    ord = j // L < B^(d-1) hence d_local <= d-1), arrives at a LATER wave,
    and is always a seen-set dedup hit; /about.html is first linked by the
    depth-0 hub (wave 1). Dangling links have no page at all."""
    m = _RE_PFW_HUB.search(url)
    if m:
        return int(m.group(1))
    m = _RE_PFW_DOC.search(url)
    if m:
        ordn = int(m.group(1)) // L_PER_HUB
        d = 0
        while hub_ordinal(d + 1, 0, branching) <= ordn:
            d += 1
        return d + 1
    return 1  # /about.html


import re as _re

_RE_PFW_HUB = _re.compile(r"/hub/(\d+)/(\d+)\.html$")
_RE_PFW_DOC = _re.compile(r"/doc/(\d+)\.html$")


def graph_corpus_version() -> str:
    """Content hash of this generator + the webgraph pipeline module (the
    parser/extractor whose semantics the goldens cross-check), so cached
    corpora can never go stale across edits."""
    from ..pipelines import webgraph as _wg

    h = hashlib.sha1()
    for mod_file in (__file__, _wg.__file__):
        with open(mod_file, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]


def write_graph_corpus(out_dir: str, sites: int = 4, branching: int = 2,
                       depth: int = 7, seed: int = 42, goldens: bool = True,
                       parallelism: int | None = None,
                       partition_by_wave: bool = False,
                       words_mult: int = 1) -> dict[str, str]:
    """Write the corpus. With Ray up and a large site universe, per-site
    page generation fans out as Ray tasks (byte-identical to the serial
    path — per-site generation is pure and assembly order is site-major
    either way). ``goldens=False`` skips the spec evaluator (bench corpora
    at ~10^6 pages only need pages + seeds)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    if parallelism is None:
        parallelism = 28 if (sites >= 16 and ray.is_initialized()) else 1
    if parallelism > 1:
        gen_site = ray.remote(gen_site_pages)
        site_pages = ray.get([gen_site.remote(s, sites, branching, depth,
                                              seed, words_mult)
                              for s in range(sites)])
    else:
        site_pages = [gen_site_pages(s, sites, branching, depth, seed,
                                     words_mult)
                      for s in range(sites)]
    tables: dict[str, pa.Table] = {
        "pages": _pages_table(site_pages, seed),
        "seeds": web_seed_candidates(sites),
    }
    if goldens:
        tables.update(golden_tables(sites, branching, depth, seed))
    paths = {}
    for name, tbl in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        rgs = 2048 if name == "pages" else 64 * 1024
        pq.write_table(tbl, path, row_group_size=rgs)
        paths[name] = path
    if partition_by_wave:
        # wave-partitioned layout (the prune-at-the-read scale path: see
        # page_fetch_wave): pages/wave={w}/part.parquet, byte-identical
        # rows to the flat table
        pages = tables["pages"]
        waves = np.fromiter(
            (page_fetch_wave(u, branching)
             for u in pages["url"].to_pylist()), np.int32,
            count=pages.num_rows)
        base = os.path.join(out_dir, "pages_by_wave")
        for w in np.unique(waves):
            d_ = os.path.join(base, f"wave={int(w)}")
            os.makedirs(d_, exist_ok=True)
            part = pages.filter(pa.array(waves == w))
            # MANY files per wave: the file is Ray Data's default unit of
            # read parallelism — a single-file partition reads as ~one
            # block and the whole wave's fetch+parse runs near-serial
            # (measured: 8-CPU == 32-CPU wall on the heavy deep corpus)
            n_files = max(1, min(64, part.num_rows // 4096))
            step = -(-part.num_rows // n_files)
            for f_i, lo in enumerate(range(0, part.num_rows, step)):
                pq.write_table(
                    part.slice(lo, step),
                    os.path.join(d_, f"part-{f_i:03d}.parquet"),
                    row_group_size=2048)
        paths["pages_by_wave"] = base
    return paths
