"""End-to-end BFS crawl + extract pipeline (the flagship).

FRONTIER-DRIVEN wave loop over a data-driven page-class graph
(stages/graph.CrawlGraph): each wave admits the frontier's candidates,
fetches them ONCE, and dispatches fetched pages by class — expand classes
parse links into the next wave's candidates, terminal classes extract facts
partials. The loop runs until the frontier admits nothing; the facts reduce
runs once, after the loop, over the union of every terminal wave:

  seed frontier ──admit──> fetch (pages table ⋈ admitted urls)
      ──map_batches(dispatch: parsers+robots│extractor+partial by class)──>
          candidates ──admit──> …     facts partials ──(per wave)──>
  after loop: union(partials) ──groupby(key-bucket).map_groups(reduce)──> facts

The default graph is the reference's 3-level page walk (query -> filing
index -> R-report, /root/reference/page.go:42-73), which under the general
loop still crawls exactly 3 waves: report pages are terminal, so wave 3's
frontier is empty. A generic web graph (sources/synth_graph.py) runs the
same loop to arbitrary depth.

"Fetch" = lookup in the Common-Crawl-style ``pages`` Parquet table (the html
column stands in for live HTTP per the input contract); Ray task retries
replace the reference's ``log.Fatal`` (/root/reference/page.go:24).

Scale notes (100 TB pages / 10^10 URLs):
- each wave re-reads ``pages`` with column pruning and filters zero-copy by a
  BROADCAST admitted-key set (``ray.put`` once, read per task) while the wave
  fits in memory; above ``join_threshold`` rows it switches to a
  hash-partitioned ``Dataset.join`` on url — no driver materialization of page
  bytes ever happens in either path;
- the hot-host fetch skew (everything is sec.gov) is handled by salting the
  fetch partition purely on sha1(url) (the filter is key-local), while
  politeness stays host-global inside the frontier shards;
- checkpoint per wave: admitted table + next-wave candidates + cuckoo shards +
  per-shard lineage + the wave-2 parsed-facts parquet -> a killed run resumes
  from the last complete wave; a finished run resumes without refetching.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..stages.extract import (
    seed_frontier,
    url_host as extract_host,
)
from ..state.frontier import Frontier

# frontier metadata attached to fetched pages (page_class drives the
# per-class dispatch; the rest is the fixed priority/identity schema)
_META_COLS = ["ticker", "cik", "filing_type", "filed_date", "accession",
              "doc_type", "report_num", "seed_rank", "page_class"]


@dataclass
class CrawlResult:
    filings_facts: Any  # ray.data.Dataset
    crawl_order: pa.Table
    lineage: pa.Table
    metrics: dict = field(default_factory=dict)


class _ConsumedFacts:
    """Wrapper for an already-counted facts Dataset (consume_facts=True):
    count() returns the cached value; everything else delegates."""

    def __init__(self, ds, n):
        self._ds = ds
        self._n = n

    def count(self):
        return self._n

    def __getattr__(self, name):
        return getattr(self._ds, name)


def _make_fetch_fn(keys_ref, order_ref, meta_ref):
    """Stateless fetch filter: keep pages whose url key is in the admitted
    set and attach the frontier metadata (broadcast-small-side hash join,
    SURVEY.md §2.4 J1).

    The broadcast side ships ZERO-COPY: a sorted uint64 sha1-key array
    (numpy) plus the admitted metadata as an Arrow table — a Python dict here
    would be re-pickled/deserialized in every task, which dominates wall time
    at large waves. Membership = hash + searchsorted; metadata attach =
    Arrow ``take``. 64-bit sha1 prefixes collide with probability ~n^2/2^64
    (~1e-10 at 10^5-URL waves; per-shard at 10^10 scale)."""
    import numpy as np

    from ..state.cuckoo import hash_urls

    def fetch(batch: pa.Table) -> pa.Table:
        keys_sorted = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        order = ray.get(order_ref) if isinstance(order_ref, ray.ObjectRef) else order_ref
        meta = ray.get(meta_ref) if isinstance(meta_ref, ray.ObjectRef) else meta_ref
        urls = batch["url"].to_pylist()
        h = hash_urls(urls)
        pos = np.searchsorted(keys_sorted, h)
        pos_c = np.minimum(pos, len(keys_sorted) - 1)
        hit = keys_sorted[pos_c] == h
        if not hit.any():
            return _empty_fetch(batch)
        keep = np.nonzero(hit)[0]
        sub = batch.take(pa.array(keep, pa.int64()))
        # meta ships UNSORTED (no driver-side full-table take); map sorted
        # key positions back through the argsort order and take only hits
        meta_rows = meta.take(pa.array(order[pos_c[keep]], pa.int64()))
        for col in _META_COLS:
            sub = sub.append_column(col, meta_rows[col])
        return sub

    return fetch


def _empty_fetch(batch: pa.Table) -> pa.Table:
    sub = batch.slice(0, 0)
    for col in _META_COLS:
        typ = pa.int32() if col in ("report_num", "seed_rank") else pa.string()
        sub = sub.append_column(col, pa.array([], typ))
    return sub


def _call_pages_source(pages_source, wave: int | None):
    """Factories may accept the wave number (prune at the read: a class- or
    depth-partitioned pages store only scans the relevant partition); no-arg
    factories get called plain."""
    import inspect

    try:
        takes_wave = len(inspect.signature(pages_source).parameters) >= 1
    except (TypeError, ValueError):
        takes_wave = False
    return pages_source(wave) if takes_wave else pages_source()


def _fetch_wave(pages_source, admitted, join_threshold: int,
                wave: int | None = None, num_rows: int | None = None):
    """pages ⋈ admitted urls -> Dataset of page rows + frontier metadata.
    ``admitted`` is an Arrow table (broadcast regime) or a Dataset (join
    regime for waves too large to assemble on one process)."""
    import numpy as np

    from ..state.cuckoo import hash_urls

    pages_ds = _call_pages_source(pages_source, wave)
    if not isinstance(admitted, pa.Table):
        # large-wave path, Dataset in: hash-partitioned join on url — no
        # driver assembly of the admitted side at all
        n = num_rows if num_rows is not None else admitted.count()
        return pages_ds.join(
            admitted.select_columns(["url"] + _META_COLS),
            join_type="inner", on=("url",),
            num_partitions=max(16, n // 500_000),
        )
    # broadcast vs shuffle: the admitted-side is frontier METADATA (~300
    # B/url); a wave of 5M urls broadcasts ~1.5 GB ONCE PER NODE (plasma
    # zero-copy reads across that node's workers), far cheaper than an
    # all-to-all that moves every page byte. The hash-partitioned join is
    # the fallback for waves too big for a node's object store.
    if admitted.num_rows <= join_threshold:
        if "url_sha1" in admitted.column_names:
            # reuse the sha1 digests computed in the parse stages: first 8
            # big-endian bytes == hash_urls. The digests are fixed 20-byte
            # values in a variable-width binary column, so the key matrix
            # is a strided view over the Arrow data buffer — no per-row
            # Python bytes objects on the driver (up to 5M/wave before).
            arr = admitted["url_sha1"].combine_chunks()
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
            if arr.null_count == 0 and np.all(np.diff(offs) == 20):
                data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
                mat = data[offs[0]: offs[-1]].reshape(-1, 20)
            else:  # defensive: schema drift to ragged/null digests
                mat = np.frombuffer(
                    b"".join(admitted["url_sha1"].to_pylist()),
                    np.uint8).reshape(-1, 20)
            keys = (mat[:, :8].copy().view(">u8").astype(np.uint64)
                    .reshape(-1))
        else:
            keys = hash_urls(admitted["url"].to_pylist())
        order = np.argsort(keys)
        keys_ref = ray.put(keys[order])
        order_ref = ray.put(order)
        meta_ref = ray.put(admitted.select(_META_COLS))
        return pages_ds.map_batches(
            _make_fetch_fn(keys_ref, order_ref, meta_ref), batch_format="pyarrow"
        )
    # large-wave path: hash-partitioned join on url (no broadcast)
    admitted_ds = rd.from_arrow(admitted.select(["url"] + _META_COLS))
    return pages_ds.join(
        admitted_ds, join_type="inner", on=("url",),
        num_partitions=max(16, admitted.num_rows // 500_000),
    )


def parse_robots_txt(text: str, host: str) -> list[str]:
    """Minimal robots.txt subset: ``Disallow:`` paths under ``User-agent: *``
    become full-URL prefixes (the frontier matches candidates by prefix)."""
    prefixes: list[str] = []
    in_star = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            in_star = val == "*"
        elif key == "disallow" and in_star and val:
            prefixes.append(f"https://{host}{val}")
    return prefixes


@ray.remote
def _scan_robots_rgs(path: str, rgs: list[int], want: list[str]) -> pa.Table:
    """Scan the url column of a slice of row groups; re-read url+html for
    row groups containing a robots.txt hit (tiny — at most one per host)."""
    import pyarrow.compute as pc

    pf = pq.ParquetFile(path)
    want_arr = pa.array(want)
    out = []
    for rg in rgs:
        urls = pf.read_row_group(rg, columns=["url"])["url"]
        m = pc.is_in(urls, value_set=want_arr)
        if pc.any(m).as_py():
            out.append(pf.read_row_group(rg, columns=["url", "html"])
                       .filter(m))
    return (pa.concat_tables(out) if out
            else pa.table({"url": pa.array([], pa.string()),
                           "html": pa.array([], pa.binary())}))


def load_robots(pages_source, hosts: list[str],
                pages_path: str | list[str] | None = None) -> dict[str, list[str]]:
    """Fetch + parse each host's /robots.txt (stands in for the out-of-band
    robots fetch of a live crawler; cached on the driver for the whole run).

    With a parquet path available: a DISTRIBUTED url-only row-group scan
    (Ray tasks over row-group slices) followed by targeted row-group reads
    for the hits. A driver-side predicate-pushdown read is the wrong shape
    here: web-corpus urls are not sorted, so every row group's [min, max]
    straddles the target and the 'pruned' read decodes the whole table
    single-threaded (measured 6.3 s on the 1.77M-page bench corpus — the
    largest fixed setup cost of a crawl; the distributed scan is ~0.5 s and
    scales with the cluster). Otherwise one tiny filtered pass over the
    pages source."""
    targets = {f"https://{h}/robots.txt": h for h in hosts}

    if pages_path is not None:
        import pyarrow.dataset as pads

        files = pads.dataset(pages_path).files
        want = sorted(targets)
        refs = []
        for f in files:
            n_rg = pq.ParquetFile(f).metadata.num_row_groups
            # ~4 slices per CPU across all files keeps tasks coarse
            n_tasks = max(1, min(n_rg, int(ray.cluster_resources()
                                           .get("CPU", 8)) * 4))
            step = -(-n_rg // n_tasks)
            for lo in range(0, n_rg, step):
                refs.append(_scan_robots_rgs.remote(
                    f, list(range(lo, min(lo + step, n_rg))), want))
        # a path that resolves to zero files/row groups yields no scan tasks;
        # match the filtered-pass behavior (empty url/html table, no rules)
        found = (pa.concat_tables(ray.get(refs)) if refs
                 else pa.table({"url": pa.array([], pa.string()),
                                "html": pa.array([], pa.binary())}))
    else:
        t_ref = ray.put(set(targets))

        def keep(batch: pa.Table) -> pa.Table:
            want = ray.get(t_ref) if isinstance(t_ref, ray.ObjectRef) else t_ref
            mask = pa.array([u in want for u in batch["url"].to_pylist()])
            return batch.filter(mask).select(["url", "html"])

        found = _collect_table(
            _call_pages_source(pages_source, None)
            .map_batches(keep, batch_format="pyarrow"))
    rules: dict[str, list[str]] = {}
    if found is not None:
        for row in found.to_pylist():
            host = targets[row["url"]]
            body = row["html"]
            body = body.decode() if isinstance(body, bytes) else body
            prefixes = parse_robots_txt(body, host)
            if prefixes:
                rules[host] = prefixes
    return rules


def _collect_table(ds) -> pa.Table:
    """Materialize a (frontier-metadata-sized) Dataset to one Arrow table."""
    refs = ds.to_arrow_refs()
    tbls = [t for t in ray.get(refs) if t.num_rows]
    if not tbls:
        return None
    # combine_chunks: a many-block concat yields hundreds of tiny chunks,
    # which makes every downstream serialization (shard routing RPCs) ~50x
    # slower than a single contiguous buffer
    return pa.concat_tables(tbls, promote_options="default").combine_chunks()




@ray.remote
def _split_kind_block(t: pa.Table, kind: int, cols: list[str],
                      empty: pa.Table) -> pa.Table:
    """Per-block outbox split (bare task, not a Dataset plan: a mixed wave
    would otherwise pay 2 extra plan-launch constants per wave — measured
    ~0.5 s each on deep crawls where waves are orchestration-bound).
    ``empty`` is the schema template for pass-through empty blocks the
    executor may retain from BEFORE the dispatch map (join-regime fetches
    emit them with the join schema, which has no ``_kind``)."""
    import pyarrow.compute as pc

    if t.num_rows == 0 or "_kind" not in t.column_names:
        return empty
    return t.filter(pc.equal(t["_kind"], kind)).select(cols)


@ray.remote
def _concat_blocks(*tbls: pa.Table) -> pa.Table:
    return pa.concat_tables(tbls).combine_chunks()


@ray.remote
def _sum_int_col(t: pa.Table, col: str) -> int:
    import pyarrow.compute as pc

    if t.num_rows == 0 or col not in t.column_names:
        return 0
    return int(pc.sum(t[col]).as_py() or 0)


@ray.remote
def _count_classes(tbl: pa.Table, term_list: list[str],
                   known_list: list[str]) -> tuple[int, int]:
    """Block-parallel (terminal rows, dead-end rows) count for join-regime
    waves (the driver never touches the admitted metadata itself there).
    Dead end = a class with no parser that is not terminal."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0 or "page_class" not in tbl.column_names:
        return 0, 0
    n_term = int(pc.sum(pc.is_in(
        tbl["page_class"], value_set=pa.array(term_list))).as_py() or 0)
    n_known = int(pc.sum(pc.is_in(
        tbl["page_class"], value_set=pa.array(known_list))).as_py() or 0)
    return n_term, tbl.num_rows - n_known


def crawl(
    pages_path: str | list[str] | None,
    seed_tickers: pa.Table | None,
    *,
    pages_ds_factory=None,
    filing_types: tuple[str, ...] = ("10-K", "10-Q"),
    graph=None,
    seed_candidates: pa.Table | None = None,
    max_waves: int | None = None,
    num_shards: int = 4,
    capacity: int = 1 << 18,
    host_budget: float = 1000.0,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    join_threshold: int = 5_000_000,
    admit_driver_threshold: int = 500_000,
    collect_order: bool = True,
    live_transport=None,
    live_clock=None,
    live_strict_per_host: bool = False,
    merge_partitions: int | str | None = "auto",
    merge_num_buckets: int = 64,
    stop_after_wave: int | None = None,
    respect_robots: bool = True,
    consume_facts: bool = False,
    output_dir: str | None = None,
) -> CrawlResult:
    """Run a frontier-driven crawl over a pages table.

    The wave loop is GENERAL: it runs until the frontier admits nothing (or
    ``max_waves``/``stop_after_wave`` caps it), dispatching each fetched
    page by its ``page_class`` through the :class:`~..stages.graph.CrawlGraph`
    spec — expand classes parse links into the next wave's candidates,
    terminal classes extract facts partials that are merged ONCE after the
    loop by the graph's reducer. ``graph=None`` selects the EDGAR 3-level
    graph (/root/reference/page.go:42-73), which under this loop still
    crawls exactly 3 waves because report pages are terminal and the
    frontier then empties by itself. Returns the merged facts Dataset
    (lazy) plus crawl order / lineage tables.

    Mixed terminal+expand waves fetch ONCE and split the materialized
    per-wave outbox (candidates + facts partials share one padded schema
    with a ``_kind`` tag); pure waves skip the padding entirely, so the
    EDGAR graph's per-wave plans are byte-identical to the fixed-depth
    loop it replaces.
    """
    import time

    import pyarrow.compute as pc

    from ..stages.graph import (
        KIND_CANDIDATE,
        KIND_FACTS,
        edgar_graph,
        empty_pages_batch,
        make_dispatch,
        with_page_class,
    )

    t_setup = time.monotonic()

    if graph is None:
        graph = edgar_graph()

    if merge_partitions == "auto":
        # pre-merge coalesce width: ~2 blocks per core feeds the merge
        # shuffle without fragmenting it (same-window A/B at 1.77M pages:
        # 16 partitions beat 32 at 8 CPUs — merge_s 3.4 vs 4.4-5.7 s —
        # while 32 stays right at 32 CPUs; no coalesce at all costs 4-5x,
        # measured 17-22 s). Explicit ints and None (disable) are respected.
        merge_partitions = min(32, max(8, 2 * int(
            ray.cluster_resources().get("CPU", 16))))

    if pages_ds_factory is None and pages_path is not None:
        cols = ["url", "html"]
        pages_ds_factory = lambda: rd.read_parquet(pages_path, columns=cols)  # noqa: E731

    # seed frontier: either caller-provided candidates (generic graphs) or
    # the EDGAR (ticker, filing type) query URLs; page_class attaches here
    # (driver-side is fine: seeds are tiny) and inside the parse stages for
    # every later wave
    if seed_candidates is not None:
        seeds_tbl = with_page_class(seed_candidates, graph.classify)
    else:
        seeds_tbl = with_page_class(
            seed_frontier(seed_tickers, filing_types), graph.classify)

    # shard actors start spinning up while robots.txt is fetched/parsed
    frontier = Frontier(num_shards=num_shards, capacity=capacity,
                        host_budget=host_budget)
    robots_gate = None
    if respect_robots:
        hosts = sorted({extract_host(u)
                        for u in seeds_tbl["url"].to_pylist()})
        if live_transport is not None and pages_ds_factory is None:
            # live mode: robots.txt comes over the transport itself, with
            # the same retry/backoff discipline as the page fetcher. Only a
            # KeyError (the transport's 404: host publishes no robots.txt)
            # disables rules for a host; a persistently-failing transient
            # fetch RAISES instead of silently crawling without robots.
            rules = {}
            sleeper = live_clock if live_clock is not None else time
            for h in hosts:
                body, delay, last_err = None, 0.5, None
                for attempt in range(4):
                    try:
                        body = live_transport(f"https://{h}/robots.txt")
                        last_err = None
                        break
                    except KeyError:
                        last_err = None  # no robots.txt published
                        break
                    except Exception as e:  # transient transport error
                        last_err = e
                        if attempt < 3:  # sleep only BETWEEN attempts
                            sleeper.sleep(delay)
                            delay *= 2
                if last_err is not None:
                    raise RuntimeError(
                        f"robots.txt fetch for {h} failed after retries "
                        f"(refusing to crawl without robots rules)"
                    ) from last_err
                if body is None:
                    continue
                body = body.decode() if isinstance(body, bytes) else body
                prefixes = parse_robots_txt(body, h)
                if prefixes:
                    rules[h] = prefixes
        else:
            rules = load_robots(pages_ds_factory, hosts, pages_path=pages_path)
        frontier.set_robots(rules)
        if rules:
            from ..state.frontier import _rules_by_len, robots_block_mask

            rules_ref = ray.put(_rules_by_len(rules))

            def robots_gate(batch: pa.Table) -> pa.Table:
                """Distributed robots gate: candidates get a robots_ok column
                inside the parse map stage (vectorized prefix match in the
                workers), so admission never does O(candidates) string work
                on the driver."""
                import numpy as np

                r = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) \
                    else rules_ref
                if batch.num_rows == 0:
                    return batch.append_column("robots_ok", pa.array([], pa.bool_()))
                urls = np.asarray(batch["url"].to_pylist(), dtype=str)
                ok = ~robots_block_mask(urls, r)
                return batch.append_column("robots_ok", pa.array(ok))

    # facts machinery: probe the graph's extractor+partial once for the
    # facts-partial schema (drives mixed-wave padding and empty outputs)
    partial_fn = graph.partial_factory(merge_num_buckets)
    probe = partial_fn(graph.extractor(empty_pages_batch()))
    facts_fields = list(zip(probe.schema.names, probe.schema.types))
    facts_cols = [n for n, _ in facts_fields]
    cand_fields = list(zip(seeds_tbl.schema.names, seeds_tbl.schema.types))
    if robots_gate is not None:
        cand_fields.append(("robots_ok", pa.bool_()))
    cand_cols = [n for n, _ in cand_fields]
    union_fields = (cand_fields
                    + [(n, t) for n, t in facts_fields if n not in cand_cols]
                    + [("_kind", pa.int8())])

    manifest_path = os.path.join(checkpoint_dir, "MANIFEST.json") if checkpoint_dir else None
    completed: dict[str, Any] = {"waves": []}
    start_wave = 0
    done_waves: set[int] = set()
    # candidates live as a DATASET end to end (admission is distributed;
    # the driver never materializes the candidate table)
    candidates = rd.from_arrow(seeds_tbl)
    admitted_tables: list[pa.Table] = []

    if resume and manifest_path and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            completed = json.load(f)
        done_waves = set(completed["waves"])
        if done_waves:
            last = max(done_waves)
            frontier.restore(checkpoint_dir)
            for w in sorted(done_waves):
                admitted_tables.append(
                    pq.read_table(os.path.join(checkpoint_dir, f"wave{w}_admitted.parquet"))
                )
            nxt = os.path.join(checkpoint_dir, f"wave{last}_next.parquet")
            candidates = rd.read_parquet(nxt) if os.path.exists(nxt) else None
            start_wave = last + 1

    t0 = time.monotonic()
    # pre-wave constant: robots load + frontier shard spin-up + seed build
    # (equal on every cluster size — the scaling analysis tracks it)
    setup_s = t0 - t_setup
    pages_fetched = 0
    facts_srcs: list = []  # this run's terminal-wave partial Datasets
    last_term_wave: int | None = None
    wave_timings: dict[int, dict] = {}
    stamped_by_wave: dict[int, list] = {}
    term_list = sorted(graph.terminal)
    term_arr = pa.array(term_list)
    known_list = sorted(set(term_list) | set(graph.parsers))
    known_arr = pa.array(known_list)
    dead_end_pages = 0
    wave = start_wave
    while candidates is not None and (max_waves is None or wave < max_waves):
        # resumed candidates from a pre-graph checkpoint (or hand-built
        # tables) may lack page_class — attach it distributed
        if "page_class" not in candidates.schema().names:
            candidates = candidates.map_batches(
                lambda t: with_page_class(t, graph.classify),
                batch_format="pyarrow")
        t_w = time.monotonic()
        # Admission is HYBRID by wave size (both paths share the same shard
        # actors, politeness clock and semantics — identical results):
        # - small ramp-up waves (the BFS frontier of a fresh crawl): the
        #   driver path — collect the tiny metadata table, one numpy
        #   lexsort; the distributed machinery's per-plan constants would
        #   dominate at this size even on a real cluster;
        # - large waves: fully distributed (frontier.admit_wave_ds) —
        #   robots gate + in-wave dedup + cuckoo-shard filter + priority
        #   sort + seq/politeness stamping run as Ray Data stages /
        #   block-parallel tasks; the driver sees per-block metadata only.
        n_cand = candidates.count()
        if n_cand == 0:
            break
        if n_cand <= admit_driver_threshold:
            cand_tbl = _collect_table(candidates)
            admitted = (frontier.admit_wave(cand_tbl, wave)
                        if cand_tbl is not None else None)
            n_admitted = admitted.num_rows if admitted is not None else 0
            if n_admitted == 0:
                break
            admitted_tables.append(admitted)
            # the UNFILTERED admitted table is what checkpoints: the
            # mid-wave resume filter below drops already-done partition rows
            # from the FETCH only — persisting the filtered variant would
            # permanently lose those rows from wave{N}_admitted.parquet (seq
            # gaps in a later crawl_order rebuild). The distributed path
            # checkpoints pre-filter stamped refs; this keeps parity.
            admitted_ckpt = admitted
            admitted_ds = None
            sorted_refs = None
        else:
            stamped_refs, n_admitted, sorted_refs = frontier.admit_wave_ds(
                candidates, wave)
            if n_admitted == 0:
                break
            # the stamping tasks only add the crawl-order columns — keep
            # them OFF the critical path (collected lazily at
            # checkpoint/end) and launch the fetch from the pre-stamp
            # sorted blocks now
            stamped_by_wave[wave] = stamped_refs
            if n_admitted <= join_threshold:
                # broadcast-fetch regime: assemble the admitted METADATA
                # table once (required by the broadcast join anyway)
                admitted = pa.concat_tables(
                    ray.get(sorted_refs)).combine_chunks()
                admitted_ds = None
            else:
                # join regime: admitted stays a Dataset end to end
                admitted = None
                admitted_ds = rd.from_arrow_refs(sorted_refs)
        t_admit = time.monotonic() - t_w
        t_w = time.monotonic()
        # wave composition: terminal rows feed the extractor, expand rows
        # feed the link parsers; pure waves skip the mixed-schema padding
        if admitted is not None:
            if "page_class" not in admitted.column_names:
                admitted = with_page_class(admitted, graph.classify)
            tmask = pc.is_in(admitted["page_class"], value_set=term_arr)
            n_term = int(pc.sum(tmask).as_py() or 0)
            n_known = int(pc.sum(pc.is_in(admitted["page_class"],
                                          value_set=known_arr)).as_py() or 0)
            dead_end_pages += n_admitted - n_known
        else:
            counts = ray.get([_count_classes.remote(r, term_list,
                                                    known_list)
                              for r in sorted_refs])
            n_term = sum(c[0] for c in counts)
            dead_end_pages += sum(c[1] for c in counts)
        n_expand = n_admitted - n_term
        mode = ("mixed" if (n_term and n_expand)
                else ("facts" if n_term else "cand"))
        # mid-wave resume granularity: TERMINAL rows whose facts partition
        # already carries a _DONE marker (from a run killed mid-wave) are
        # dropped BEFORE the fetch — only unfinished partitions refetch
        # (finer than the all-or-nothing wave checkpoint). Expand rows are
        # never dropped: an incomplete wave must still discover its links.
        skipped_pages = 0
        done_parts: set = set()
        live_skip_parts: list = []
        pcol = graph.partition_col
        facts_dir = (os.path.join(checkpoint_dir, f"wave{wave}_facts_raw")
                     if checkpoint_dir else None)
        if n_term and facts_dir:
            from ..stages.sink import finished_partitions

            done_parts = finished_partitions(facts_dir, pcol)
            if done_parts and not os.path.exists(
                    os.path.join(facts_dir, "_DONE")):
                live_skip_parts = sorted(done_parts)
                done_arr = pa.array(live_skip_parts)
                if admitted is not None:
                    drop = pc.and_(pc.is_in(admitted[pcol],
                                            value_set=done_arr),
                                   pc.is_in(admitted["page_class"],
                                            value_set=term_arr))
                    before = admitted.num_rows
                    admitted = admitted.filter(pc.invert(drop))
                    skipped_pages = before - admitted.num_rows
                else:
                    done_ref = ray.put((live_skip_parts, term_list, pcol))

                    def _drop_done(t: pa.Table) -> pa.Table:
                        import pyarrow.compute as _pc

                        dl, tl, pc_ = ray.get(done_ref) if isinstance(
                            done_ref, ray.ObjectRef) else done_ref
                        drop_ = _pc.and_(
                            _pc.is_in(t[pc_], value_set=pa.array(dl)),
                            _pc.is_in(t["page_class"],
                                      value_set=pa.array(tl)))
                        return t.filter(_pc.invert(drop_))

                    admitted_ds = admitted_ds.map_batches(
                        _drop_done, batch_format="pyarrow").materialize()
                    skipped_pages = n_admitted - admitted_ds.count()
        if live_transport is not None:
            # live-HTTP escape hatch: fetch over the injected transport with
            # retries + fetcher-side politeness (stages/fetch_http.py); the
            # stamped rows carry scheduled_at, so this path consumes them
            # instead of the pages-table join
            from ..stages.fetch_http import fetch_live

            if wave in stamped_by_wave:
                live_src = rd.from_arrow_refs(stamped_by_wave[wave])
                if live_skip_parts:
                    # mid-wave resume: drop finished TERMINAL partitions
                    # BEFORE touching the live host (the stamped refs are
                    # pre-filter; the parquet path filtered admitted above)
                    skip_ref = ray.put((live_skip_parts, term_list, pcol))

                    def _drop_done_live(t: pa.Table) -> pa.Table:
                        import pyarrow.compute as _pc

                        dl, tl, pc_ = ray.get(skip_ref) if isinstance(
                            skip_ref, ray.ObjectRef) else skip_ref
                        drop_ = _pc.and_(
                            _pc.is_in(t[pc_], value_set=pa.array(dl)),
                            _pc.is_in(t["page_class"],
                                      value_set=pa.array(tl)))
                        return t.filter(_pc.invert(drop_))

                    live_src = live_src.map_batches(
                        _drop_done_live, batch_format="pyarrow")
            else:
                live_src = rd.from_arrow(admitted)
            fetched = fetch_live(
                live_src, live_transport, clock=live_clock,
                strict_per_host=live_strict_per_host,
            ).map_batches(
                lambda t: t.filter(pc.equal(t["fetch_status"],
                                            pa.scalar("ok")))
                .drop_columns(["fetch_status", "fetch_attempts"]),
                batch_format="pyarrow")
        else:
            fetched = _fetch_wave(pages_ds_factory,
                                  admitted if admitted_ds is None else admitted_ds,
                                  join_threshold, wave=wave,
                                  num_rows=n_admitted - skipped_pages)
        # ONE fetch per wave feeds the class dispatch (parsers + robots
        # gate for expand rows, extractor + partial combiner for terminal
        # rows — fused into the fetch plan like the legacy per-wave
        # stages). Materializing the outbox decouples the heavy fetch+parse
        # map from the admission/merge all-to-alls (sharing one streaming
        # plan thrashes executor resource reservations — measured 3-5x
        # wall) and is the natural wave checkpoint boundary; only parsed
        # METADATA and ~100-byte facts partials materialize, never html.
        dispatch = make_dispatch(graph, partial_fn, robots_gate=robots_gate,
                                 mode=mode, union_fields=union_fields)
        t_stage = time.monotonic()
        outbox = fetched.map_batches(
            dispatch, batch_format="pyarrow").materialize()
        facts_refs = None
        if mode == "cand":
            cand_next, facts_w = outbox, None
        elif mode == "facts":
            cand_next, facts_w = None, outbox
            facts_refs = outbox.to_arrow_refs()
        else:
            # split the materialized outbox with BARE block tasks instead
            # of two more Dataset plans (plan-launch constants dominate
            # deep-crawl waves), and coalesce each wave's metadata-sized
            # facts partials to a few blocks so the post-loop union never
            # accumulates one tiny block per fetch block per wave
            # (measured: 13-wave merge 61 s -> 2 s with flat-union +
            # coalesce; split-as-plans cost a further ~1 s/wave)
            refs = outbox.to_arrow_refs()
            cand_empty = pa.table(
                {n: pa.array([], t) for n, t in cand_fields})
            facts_empty = probe.slice(0, 0)
            cand_next = rd.from_arrow_refs(
                [_split_kind_block.remote(r, KIND_CANDIDATE, cand_cols,
                                          cand_empty)
                 for r in refs])
            fr = [_split_kind_block.remote(r, KIND_FACTS, facts_cols,
                                           facts_empty)
                  for r in refs]
            nb = min(8, len(fr))
            facts_refs = [_concat_blocks.remote(*fr[i::nb])
                          for i in range(nb)]
            facts_w = rd.from_arrow_refs(facts_refs)
        extract_s = time.monotonic() - t_stage
        pages_ok = pages_err = 0
        if facts_w is not None:
            last_term_wave = wave
            # fetch accounting (lineage: pages_ok/pages_err): each partial
            # carries how many page rows it collapsed; admitted urls absent
            # from the pages table are fetch failures (404s of the stand-in).
            # Block-parallel task sum — not Dataset.sum, which is one more
            # plan launch per terminal wave.
            pages_ok = sum(ray.get(
                [_sum_int_col.remote(r, "pages_in_partial")
                 for r in facts_refs]))
            pages_err = int(n_term - skipped_pages) - pages_ok
            if facts_dir:
                # facts checkpoint: the compact parsed form lands
                # PARTITIONED through the resumable sink (per-partition
                # _DONE markers), so a run killed mid-wave resumes at
                # partition granularity instead of refetching the whole
                # wave; the wave-level _DONE still marks full completion
                from ..stages.sink import write_partitioned

                if not os.path.exists(os.path.join(facts_dir, "_DONE")):
                    os.makedirs(facts_dir, exist_ok=True)
                    write_partitioned(facts_w, facts_dir, pcol)
                    with open(os.path.join(facts_dir, "_DONE"), "w") as fh:
                        fh.write("")
                # read back the FULL set (this run's partitions + any from
                # the killed run) for the merge
                facts_srcs.append(rd.read_parquet(facts_dir))
            else:
                facts_srcs.append(facts_w)
        candidates = cand_next
        wave_timings[wave] = {
            "admit_s": round(t_admit, 3),
            "exec_s": round(time.monotonic() - t_w, 3),
            "pages": int(n_admitted),
            **({"pages_skipped": int(skipped_pages)} if skipped_pages else {}),
            # distributed-path phase split (absent on the driver fast path)
            **(getattr(frontier, "last_admit_phases", None) or {}),
        }
        frontier.last_admit_phases = None  # one-shot: never leak to later waves
        if facts_w is not None:
            wave_timings[wave]["pages_ok"] = int(pages_ok)
            wave_timings[wave]["pages_err"] = int(pages_err)
            # per-stage breakdown: extract_s = fetch+parse/extract map up to
            # the outbox materialize barrier; merge_s (stamped onto the LAST
            # terminal wave after the loop) = coalesce + merge shuffle +
            # reduce + sink/consume — the orchestration constant the scaling
            # analysis tracks
            wave_timings[wave]["extract_s"] = round(extract_s, 3)
        if mode != "cand":
            wave_timings[wave]["pages_terminal"] = int(n_term)
        pages_fetched += n_admitted - skipped_pages

        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            # the stamped admitted metadata (seq / scheduled_at / wave) is
            # the per-wave resume checkpoint; for distributed waves stamping
            # ran concurrently with the fetch, so this get is usually free
            if wave in stamped_by_wave:
                admitted_stamped = pa.concat_tables(
                    ray.get(stamped_by_wave[wave])).combine_chunks()
            else:
                admitted_stamped = admitted_ckpt  # driver-path wave (pre-filter)
            pq.write_table(admitted_stamped,
                           os.path.join(checkpoint_dir, f"wave{wave}_admitted.parquet"))
            if candidates is not None:
                # candidates are a Dataset: materialize once (the next wave
                # reuses the blocks) and write the checkpoint distributed,
                # never via a driver table
                candidates = candidates.materialize()
                nxt_dir = os.path.join(checkpoint_dir, f"wave{wave}_next.parquet")
                if os.path.isdir(nxt_dir):
                    import shutil
                    shutil.rmtree(nxt_dir)
                candidates.write_parquet(nxt_dir)
            frontier.checkpoint(checkpoint_dir)
            # per-partition fetch lineage snapshot (north rule): shard/wave
            # counters as parquet alongside the frontier state
            pq.write_table(frontier.lineage_table(),
                           os.path.join(checkpoint_dir, "lineage.parquet"))
            completed["waves"] = sorted(set(completed["waves"]) | {wave})
            with open(manifest_path, "w") as f:
                json.dump(completed, f)
        if stop_after_wave is not None and wave >= stop_after_wave:
            break
        wave += 1

    # facts from waves completed in EARLIER runs (resume): every done wave's
    # checkpointed partials join the merge; waves re-run this session are
    # not in done_waves, so nothing double-counts
    if checkpoint_dir:
        for w in sorted(done_waves):
            d = os.path.join(checkpoint_dir, f"wave{w}_facts_raw")
            if os.path.exists(os.path.join(d, "_DONE")):
                facts_srcs.insert(0, rd.read_parquet(d))

    # ONE reduce over the union of all terminal waves' partials, after the
    # loop (the EDGAR graph has a single terminal wave, so this is exactly
    # the legacy in-wave merge; a general graph's leaf pages can surface at
    # any depth). Wall time is attributed to the last terminal wave's
    # exec_s/merge_s so the steady-state metrics keep their meaning.
    t_merge0 = time.monotonic()
    facts_ds = None
    if facts_srcs:
        # ONE flat union (chained .union() calls nest the plan one level
        # per wave — measured 61 s of per-block constants over ~1.5k tiny
        # blocks at 13 waves on the 1M-page graph corpus)
        facts_raw = (facts_srcs[0].union(*facts_srcs[1:])
                     if len(facts_srcs) > 1 else facts_srcs[0])
        # coalesce the many small filtered blocks before the merge shuffle
        # (fewer shuffle tasks; row-preserving — at production block sizes
        # this is a no-op and can be disabled with merge_partitions=None)
        if merge_partitions:
            facts_raw = facts_raw.repartition(merge_partitions)
        facts_ds = graph.reduce_factory(merge_num_buckets)(facts_raw)
        if output_dir:
            # warehouse sink: partitioned resumable Parquet (S7; finished
            # partitions skip on a re-run)
            from ..stages.sink import write_partitioned

            sink_stats = write_partitioned(facts_ds, output_dir, pcol)
            facts_ds = rd.read_parquet(output_dir)
            wave_timings.setdefault("sink", {}).update(sink_stats)
        if consume_facts:
            n_facts = facts_ds.count()
            facts_ds = _ConsumedFacts(facts_ds, n_facts)
    merge_s = time.monotonic() - t_merge0
    if last_term_wave is not None:
        wt = wave_timings[last_term_wave]
        wt["merge_s"] = round(merge_s, 3)
        wt["exec_s"] = round(wt["exec_s"] + merge_s, 3)

    order_cols = ["seq", "wave", "url", "url_sha1", "host", "scheduled_at"]
    n_order_rows = (sum(t.num_rows for t in admitted_tables)
                    + sum(wave_timings[w]["pages"] for w in stamped_by_wave
                          if w in wave_timings))
    if collect_order:
        # crawl order: resume-loaded waves (tables) + this run's stamped
        # block refs. The column projection runs as block-parallel tasks so
        # the driver collects ONLY the slim order columns, never the full
        # admitted metadata a second time.
        order_tables = [t.select(order_cols) for t in admitted_tables]
        proj = ray.remote(lambda t: t.select(order_cols))
        order_refs = [proj.remote(r) for w in sorted(stamped_by_wave)
                      for r in stamped_by_wave[w]]
        order_tables.extend(ray.get(order_refs))
        crawl_order = (
            pa.concat_tables(order_tables).combine_chunks()
            if order_tables else pa.table({c: [] for c in order_cols})
        )
    else:
        # production shape: the crawl order is never assembled on the
        # driver — counts come from admission metadata; consumers write the
        # stamped blocks as partitioned parquet instead (checkpoint path)
        crawl_order = pa.table({c: [] for c in order_cols})
    lineage = frontier.lineage_table()
    elapsed = time.monotonic() - t0
    lrows = lineage.to_pylist() if lineage.num_rows else []
    urls_in = sum(r.get("urls_in") or 0 for r in lrows)
    dedup_hits = sum(r.get("dedup_hits") or 0 for r in lrows)
    metrics = {
        "frontier_urls": int(n_order_rows),
        "pages_fetched": pages_fetched,
        "elapsed_sec": elapsed,
        "urls_per_sec": n_order_rows / elapsed if elapsed > 0 else 0.0,
        "dedup_hits": dedup_hits,
        "dedup_hit_rate": dedup_hits / urls_in if urls_in else 0.0,
        "politeness_violations": sum(r.get("politeness_violations") or 0 for r in lrows),
        "politeness_deferred": sum(r.get("politeness_deferred") or 0 for r in lrows),
        "robots_blocked": sum(r.get("robots_blocked") or 0 for r in lrows),
        "seen_set_overflow": sum(r.get("seen_set_overflow") or 0 for r in lrows),
        "seen_set_reshards": sum(r.get("seen_set_reshards") or 0 for r in lrows),
        "setup_s": round(setup_s, 3),
        "dead_end_pages": int(dead_end_pages),
        "waves_run": len([w for w in wave_timings if isinstance(w, int)]),
        "wave_timings": wave_timings,
    }
    if last_term_wave is not None:
        # steady-state throughput: the deep-frontier regime (the terminal
        # wave holds the bulk of all pages on the EDGAR graph; BFS ramp-up
        # waves carry constant per-wave orchestration that amortizes at
        # production frontier depths)
        wt = wave_timings[last_term_wave]
        metrics["steady_pages_per_sec"] = round(
            wt["pages"] / wt["exec_s"], 2) if wt["exec_s"] > 0 else 0.0
    return CrawlResult(facts_ds, crawl_order, lineage, metrics)
