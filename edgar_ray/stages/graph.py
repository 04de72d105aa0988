"""Data-driven crawl graph spec: the page-class map that drives the
frontier-emptiness wave loop in :mod:`..pipelines.crawl`.

The reference walks a FIXED 3-level page graph (query -> filing index ->
R-report, /root/reference/page.go:42-73). A general crawl (the north rule's
frontier over an unbounded link graph) has no fixed depth: each fetched page
is CLASSIFIED by its URL, link-expanding classes run a parser that emits the
next frontier candidates, and terminal classes run an extractor whose rows
feed the facts reduce. :class:`CrawlGraph` captures exactly that map, so the
wave loop is ``while frontier-not-empty`` with per-class dispatch instead of
``for wave in range(3)`` with per-wave constants.

Contracts:

- ``classify(url) -> str`` must be derivable from the URL alone (it runs at
  candidate-emission time inside the distributed parse stages, and the
  admitted metadata carries the class so the driver never re-classifies).
- ``parsers[cls](batch) -> pa.Table`` takes fetched page rows (url, html +
  frontier metadata) of one expand class and returns frontier-candidate
  rows in the FIXED frontier schema (stages/extract.FRONTIER_COLS). The
  frontier's priority comparator ``(seed_rank, filing_type, filed_date
  desc, report_num, url)`` is part of that schema: a graph maps its own
  ordering into those slots (EDGAR uses them literally; a generic web graph
  can use seed_rank = site rank, report_num = page ordinal, constants
  elsewhere).
- ``extractor(batch) -> pa.Table`` takes fetched terminal-class page rows
  and returns per-page fact rows; it must tolerate an empty batch (the
  wave loop probes it once to learn the facts schema).
- ``partial_factory(num_buckets)`` returns the map-side combiner fused
  after the extractor (associative; output must carry ``pages_in_partial``
  for fetch accounting and the ``partition_col`` column for the resumable
  sink). ``reduce_factory(num_buckets)`` returns the final
  ``Dataset -> Dataset`` reduce applied once, after the loop, over the
  union of all terminal waves' partials.
- A fetched page whose class has no parser and is not terminal is a dead
  end: its links are not followed and it produces no facts (counted in
  crawl metrics as ``dead_end_pages``).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass

import pyarrow as pa

# outbox row tags (mixed terminal+expand waves share one map output)
KIND_CANDIDATE = 0
KIND_FACTS = 1


@dataclass(frozen=True)
class CrawlGraph:
    """The page-class map driving the general wave loop."""

    classify: Callable[[str], str]
    parsers: Mapping[str, Callable[[pa.Table], pa.Table]]
    terminal: frozenset
    extractor: Callable[[pa.Table], pa.Table]
    partial_factory: Callable[[int], Callable[[pa.Table], pa.Table]]
    reduce_factory: Callable[[int], Callable]
    partition_col: str = "ticker"


def edgar_graph() -> CrawlGraph:
    """The reference's 3-level graph (query -> index -> report,
    /root/reference/page.go:13,55,58) expressed as a class map; under the
    general loop it still crawls exactly 3 waves because report pages are
    terminal and emit no candidates — the frontier empties by itself."""
    from ..stages.extract import (
        CLASS_INDEX,
        CLASS_QUERY,
        CLASS_REPORT,
        classify_url,
        extract_facts,
        parse_index_pages,
        parse_query_pages,
    )
    from ..stages.merge import merge_facts, partial_merge_batch

    return CrawlGraph(
        classify=classify_url,
        parsers={CLASS_QUERY: parse_query_pages,
                 CLASS_INDEX: parse_index_pages},
        terminal=frozenset({CLASS_REPORT}),
        extractor=extract_facts,
        partial_factory=lambda nb: partial_merge_batch(nb, count_pages=True),
        reduce_factory=lambda nb: (
            lambda ds: merge_facts(ds, num_buckets=nb)),
        partition_col="ticker",
    )


def with_page_class(tbl: pa.Table, classify: Callable[[str], str]) -> pa.Table:
    """Append the page_class column (idempotent). Runs inside the
    distributed parse stages (or on driver-built seed tables, which are
    tiny), so admission/fetch never classify serially at wave scale."""
    if "page_class" in tbl.column_names:
        return tbl
    cls = [classify(u) for u in tbl["url"].to_pylist()]
    return tbl.append_column("page_class", pa.array(cls, pa.string()))


def empty_pages_batch() -> pa.Table:
    """An empty fetched-pages batch (url, html + frontier metadata) used to
    probe a graph's extractor/partial output schema once per crawl."""
    cols: dict[str, pa.Array] = {
        "url": pa.array([], pa.string()),
        "html": pa.array([], pa.binary()),
    }
    for c in ("ticker", "cik", "filing_type", "filed_date", "accession",
              "doc_type", "page_class"):
        cols[c] = pa.array([], pa.string())
    for c in ("report_num", "seed_rank"):
        cols[c] = pa.array([], pa.int32())
    return pa.table(cols)


def make_dispatch(graph: CrawlGraph, partial_fn, robots_gate=None,
                  mode: str = "mixed", union_fields=None):
    """Build the per-batch dispatch for one wave: classify rows by the
    page_class metadata column, run each expand class's parser (+ the
    distributed robots gate) and the terminal extractor + partial combiner,
    and emit one table.

    ``mode`` is decided per wave from the admitted class counts:
    - ``"cand"``  — pure-expand wave: output is the candidate schema only
      (no padding; the outbox IS the next frontier), exactly the legacy
      parse stage;
    - ``"facts"`` — pure-terminal wave: output is the facts-partial schema
      only, exactly the legacy extract+combine stage;
    - ``"mixed"`` — both kinds present: every batch pads to the fixed
      ``union_fields`` schema with a ``_kind`` tag column, and the caller
      splits with :func:`take_kind` after the wave materializes.
    """
    import numpy as np

    def run_class(sub: pa.Table, cls: str) -> tuple[pa.Table, int] | None:
        if cls in graph.terminal:
            return partial_fn(graph.extractor(sub)), KIND_FACTS
        parser = graph.parsers.get(cls)
        if parser is None:
            return None  # dead end: no links, no facts
        cand = with_page_class(parser(sub), graph.classify)
        if robots_gate is not None:
            cand = robots_gate(cand)
        return cand, KIND_CANDIDATE

    def pad(t: pa.Table, kind: int) -> pa.Table:
        n = t.num_rows
        cols = []
        for name, typ in union_fields:
            if name == "_kind":
                cols.append(pa.array(np.full(n, kind, np.int8), pa.int8()))
            elif name in t.column_names:
                c = t[name]
                cols.append(c.cast(typ) if c.type != typ else c)
            else:
                cols.append(pa.nulls(n, typ))
        return pa.table(dict(zip([f[0] for f in union_fields], cols)))

    def dispatch(batch: pa.Table) -> pa.Table:
        classes = batch["page_class"].to_pylist()
        arr = np.asarray(classes, dtype=object)
        outs: list[tuple[pa.Table, int]] = []
        for cls in sorted(set(classes)):
            idx = np.nonzero(arr == cls)[0]
            sub = batch if len(idx) == batch.num_rows else batch.take(
                pa.array(idx, pa.int64()))
            res = run_class(sub, cls)
            if res is not None:
                outs.append(res)
        if mode == "mixed":
            if not outs:  # batch of dead-end rows only: schema-stable empty
                return pad(batch.slice(0, 0), KIND_CANDIDATE)
            padded = [pad(t, k) for t, k in outs]
            return (pa.concat_tables(padded) if len(padded) > 1
                    else padded[0])
        want = KIND_FACTS if mode == "facts" else KIND_CANDIDATE
        keep = [t for t, k in outs if k == want]
        if keep:
            return (pa.concat_tables(keep, promote_options="default")
                    if len(keep) > 1 else keep[0])
        # schema-stable empty: run the pipeline on an empty slice
        if mode == "facts":
            return partial_fn(graph.extractor(batch.slice(0, 0)))
        cand = with_page_class(
            next(iter(graph.parsers.values()))(batch.slice(0, 0)),
            graph.classify)
        return robots_gate(cand) if robots_gate is not None else cand

    return dispatch


def take_kind(kind: int, cols: list[str]):
    """Zero-copy split of a mixed-wave outbox: filter by the ``_kind`` tag
    and project that kind's columns (the other kind's slots are null)."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["_kind"], kind)).select(cols)

    return f
