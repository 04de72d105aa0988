"""The merge shuffle: bucketed ``groupby().map_groups`` with a vectorized
cross-doc combine.

Replaces the reference's unsynchronized concurrent merge (goroutine per doc
page writing one shared struct, /root/reference/parser.go:373-388) with a
deterministic distributed reduce. The per-document half (tokenize, scale,
normalize, within-doc first-write-wins) already ran in the extract map stage
(stages/extract.py), so each row here carries 27 parsed fact values + 4
presence bitmasks, and the cross-doc merge is a tiny combine:

- value   = first NONZERO value in (DOC_MERGE_PRIORITY, report_num) order
- bitmask = OR across documents

This is exactly equivalent to the reference's shared-struct replay
(/root/reference/data_def.go:185-248): ``setData`` only writes when the
current value is 0, so the first doc (in order) producing a nonzero value
wins; an explicit 0.0 sets the presence bit but leaves the slot writable,
which the OR + first-nonzero combine reproduces. Duplicate doc_types cannot
reach this stage (the filing-index parse dedups them first-wins, D3
/root/reference/reportmap.go:139).

Scale design: grouping directly by accession would invoke the group fn once
per filing (billions of sub-millisecond calls at 10^10-URL scale — pure
overhead). Instead accessions are hash-bucketed (``crc32(accession) %
num_buckets``) and the shuffle groups by the small-int bucket key; each
bucket task merges ALL of its accessions in one vectorized pass
(np.lexsort + np.minimum.reduceat / np.bitwise_or.reduceat). Bucket count
scales with the cluster (2-4x total cores), skew is bounded by the hash.
Derived-field generation + validation (/root/reference/data_def.go:95-183)
runs per merged filing after the combine.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions.report import validate_reports_batch
from ..schema import (
    DOC_MERGE_PRIORITY,
    FACT_FIELDS,
    FILINGS_FACTS_SCHEMA,
    fact_col,
)

_KEY_COLS = ("ticker", "cik", "accession", "filing_type", "filed_date")
_STRUCTS = ("entity", "ops", "bs", "cf")
_FACT_COLS = [fact_col(f) for f in FACT_FIELDS]
# per-fact order-key columns carried by PARTIAL rows: the (doc priority,
# report_num, page url crc) rank of the batch-local first-nonzero winner,
# encoded as one int64 (prio << 55 | repnum << 23 | crc23 — total order,
# min = winner); the sentinel means "no nonzero value seen in this
# partial". The 23-bit url-crc tail makes ties at (prio, repnum) —
# duplicate pages of one accession from a replayed fetch or double-written
# checkpoint — resolve deterministically instead of by partial arrival
# order; only a 23-bit crc collision between two DIFFERENT duplicate pages
# falls back to arrival order. Max key = 99<<55 + (2^31-1)<<23 + 2^23-1
# < 2^62, so the sentinel still sorts last.
_ORD_COLS = [f"ord__{c}" for c in _FACT_COLS]
_ORD_SENT = np.int64(1) << np.int64(62)


def _page_ordkey(t: pa.Table, prio: np.ndarray,
                 repnum: np.ndarray) -> np.ndarray:
    """int64 merge order key (prio << 55 | repnum << 23 | page_crc). The
    ``page_crc`` column is optional (synthetic merge inputs in tests omit
    it): absent -> 0, the legacy (prio, repnum)-only order."""
    if "page_crc" in t.column_names:
        pcrc = t["page_crc"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        pcrc = np.zeros(len(prio), np.int64)
    rep = np.minimum(repnum, np.int64((1 << 31) - 1))
    return (prio << np.int64(55)) | (rep << np.int64(23)) | pcrc


def _add_bucket(num_buckets: int):
    def add(batch: pa.Table) -> pa.Table:
        b = np.fromiter(
            (zlib.crc32(a.encode()) % num_buckets
             for a in batch["accession"].to_pylist()),
            dtype=np.int32, count=batch.num_rows,
        )
        return batch.append_column("merge_bucket", pa.array(b, pa.int32()))

    return add


def partial_merge_batch(num_buckets: int, count_pages: bool = False):
    """Combiner BEFORE the merge shuffle: collapse each batch's rows per
    accession into one partial row (first-nonzero value + its order key per
    fact, OR'd presence bits). Page rows of one filing are usually
    co-batched (the fetch preserves frontier locality), so the shuffle
    ships ~1 row per accession instead of ~1 per page — the all-to-all
    moves a fraction of the bytes and the final merge reduces partials.
    Associative and exact: the final reduce picks the global min order key
    per fact, identical to sorting all pages (see merge_bucket_group's
    equivalence note).

    ``count_pages=True`` adds a ``pages_in_partial`` column (source rows
    collapsed into each partial) so a caller that fuses this combiner into
    the extract map can still account fetched pages with a cheap column sum
    over the partials instead of materializing one row per page."""

    def combine(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty_partial(count_pages)
        acc = np.asarray(t["accession"].to_pylist(), dtype=object)
        uniq, inv = np.unique(acc, return_inverse=True)
        prio = np.fromiter(
            (DOC_MERGE_PRIORITY.get(d, 99)
             for d in t["doc_type"].to_pylist()),
            dtype=np.int64, count=n,
        )
        repnum = t["report_num"].to_numpy(zero_copy_only=False).astype(np.int64)
        ordkey = _page_ordkey(t, prio, repnum)
        order = np.lexsort((ordkey, inv))
        inv_s, key_s = inv[order], ordkey[order]
        starts = np.nonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])[0]
        g = len(uniq)
        idx = np.arange(n)
        out: dict[str, object] = {}
        first_rows = pa.array(order[starts], pa.int64())
        for c in _KEY_COLS:
            out[c] = t[c].take(first_rows)
        for c, oc in zip(_FACT_COLS, _ORD_COLS):
            v = t[c].to_numpy(zero_copy_only=False)[order]
            pos = np.where(v != 0, idx, n)
            first = np.minimum.reduceat(pos, starts)
            hit = first < n
            safe = np.minimum(first, n - 1)
            out[c] = pa.array(np.where(hit, v[safe], 0.0), pa.float64())
            out[oc] = pa.array(np.where(hit, key_s[safe], _ORD_SENT),
                               pa.int64())
        for s in _STRUCTS:
            b = t[f"collected_{s}"].to_numpy(
                zero_copy_only=False).astype(np.uint64)[order]
            out[f"collected_{s}"] = pa.array(
                np.bitwise_or.reduceat(b, starts).astype(np.int64),
                pa.int64())
        bucket = np.fromiter(
            (zlib.crc32(a.encode()) % num_buckets for a in uniq),
            dtype=np.int32, count=g,
        )
        out["merge_bucket"] = pa.array(bucket, pa.int32())
        if count_pages:
            out["pages_in_partial"] = pa.array(
                np.bincount(inv, minlength=g).astype(np.int64), pa.int64())
        return pa.table(out)

    return combine


def _empty_partial(count_pages: bool = False) -> pa.Table:
    cols: dict[str, pa.Array] = {c: pa.array([], pa.string())
                                 for c in _KEY_COLS}
    for c, oc in zip(_FACT_COLS, _ORD_COLS):
        cols[c] = pa.array([], pa.float64())
        cols[oc] = pa.array([], pa.int64())
    for s in _STRUCTS:
        cols[f"collected_{s}"] = pa.array([], pa.int64())
    cols["merge_bucket"] = pa.array([], pa.int32())
    if count_pages:
        cols["pages_in_partial"] = pa.array([], pa.int64())
    return pa.table(cols)


def merge_partial_group(group: pa.Table) -> pa.Table:
    """Final reduce over PARTIAL rows of one hash bucket: per accession and
    fact, the value whose order key is the global minimum (ties impossible —
    (prio, repnum) is unique within an accession); presence bits OR. Then
    the same generation + validation as merge_bucket_group."""
    n = group.num_rows
    if n == 0:
        return _empty_wide()
    acc = np.asarray(group["accession"].to_pylist(), dtype=object)
    uniq, inv = np.unique(acc, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    inv_s = inv[order]
    starts = np.nonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])[0]
    seg_id = np.cumsum(np.r_[True, inv_s[1:] != inv_s[:-1]]) - 1
    idx = np.arange(n)

    merged_vals: dict[str, np.ndarray] = {}
    for c, oc in zip(_FACT_COLS, _ORD_COLS):
        v = group[c].to_numpy(zero_copy_only=False)[order]
        k = group[oc].to_numpy(zero_copy_only=False)[order]
        kmin = np.minimum.reduceat(k, starts)
        # first position holding the min key within each segment
        pos = np.where(k == kmin[seg_id], idx, n)
        first = np.minimum.reduceat(pos, starts)
        hit = kmin < _ORD_SENT
        merged_vals[c] = np.where(hit, v[np.minimum(first, n - 1)], 0.0)
    bits: dict[str, np.ndarray] = {}
    for s in _STRUCTS:
        b = group[f"collected_{s}"].to_numpy(
            zero_copy_only=False).astype(np.uint64)[order]
        bits[s] = np.bitwise_or.reduceat(b, starts)

    key_idx = pa.array(order[starts], pa.int64())
    out: dict[str, object] = {c: group[c].take(key_idx) for c in _KEY_COLS}

    # generation + validation, vectorized across the bucket's filings
    # (validate_reports_batch is the parity-tested columnar twin of the
    # per-report validate_financial_report loop)
    errs = validate_reports_batch(merged_vals, bits)

    for c in _FACT_COLS:
        out[c] = pa.array(merged_vals[c], pa.float64())
    for s in _STRUCTS:
        out[f"collected_{s}"] = pa.array(bits[s].astype(np.int64), pa.int64())
    out["validation_error"] = pa.array(errs, pa.string())
    return pa.table(out)


def merge_bucket_group(group: pa.Table) -> pa.Table:
    """One group = one hash bucket of accessions (all their per-doc parsed
    rows). Emits one wide filings_facts row per accession, vectorized."""
    n = group.num_rows
    if n == 0:
        return _empty_wide()
    acc = np.asarray(group["accession"].to_pylist(), dtype=object)
    uniq, inv = np.unique(acc, return_inverse=True)
    prio = np.fromiter(
        (DOC_MERGE_PRIORITY.get(d, 99) for d in group["doc_type"].to_pylist()),
        dtype=np.int64, count=n,
    )
    repnum = group["report_num"].to_numpy(zero_copy_only=False).astype(np.int64)
    # same total order as the partial path's _page_ordkey (url-crc tail
    # resolves duplicate-page ties deterministically)
    order = np.lexsort((_page_ordkey(group, prio, repnum), inv))
    inv_s = inv[order]
    starts = np.nonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])[0]

    merged_vals: dict[str, np.ndarray] = {}
    idx = np.arange(n)
    for c in _FACT_COLS:
        v = group[c].to_numpy(zero_copy_only=False)[order]
        pos = np.where(v != 0, idx, n)
        first = np.minimum.reduceat(pos, starts)
        merged_vals[c] = np.where(first < n, v[np.minimum(first, n - 1)], 0.0)
    bits: dict[str, np.ndarray] = {}
    for s in _STRUCTS:
        b = group[f"collected_{s}"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
        bits[s] = np.bitwise_or.reduceat(b, starts)

    key_idx = pa.array(order[starts], pa.int64())
    out: dict[str, object] = {c: group[c].take(key_idx) for c in _KEY_COLS}

    # generation + validation, vectorized across the bucket's filings
    errs = validate_reports_batch(merged_vals, bits)

    for c in _FACT_COLS:
        out[c] = pa.array(merged_vals[c], pa.float64())
    for s in _STRUCTS:
        out[f"collected_{s}"] = pa.array(bits[s].astype(np.int64), pa.int64())
    out["validation_error"] = pa.array(errs, pa.string())
    return pa.table(out)


def _empty_wide() -> pa.Table:
    cols: dict[str, pa.Array] = {c: pa.array([], pa.string()) for c in _KEY_COLS}
    for c in _FACT_COLS:
        cols[c] = pa.array([], pa.float64())
    for s in _STRUCTS:
        cols[f"collected_{s}"] = pa.array([], pa.int64())
    cols["validation_error"] = pa.array([], pa.string())
    return pa.table(cols)


def merge_facts(facts_raw_ds, num_buckets: int = 64):
    """facts_raw Dataset -> filings_facts Dataset (shuffle #1, key =
    hash-bucket of accession). The partial combiner runs map-side, so the
    all-to-all ships ~1 partial row per (batch, accession) instead of one
    row per page. Input may be per-page rows OR already-combined partials
    (a caller that fused ``partial_merge_batch`` into its extract plan —
    detected by the ``ord__*`` order-key columns); partials skip straight
    to the shuffle."""
    names = facts_raw_ds.schema().names
    if any(n.startswith("ord__") for n in names):
        partials = facts_raw_ds
        if "pages_in_partial" in names:
            partials = partials.drop_columns(["pages_in_partial"])
    else:
        partials = facts_raw_ds.map_batches(partial_merge_batch(num_buckets),
                                            batch_format="pyarrow")
    return (
        partials.groupby("merge_bucket")
        .map_groups(merge_partial_group, batch_format="pyarrow")
    )


FILINGS_FACTS_COLUMNS = [f.name for f in FILINGS_FACTS_SCHEMA]
