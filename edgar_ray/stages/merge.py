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

from ..functions.report import new_financial_report, validate_financial_report
from ..schema import (
    DOC_MERGE_PRIORITY,
    FACT_FIELDS,
    FILINGS_FACTS_SCHEMA,
    fact_col,
)

_KEY_COLS = ("ticker", "cik", "accession", "filing_type", "filed_date")
_STRUCTS = ("entity", "ops", "bs", "cf")
_FACT_COLS = [fact_col(f) for f in FACT_FIELDS]


def _add_bucket(num_buckets: int):
    def add(batch: pa.Table) -> pa.Table:
        b = np.fromiter(
            (zlib.crc32(a.encode()) % num_buckets
             for a in batch["accession"].to_pylist()),
            dtype=np.int32, count=batch.num_rows,
        )
        return batch.append_column("merge_bucket", pa.array(b, pa.int32()))

    return add


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
    order = np.lexsort((repnum, prio, inv))
    inv_s = inv[order]
    starts = np.nonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])[0]
    g = len(uniq)

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

    # generation + validation per merged filing (mutates values/bits in place)
    ft_list = out["filing_type"].to_pylist()
    errs: list[str] = []
    for i in range(g):
        fr = new_financial_report(ft_list[i])
        for f, c in zip(FACT_FIELDS, _FACT_COLS):
            fr[f.struct][f.name] = float(merged_vals[c][i])
        for s in _STRUCTS:
            fr[s]["CollectedData"] = int(bits[s][i])
        errs.append(validate_financial_report(fr))
        for f, c in zip(FACT_FIELDS, _FACT_COLS):
            merged_vals[c][i] = fr[f.struct][f.name]
        for s in _STRUCTS:
            bits[s][i] = fr[s]["CollectedData"]

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
    hash-bucket of accession)."""
    return (
        facts_raw_ds.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
        .groupby("merge_bucket")
        .map_groups(merge_bucket_group, batch_format="pyarrow")
    )


FILINGS_FACTS_COLUMNS = [f.name for f in FILINGS_FACTS_SCHEMA]
