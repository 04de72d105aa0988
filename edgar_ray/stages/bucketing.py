"""Bucketed grouping: the scale pattern for high-cardinality groupbys.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per key — pure
Python overhead when keys are near-unique (one call per document pair, per
band bucket, per content hash...). At 100 TB that is billions of
sub-millisecond calls. Instead: hash the key into a small fixed bucket space
(2-4x total cores), shuffle by the int bucket, and let one vectorized call
per BUCKET segment its rows with numpy (lexsort + reduceat). Skew is bounded
by the hash; the bucket count is independent of data size, so the shuffle
fan-out stays constant as the corpus grows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# shared byte-popcount lookup (vectorized hamming distance / bitmask counts)
POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)


def hash_cols(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Vectorized uint64 hash of one or more key columns (int columns fold
    FNV-style; string/binary columns hash per-row via crc32)."""
    import zlib

    n = batch.num_rows
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    for c in key_cols:
        col = batch[c]
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            v = np.fromiter(
                (zlib.crc32(x if isinstance(x, bytes) else str(x).encode())
                 for x in col.to_pylist()),
                dtype=np.uint64, count=n,
            )
        h = (h * _FNV_PRIME) ^ v
        # extra avalanche so sequential ints spread across buckets
        h ^= h >> np.uint64(33)
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


def with_bucket(batch: pa.Table, key_cols: list[str], num_buckets: int,
                name: str = "_bucket") -> pa.Table:
    b = (hash_cols(batch, key_cols) % np.uint64(num_buckets)).astype(np.int32)
    return batch.append_column(name, pa.array(b, pa.int32()))


def segment_sort(*key_arrays: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Lexsort rows by the given key arrays; return (order, segment_starts)
    where segments are runs of equal keys in sorted order."""
    n = len(key_arrays[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort(tuple(reversed(key_arrays)))
    neq = np.zeros(n, dtype=bool)
    neq[0] = True
    for k in key_arrays:
        ks = k[order]
        neq[1:] |= ks[1:] != ks[:-1]
    return order, np.nonzero(neq)[0]


def _sort_key(col: pa.ChunkedArray, descending: bool) -> np.ndarray:
    """Turn a column into an int/float sort key usable by np.lexsort (strings
    factorize via np.unique; descending negates)."""
    if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
        v = col.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    elif pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
        v = col.to_numpy(zero_copy_only=False)
        if descending:
            v = v.astype(np.float64) if v.dtype.kind == "f" else v.astype(np.int64)
    else:
        _, inv = np.unique(np.asarray(col.to_pylist(), dtype=object),
                           return_inverse=True)
        v = inv.astype(np.int64)
    return -v if descending else v


def bucketed_group_head(ds, group_cols: list[str], sort_cols: list[str],
                        descending: list[bool], k: int,
                        num_buckets: int = 64):
    """Top-k rows per group: hash-bucket by the group key, then ONE vectorized
    pass per bucket (lexsort -> segment ranks -> mask) instead of a Python
    call per group. Returns the original columns."""
    def head_fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"]) if "_bucket" in t.column_names else t
        if t.num_rows == 0:
            return t
        gkeys = [_sort_key(t[c], False) for c in group_cols]
        skeys = [_sort_key(t[c], d) for c, d in zip(sort_cols, descending)]
        order = np.lexsort(tuple(reversed(gkeys + skeys)))
        n = len(order)
        neq = np.zeros(n, dtype=bool)
        neq[0] = True
        for gk in gkeys:
            gs = gk[order]
            neq[1:] |= gs[1:] != gs[:-1]
        seg_id = np.cumsum(neq) - 1
        starts = np.nonzero(neq)[0]
        rank = np.arange(n) - starts[seg_id]
        keep = order[rank < k]
        return t.take(pa.array(np.sort(keep), pa.int64()))

    return grouped_apply(ds, group_cols, head_fn, num_buckets)


def grouped_apply(ds, key_cols: list[str], bucket_fn, num_buckets: int = 64):
    """Hash-bucket rows by ``key_cols`` then call ``bucket_fn(table)`` once
    per bucket (vectorized inside). ``bucket_fn`` receives all rows of its
    bucket (with the ``_bucket`` helper column) and must drop it itself if
    undesired."""
    return (
        ds.map_batches(
            lambda t: with_bucket(t, key_cols, num_buckets),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(bucket_fn, batch_format="pyarrow")
    )


def size_partitions(*paths: str, target_bytes: int = 128 << 20,
                    min_parts: int = 8, max_parts: int = 1024) -> int:
    """Derive a Dataset.join partition count from on-disk input size
    (~one partition per 128 MB of input) instead of a hardcoded constant —
    8 partitions is fine at sf0.1 but starves a 100 TB join."""
    import os

    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return int(max(min_parts, min(max_parts, -(-total // target_bytes))))
