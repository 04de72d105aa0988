"""Deduplication pipelines over the ``documents`` table — the training-data
ops a 100 TB corpus needs (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), each expressed as Ray Data stages.

Scale shape: every variant reduces to (1) a vectorized per-batch signature
stage, (2) a hash-bucketed shuffle on the signature key (constant fan-out —
see stages/bucketing.py for why grouping by the raw near-unique key would be
one Python call per key), (3) vectorized per-bucket resolution (numpy
lexsort + reduceat segmentation; only colliding segments pay pairwise work).
Nothing materializes the corpus on the driver; candidate verification
happens inside the bucket groups.
"""

from __future__ import annotations

import hashlib
import logging
import os
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..stages.bucketing import grouped_apply, segment_sort

logger = logging.getLogger(__name__)

NUM_BUCKETS = 64

# Degenerate-signature guard: docs with an identical LSH key (boilerplate,
# near-empty pages) otherwise form one giant segment whose pairwise verify
# is O(m^2). Segments larger than this are truncated (pairs still found
# within the cap) and the truncation is LOGGED — no silent cap.
MAX_SEGMENT = 512


def _truncate_segments(starts: np.ndarray, sizes: np.ndarray, kind: str):
    """Yield (start, capped_size) for segments with >=2 members, capping
    oversized segments at MAX_SEGMENT with a log line."""
    big = sizes > MAX_SEGMENT
    if big.any():
        logger.warning(
            "dedup[%s]: %d oversized LSH segments truncated to %d members "
            "(largest=%d) — degenerate/boilerplate signatures",
            kind, int(big.sum()), MAX_SEGMENT, int(sizes.max()))
    sel = sizes >= 2
    return zip(starts[sel], np.minimum(sizes, MAX_SEGMENT)[sel])

# byte-popcount lookup for vectorized hamming distance (shared table)
from ..stages.bucketing import POP8 as _POP8  # noqa: E402


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns or ["doc_id", "text"])


_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _pair_table(out_a: list[int], out_b: list[int]) -> pa.Table:
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64())})


def _distinct_pairs(cand):
    """Distinct (id_a, id_b) pairs — bucketed + per-bucket np.unique."""

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts = segment_sort(a, b)
        keep = order[starts]
        return pa.table({"id_a": pa.array(a[keep]), "id_b": pa.array(b[keep])})

    return grouped_apply(cand, ["id_a", "id_b"], uniq, NUM_BUCKETS)


# ---------------------------------------------------------------------------
# Exact dedup: content hash -> bucketed hash-partition -> per-group min
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str):
    """Exact dedup (D2/D5 generalized): md5(text) groups, keep min doc_id.
    The md5 key matches DuckDB's ``md5()`` so the oracle can verify."""
    ds = _docs(sf_dir)

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(hs, pa.string())})

    def bucket_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, inv = np.unique(np.asarray(t["h"].to_pylist(), dtype=object),
                           return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.nonzero(np.r_[True, inv[order][1:] != inv[order][:-1]])[0]
        mins = np.minimum.reduceat(ids[order], starts)
        return pa.table({"doc_id": pa.array(mins, pa.int64())})

    return grouped_apply(
        ds.map_batches(add_hash, batch_format="pyarrow"), ["h"], bucket_min,
        NUM_BUCKETS,
    )


_CHUNK_STATS_SCHEMA = pa.schema([
    ("chunk_hash", pa.string()), ("n_occurrences", pa.int64()),
    ("n_docs", pa.int64()), ("first_doc", pa.int64()),
])


def _chunk_spans(data: np.ndarray, dstarts: np.ndarray, dends: np.ndarray,
                 chunk_words: int):
    """Byte spans of consecutive ``chunk_words``-word chunks for every doc
    in a concatenated UTF-8 buffer, splitting on single spaces (DuckDB
    ``string_split`` semantics: multi-space runs yield empty words, an
    empty doc yields one empty word). Returns (doc_index, span_start,
    span_end) arrays; the span's bytes equal ' '.join of the chunk's words
    because word k starts one past its preceding space. Property-tested
    against naive ``str.split(' ')`` chunking in tests/test_properties.py."""
    n = len(dstarts)
    sp = np.nonzero(data == 32)[0]  # space positions, doc-major order
    n_words = (np.searchsorted(sp, dends) - np.searchsorted(sp, dstarts)
               + 1)
    n_chunks = -(-n_words // chunk_words)
    total_words = int(n_words.sum())
    woff = np.r_[0, np.cumsum(n_words)]
    # word k of a doc starts at the doc start (k=0) or one past its
    # preceding space; ends at its following space or the doc end
    wstarts = np.empty(total_words, np.int64)
    wstarts[woff[:-1]] = dstarts
    interior = np.ones(total_words, bool)
    interior[woff[:-1]] = False
    wstarts[interior] = sp + 1
    wends = np.empty(total_words, np.int64)
    not_last = np.ones(total_words, bool)
    not_last[woff[1:] - 1] = False
    wends[not_last] = sp
    wends[woff[1:] - 1] = dends
    # chunk -> (first word, last word)
    total = int(n_chunks.sum())
    coff = np.r_[0, np.cumsum(n_chunks)]
    cdoc = np.repeat(np.arange(n), n_chunks)
    j = np.arange(total) - np.repeat(coff[:-1], n_chunks)
    first_w = woff[cdoc] + j * chunk_words
    last_w = np.minimum(first_w + chunk_words, woff[cdoc + 1]) - 1
    return cdoc, wstarts[first_w], wends[last_w]


def dedup_chunk(sf_dir: str, chunk_words: int = 16):
    """Sub-document exact dedup: split each doc on single spaces into
    consecutive ``chunk_words``-word chunks (tail chunk may be shorter) and
    report every chunk string occurring more than once corpus-wide — the
    paragraph-level dedup of CCNet/Dolma-style web curation, adapted to the
    single-line ``documents`` text. Chunk extraction is one vectorized pass
    over the batch's concatenated UTF-8 buffer (word boundaries = space
    positions, chunk bytes sliced straight out of the original buffer, no
    chunk-string materialization); md5 keys match DuckDB's ``md5()`` so the
    oracle twin verifies; one bucketed shuffle on the hash groups chunks.
    At 100 TB the key space is the md5 hash — uniform, unskewed buckets."""
    from .text import _utf8_buffers

    ds = _docs(sf_dir)

    def add_chunks(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.string())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        data, dstarts, dends = _utf8_buffers(t["text"])
        cdoc, a, b = _chunk_spans(data, dstarts, dends, chunk_words)
        mv = memoryview(data)
        hs = [hashlib.md5(mv[lo:hi]).hexdigest() for lo, hi in zip(a, b)]
        return pa.table({"doc_id": pa.array(ids[cdoc], pa.int64()),
                         "h": pa.array(hs, pa.string())})

    def bucket_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CHUNK_STATS_SCHEMA.empty_table()
        h = np.asarray(t["h"].to_pylist(), dtype=object)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv, cnt = np.unique(h, return_inverse=True,
                                   return_counts=True)
        order = np.lexsort((ids, inv))
        ids_s, inv_s = ids[order], inv[order]
        starts = np.r_[0, np.nonzero(inv_s[1:] != inv_s[:-1])[0] + 1]
        first_doc = ids_s[starts]  # ids ascending within each group
        new_pair = np.r_[True, (inv_s[1:] != inv_s[:-1])
                         | (ids_s[1:] != ids_s[:-1])]
        n_docs = np.add.reduceat(new_pair, starts)
        dup = cnt > 1
        return pa.table({
            "chunk_hash": pa.array(uniq[dup], pa.string()),
            "n_occurrences": pa.array(cnt[dup], pa.int64()),
            "n_docs": pa.array(n_docs[dup], pa.int64()),
            "first_doc": pa.array(first_doc[dup], pa.int64()),
        })

    return grouped_apply(
        ds.map_batches(add_chunks, batch_format="pyarrow"), ["h"],
        bucket_stats, NUM_BUCKETS,
    )


def dedup_incremental(sf_dir: str):
    """Incremental (delta) exact dedup — the production crawl shape: an
    INCOMING batch of documents is checked against an existing BASE corpus
    and each incoming doc reports the base doc it duplicates (or -1).
    Testdata stand-in: base = even doc_ids, incoming = odd doc_ids; in
    production the base side is the stored hash index (one slim
    (md5, min_doc) parquet per partition), read — not recomputed — so the
    cost per delta is O(delta + matching index buckets).

    Shape at 10^10 rows: both sides hash in the map stage and meet in ONE
    bucketed shuffle on the md5 key (uniform, unskewed); no broadcast of
    either side, no driver work. Output is one row per incoming doc
    (never empty), so the oracle compare always has schema-bearing rows."""
    ds = _docs(sf_dir)

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode()).hexdigest()
              for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "h": pa.array(hs, pa.string())})

    def bucket_join(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dup_of": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.asarray(t["h"].to_pylist(), dtype=object)
        uniq, inv = np.unique(h, return_inverse=True)
        is_base = ids % 2 == 0
        sent = np.iinfo(np.int64).max
        base_min = np.full(len(uniq), sent, dtype=np.int64)
        np.minimum.at(base_min, inv[is_base], ids[is_base])
        inc = ~is_base
        dup = base_min[inv[inc]]
        return pa.table({
            "doc_id": pa.array(ids[inc], pa.int64()),
            "dup_of": pa.array(np.where(dup == sent, -1, dup), pa.int64()),
        })

    return grouped_apply(ds.map_batches(add_hash, batch_format="pyarrow"),
                         ["h"], bucket_join, NUM_BUCKETS)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_C1, _C2, _C3 = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
                 np.uint64(0x165667B19E3779F9))
_CARR = np.array([_C1, _C2, _C3], dtype=np.uint64)

# polynomial word-hash base (odd -> invertible mod 2^64) and its inverse
_PB = np.uint64(0x100000001B3)
_PBINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))

from .text import _utf8_buffers  # noqa: E402  (shared zero-copy view)


def _mix64(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 finalizer, vectorized — avalanches the structured
    polynomial hashes over the full 64-bit space."""
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xC4CEB9FE1A85EC53)
    return h ^ (h >> np.uint64(33))


def _word_hash_batch(col, chunk_bytes: int = 1 << 20
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Per-word 64-bit hashes for a WHOLE batch in vectorized byte passes:
    returns (flat word hashes in document order, per-doc offsets, len n+1).

    Words = maximal runs of ASCII-lowercased ``[0-9a-z_]`` or non-ASCII
    bytes over the batch's concatenated UTF-8 buffer (zero-copy from Arrow;
    multi-byte letters group into runs like ``\\w`` — non-ASCII punctuation
    joins them, a documented byte-level approximation). Hash of word
    [s, e) = fmix64 of the prefix-polynomial difference
    ``(P[e] - P[s]) * B^-s`` — identical bytes give identical hashes, no
    per-word Python (the previous per-word blake2b loop dominated the
    MinHash stage). Processes the buffer in ~1 MB doc-aligned chunks so
    the 8-byte-per-input-byte prefix temporaries stay allocator-warm."""
    data, starts, ends = _utf8_buffers(col)
    n = len(starts)
    if n == 0 or len(data) == 0:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    hashes: list[np.ndarray] = []
    counts = np.zeros(n, dtype=np.int64)
    d0 = 0
    while d0 < n:
        d1 = int(np.searchsorted(ends, ends[d0] + chunk_bytes, side="left"))
        d1 = max(d1, d0 + 1)
        lo = starts[d0]
        sub = data[lo: ends[d1 - 1]]
        sub_starts = starts[d0:d1] - lo
        sub_ends = ends[d0:d1] - lo
        h, c = _word_hash_chunk(sub, sub_starts, sub_ends)
        hashes.append(h)
        counts[d0:d1] = c
        d0 = d1
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    return (np.concatenate(hashes) if hashes else np.empty(0, np.uint64),
            off)


def _word_hash_chunk(data: np.ndarray, starts: np.ndarray, ends: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    nbytes = len(data)
    lengths = ends - starts
    nonempty = lengths > 0
    lower = np.where((data >= 65) & (data <= 90), data + 32, data)
    w = (((lower >= 97) & (lower <= 122))
         | ((lower >= 48) & (lower <= 57))
         | (lower == 95) | (lower >= 128))
    ds_m = np.zeros(nbytes + 1, dtype=bool)
    ds_m[starts[nonempty]] = True
    dl_m = np.zeros(nbytes + 1, dtype=bool)
    dl_m[ends[nonempty] - 1] = True
    prev_w = np.r_[False, w[:-1]]
    next_w = np.r_[w[1:], False]
    rs = np.nonzero(w & (~prev_w | ds_m[:nbytes]))[0]
    re_ = np.nonzero(w & (~next_w | dl_m[:nbytes]))[0]
    counts = np.searchsorted(rs, ends) - np.searchsorted(rs, starts)
    if len(rs) == 0:
        return np.empty(0, np.uint64), counts
    pows = np.empty(nbytes, dtype=np.uint64)
    pows[0] = 1
    if nbytes > 1:
        np.cumprod(np.full(nbytes - 1, _PB, dtype=np.uint64),
                   out=pows[1:])
    ipows = np.empty(nbytes, dtype=np.uint64)
    ipows[0] = 1
    if nbytes > 1:
        np.cumprod(np.full(nbytes - 1, _PBINV, dtype=np.uint64),
                   out=ipows[1:])
    pref = np.zeros(nbytes + 1, dtype=np.uint64)
    np.cumsum(lower.astype(np.uint64) * pows, out=pref[1:])
    raw = (pref[re_ + 1] - pref[rs]) * ipows[rs]
    return _mix64(raw), counts


def _shingle_hash_batch(col, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k-word shingle hashes for a whole batch (position-weighted rolling
    combine of word hashes, so ABC != CBA), distinct-and-sorted per doc.
    Returns (flat shingles in doc order, per-doc offsets, len n+1).
    Docs with 0 < words < k emit ONE accumulated shingle (xor of
    position-weighted word hashes), matching the previous per-doc code."""
    hw, woff = _word_hash_batch(col)
    n = len(woff) - 1
    wn = np.diff(woff)
    total = len(hw)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), wn)
    # full k-shingles: positions whose k-th neighbor is still in-doc
    if total >= k:
        pos = np.arange(total - k + 1)
        same = doc_of[pos] == doc_of[pos + k - 1]
        pos = pos[same]
        sh = hw[pos] * _CARR[0]
        for j in range(1, k):
            sh = sh ^ (hw[pos + j] * _CARR[j % 3])
        sdoc = doc_of[pos]
    else:
        sh = np.empty(0, np.uint64)
        sdoc = np.empty(0, np.int64)
    # short docs (0 < wn < k): one xor-accumulated shingle each
    short = np.nonzero((wn > 0) & (wn < k))[0]
    if len(short):
        first = woff[short]
        acc = hw[first] * _CARR[0]
        for j in range(1, k - 1):
            m = wn[short] > j
            acc[m] = acc[m] ^ (hw[first[m] + j] * _CARR[j % 3])
        sh = np.concatenate([sh, acc])
        sdoc = np.concatenate([sdoc, short])
    if len(sh) == 0:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    # per-doc sort + dedupe (one global lexsort)
    order = np.lexsort((sh, sdoc))
    ss, dd = sh[order], sdoc[order]
    keep = np.r_[True, (dd[1:] != dd[:-1]) | (ss[1:] != ss[:-1])]
    flat, fdoc = ss[keep], dd[keep]
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(fdoc, minlength=n), out=off[1:])
    return flat, off


class MinHasher:
    """Stateful signature stage: the permutation parameters are built once per
    actor (__init__), applied vectorized per batch (__call__) — one batch
    shingle pass (_shingle_hash_batch), then (a*x+b) mod p over shingle
    CHUNKS with per-doc minimum.reduceat; no per-doc Python loop."""

    # shingles per matmul chunk: num_perm x CHUNK_SH x 8B stays ~32 MB
    CHUNK_SH = 65536

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.p = np.uint64((1 << 61) - 1)
        self.num_perm = num_perm

    def signatures(self, col) -> np.ndarray:
        """(n, num_perm) uint64 signature matrix; all-max sentinel for
        shingle-less docs."""
        flat, off = _shingle_hash_batch(col)
        n = len(off) - 1
        sigs = np.full((n, self.num_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        if len(flat) == 0:
            return sigs
        sn = np.diff(off)
        d0 = 0
        while d0 < n:
            # advance to keep each chunk's shingle span bounded (single
            # docs larger than the cap still go through whole)
            d1 = int(np.searchsorted(off, off[d0] + self.CHUNK_SH,
                                     side="left"))
            d1 = min(max(d1, d0 + 1), n)
            s0, s1 = off[d0], off[d1]
            if s1 > s0:
                vals = (flat[None, s0:s1] * self.a[:, None]
                        + self.b[:, None]) % self.p
                ne = np.nonzero(sn[d0:d1] > 0)[0] + d0  # docs with shingles
                starts = (off[ne] - s0).astype(np.int64)
                mins = np.minimum.reduceat(vals, starts, axis=1)
                sigs[ne] = mins.T
            d0 = d1
        return sigs

    def signature(self, text: str) -> np.ndarray:
        """Single-doc convenience (tests)."""
        return self.signatures(pa.array([text], pa.string()))[0]

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = self.signatures(t["text"])
        blob = sigs.tobytes()
        row = self.num_perm * 8
        return pa.table(
            {
                "doc_id": t["doc_id"],
                # fixed-width binary blob: ~10x cheaper to build/ship than a
                # list<uint64> of python ints
                "sig": pa.array([blob[i * row:(i + 1) * row]
                                 for i in range(t.num_rows)], pa.binary()),
            }
        )


def minhash_bands(t: pa.Table, bands: int = 16, rows: int = 4) -> pa.Table:
    """Explode signatures to (doc_id, band_id, band_hash, sig) rows —
    band hashes computed vectorized over the whole batch."""
    n = t.num_rows
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "band_id": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64()),
                         "sig": pa.array([], pa.binary())})
    sig_blobs = t["sig"].to_pylist()
    mat = np.frombuffer(b"".join(sig_blobs), dtype=np.uint64).reshape(n, bands, rows)
    bh = np.full((n, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    for r in range(rows):
        bh = (bh * np.uint64(0x100000001B3)) ^ mat[:, :, r]
    bh ^= np.uint64(np.arange(bands) * 0x9E3779B9)[None, :]  # salt by band id
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, bands)),
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array((bh.reshape(-1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)),
        "sig": pa.array([blob for blob in sig_blobs for _ in range(bands)], pa.binary()),
    })


from ..stages.cache import cached_instance as _cached  # noqa: E402


def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16):
    """MinHash+LSH near-dup pairs: shingle -> minhash + band explode (one
    fused map stage) -> bucketed groupby(band_id, band_hash) -> verified
    candidate pairs (estimated Jaccard = matching minhash fraction >=
    threshold). Returns unique (id_a, id_b).

    Non-ASCII feature note (applies to simhash/ngram-jaccard too): word
    features come from the byte-level ``_word_hash_batch`` tokenizer —
    non-ASCII bytes all count as word characters (so non-ASCII PUNCTUATION
    glues adjacent words into one feature) and only ASCII letters
    case-fold. On non-ASCII text this shifts which near-dups are recalled
    relative to a Unicode ``\\w+`` tokenizer; identical byte content always
    produces identical features, so planted-pair recall (including the
    non-ASCII planted test) pins the intended behavior."""
    rows = num_perm // bands
    ds = _docs(sf_dir)

    def sig_and_bands(t: pa.Table) -> pa.Table:
        sigs = _cached(MinHasher, num_perm=num_perm)(t)
        # Drop empty-shingle docs BEFORE banding: they all share the all-max
        # sentinel signature and would collide in every band (quadratic
        # blowup on a boilerplate-heavy corpus). Jaccard on empty sets is
        # undefined; exact dedup handles byte-identical empties.
        empty_sig = np.full(num_perm, np.iinfo(np.uint64).max,
                            dtype=np.uint64).tobytes()
        keep = pa.array([b != empty_sig for b in sigs["sig"].to_pylist()])
        sigs = sigs.filter(keep)
        return minhash_bands(sigs, bands=bands, rows=rows)

    banded = ds.map_batches(sig_and_bands, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        band_id = t["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        band_hash = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts = segment_sort(band_id, band_hash)
        sizes = np.diff(np.r_[starts, len(order)])
        out_a: list[int] = []
        out_b: list[int] = []
        blobs = t["sig"].to_pylist()
        for s, m in _truncate_segments(starts, sizes, "minhash"):
            seg = order[s:s + m]
            seg = seg[np.argsort(ids[seg], kind="stable")]
            sig_mat = np.frombuffer(
                b"".join(blobs[i] for i in seg), dtype=np.uint64
            ).reshape(m, -1)
            seg_ids = ids[seg]
            for i in range(m - 1):
                est = (sig_mat[i + 1:] == sig_mat[i]).mean(axis=1)
                for j in np.nonzero(est >= threshold)[0]:
                    out_a.append(int(seg_ids[i]))
                    out_b.append(int(seg_ids[i + 1 + j]))
        return _pair_table(out_a, out_b)

    cand = grouped_apply(banded, ["band_id", "band_hash"], bucket_pairs,
                         NUM_BUCKETS)
    return _distinct_pairs(cand)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word features; near-dups share the hash up to
    `hamming_max` bits. Buckets on 4x16-bit chunks so any pair within
    hamming distance 3 collides in >=1 chunk (pigeonhole).

    Batch kernel: one `_word_hash_batch` byte pass for the whole batch,
    then a (words, 64) unpackbits + per-doc `np.add.reduceat` — no per-doc
    Python. Word-chunked so the bit matrix stays ~32 MB."""

    CHUNK_WORDS = 1 << 19

    def simhashes(self, col) -> tuple[np.ndarray, np.ndarray]:
        """(uint64 simhash per doc, bool mask of docs with >=1 word)."""
        hw, off = _word_hash_batch(col)
        n = len(off) - 1
        wn = np.diff(off)
        out = np.zeros(n, dtype=np.uint64)
        ne = np.nonzero(wn > 0)[0]
        if len(ne) == 0:
            return out, wn > 0
        d0 = 0
        while d0 < len(ne):
            d1 = int(np.searchsorted(off[ne], off[ne[d0]] + self.CHUNK_WORDS,
                                     side="left"))
            d1 = max(d1, d0 + 1)
            docs = ne[d0:d1]
            w0, w1 = off[docs[0]], off[docs[-1] + 1]
            bits = np.unpackbits(
                hw[w0:w1].view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1)
            ones = np.add.reduceat(bits.astype(np.int64),
                                   (off[docs] - w0).astype(np.int64), axis=0)
            gt = ones * 2 > wn[docs][:, None]  # sign of (+1/-1) bit sum
            out[docs] = np.frombuffer(
                np.packbits(gt, axis=1).tobytes(), dtype=">u8"
            ).astype(np.uint64)
            d0 = d1
        return out, wn > 0

    def simhash(self, text: str) -> int:
        """Single-doc convenience (tests)."""
        return int(self.simhashes(pa.array([text], pa.string()))[0][0])

    def __call__(self, t: pa.Table) -> pa.Table:
        # featureless (empty/whitespace) docs are DROPPED here: they would
        # all share simhash 0 and collide in all 4 chunks — the degenerate
        # segment guard's primary source. Exact dedup covers identical
        # empties.
        hs, keep = self.simhashes(t["text"])
        out = pa.table({"doc_id": t["doc_id"],
                        "simhash": pa.array(
                            (hs - np.uint64(1 << 63)).view(np.int64),
                            pa.int64())})
        return out.filter(pa.array(keep))


def dedup_simhash(sf_dir: str, hamming_max: int = 3):
    """SimHash near-dup pairs via 16-bit chunk bucketing + in-bucket hamming
    verification (vectorized popcount). Word features are byte-level — see
    the non-ASCII note on :func:`dedup_minhash_lsh`."""
    ds = _docs(sf_dir)
    sigs = ds.map_batches(lambda t: _cached(SimHasher)(t), batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = sh.astype(np.uint64) + np.uint64(1 << 63)
        chunk_ids = np.tile(np.arange(4, dtype=np.int32), n)
        shifts = (np.uint64(16) * chunk_ids.astype(np.uint64))
        chunk_vals = ((np.repeat(u, 4) >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(np.repeat(ids, 4)),
                         "chunk_id": pa.array(chunk_ids),
                         "chunk_val": pa.array(chunk_vals),
                         "simhash": pa.array(np.repeat(sh, 4))})

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        cid = t["chunk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cval = t["chunk_val"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = (t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
              .astype(np.uint64) + np.uint64(1 << 63))
        order, starts = segment_sort(cid, cval)
        sizes = np.diff(np.r_[starts, len(order)])
        out_a: list[int] = []
        out_b: list[int] = []
        for s, m in _truncate_segments(starts, sizes, "simhash"):
            seg = order[s:s + m]
            seg = seg[np.argsort(ids[seg], kind="stable")]
            seg_ids, seg_hs = ids[seg], hs[seg]
            for i in range(m - 1):
                x = seg_hs[i + 1:] ^ seg_hs[i]
                dist = _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1)
                for j in np.nonzero(dist <= hamming_max)[0]:
                    out_a.append(int(seg_ids[i]))
                    out_b.append(int(seg_ids[i + 1 + j]))
        return _pair_table(out_a, out_b)

    cand = grouped_apply(sigs.map_batches(explode, batch_format="pyarrow"),
                         ["chunk_id", "chunk_val"], bucket_pairs, NUM_BUCKETS)
    return _distinct_pairs(cand)


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact verification flavor)
# ---------------------------------------------------------------------------


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.8, k: int = 3):
    """Exact n-gram Jaccard near-dup pairs. Candidate generation by smallest
    shingle (documents sharing their minimum shingle meet in one group), then
    exact Jaccard verify in-group. A one-permutation LSH: cheap, deterministic,
    recall-bounded; the MinHash variant is the production path. Word
    features are byte-level — see the non-ASCII note on
    :func:`dedup_minhash_lsh`."""
    ds = _docs(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        # one batch shingle pass; per-doc shingles are distinct AND sorted
        # ascending, so the min is the first element and the blob doubles
        # as the exact-verify set
        flat, off = _shingle_hash_batch(t["text"], k)
        n = t.num_rows
        sn = np.diff(off)
        keep = sn > 0  # shingle-less docs: Jaccard undefined
        keys = np.zeros(n, dtype=np.uint64)
        keys[keep] = flat[off[:-1][keep]]
        blob = flat.tobytes()
        shingle_sets = [blob[off[i] * 8: off[i + 1] * 8] for i in range(n)]
        return pa.table({"doc_id": t["doc_id"],
                         "min_shingle": pa.array(keys, pa.uint64()),
                         "shingles": pa.array(shingle_sets, pa.binary())}
                        ).filter(pa.array(keep))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        key = t["min_shingle"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = t["shingles"].to_pylist()
        order, starts = segment_sort(key)
        sizes = np.diff(np.r_[starts, len(order)])
        out_a: list[int] = []
        out_b: list[int] = []
        for s, m in _truncate_segments(starts, sizes, "ngram-jaccard"):
            seg = order[s:s + m]
            seg = seg[np.argsort(ids[seg], kind="stable")]
            sets = [set(np.frombuffer(blobs[i], dtype=np.uint64).tolist())
                    for i in seg]
            seg_ids = ids[seg]
            for i in range(m):
                for j in range(i + 1, m):
                    inter = len(sets[i] & sets[j])
                    union = len(sets[i] | sets[j])
                    if union and inter / union >= threshold:
                        out_a.append(int(seg_ids[i]))
                        out_b.append(int(seg_ids[j]))
        return _pair_table(out_a, out_b)

    return grouped_apply(ds.map_batches(add_key, batch_format="pyarrow"),
                         ["min_shingle"], bucket_pairs, NUM_BUCKETS)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def dedup_embedding_cosine(sf_dir: str, threshold: float = 0.4, limit_ids: int = 512):
    """Embedding near-dup pairs among vec_id < limit_ids: normalize per batch,
    then an all-pairs cosine against a broadcast slice (numpy matmul). The
    broadcast side is the capped candidate set; the streaming side stays a
    Dataset. This is the ORACLE TWIN (SQL-checkable by construction); the
    production/scale variant with no id cap is ``dedup_embedding_lsh``."""
    import ray

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    logger.warning(
        "dedup_embedding_cosine: candidate set CAPPED at vec_id < %d "
        "(oracle-twin variant; use dedup_embedding_lsh for the uncapped "
        "scale path)", limit_ids)
    path = os.path.join(sf_dir, "embeddings.parquet")
    # small side: predicate-pushdown read of only the capped candidate rows
    # (row-group pruning at the source), broadcast once via ray.put
    small = pq.read_table(path, columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", limit_ids)])
    ids = small["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(small["embedding"].to_pylist()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def pair_find(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # np.stack([]) raises; empty blocks after the cap filter must
            # pass through cleanly
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        b_ids, b_mat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        my_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        vecs = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        cos = vecs @ b_mat.T
        ii, jj = np.nonzero(cos >= threshold)
        a = my_ids[ii].astype(np.int64)
        b = b_ids[jj].astype(np.int64)
        keep = a < b
        return pa.table({"id_a": pa.array(a[keep]), "id_b": pa.array(b[keep])})

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def cap(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], pa.scalar(limit_ids)))

    return ds.map_batches(cap, batch_format="pyarrow").map_batches(
        pair_find, batch_format="pyarrow")


def dedup_embedding_lsh(sf_dir: str, threshold: float = 0.4, nbits: int = 8,
                        ntables: int = 8):
    """Scale-path embedding near-dup over the FULL embeddings table (no id
    cap): multi-table sign-LSH bucketing -> bucketed shuffle on
    (table_id, bucket) -> exact in-segment cosine verification (vectorized
    matmul) -> distinct pairs. Precision is exact (every emitted pair is
    cosine-verified); recall is bounded by the LSH tables — measured by the
    planted-near-dup test. Fan-out cost is ntables x float32 vector bytes
    through ONE bucket-keyed shuffle; no broadcast of the corpus, so it
    holds at 10^10 rows where the capped broadcast twin cannot."""
    from .similarity import _LshSig, _mat

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    # vector dim from the first row of the footer-pruned single-row read;
    # an empty embeddings table yields an empty pair set, not a crash
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(path)
    if pf.metadata.num_rows == 0:
        return rd.from_arrow(_PAIR_SCHEMA.empty_table())
    dim = len(next(pf.iter_batches(batch_size=1, columns=["embedding"]
                                   ))["embedding"][0])

    empty_explode = pa.table({
        "table_id": pa.array([], pa.int32()),
        "bucket": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "vec": pa.array([], pa.binary()),
    })

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_explode
        mat = _mat(t["embedding"])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
        buckets = _cached(_LshSig, dim=dim, nbits=nbits,
                          ntables=ntables).buckets_of(mat)  # (n, L)
        n, L = buckets.shape
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = [row.tobytes() for row in mat.astype(np.float32)]
        return pa.table({
            "table_id": pa.array(np.tile(np.arange(L, dtype=np.int32), n)),
            "bucket": pa.array(buckets.reshape(-1)),
            "vec_id": pa.array(np.repeat(ids, L)),
            "vec": pa.array([b for b in blobs for _ in range(L)], pa.binary()),
        })

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        tid = t["table_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = t["vec"].to_pylist()
        order, starts = segment_sort(tid, bkt)
        sizes = np.diff(np.r_[starts, len(order)])
        out_a: list[int] = []
        out_b: list[int] = []
        for s, m in _truncate_segments(starts, sizes, "embedding-lsh"):
            seg = order[s:s + m]
            seg = seg[np.argsort(ids[seg], kind="stable")]
            vmat = np.frombuffer(b"".join(blobs[i] for i in seg),
                                 dtype=np.float32).reshape(m, dim)
            cos = vmat @ vmat.T
            ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
            seg_ids = ids[seg]
            a, b = seg_ids[ii], seg_ids[jj]
            ne = a != b  # the same vec_id can meet itself across duplicates
            out_a.extend(np.minimum(a[ne], b[ne]).tolist())
            out_b.extend(np.maximum(a[ne], b[ne]).tolist())
        return _pair_table(out_a, out_b)

    cand = grouped_apply(ds.map_batches(explode, batch_format="pyarrow"),
                         ["table_id", "bucket"], bucket_pairs, NUM_BUCKETS)
    return _distinct_pairs(cand)


# ---------------------------------------------------------------------------
# Near-dup clusters: distributed connected components (label propagation)
# ---------------------------------------------------------------------------


def dedup_connected_components(sf_dir: str, max_iters: int = 10,
                               pair_fn=None):
    """Cluster near-duplicate pairs into components via ITERATIVE min-label
    propagation expressed in Dataset ops: each round hash-joins the
    (symmetric) edge list against current labels, takes the per-node min of
    (own label, neighbor labels), and stops when the monotone label sum
    stops decreasing (labels only ever decrease, so the sum is a convergence
    certificate without a change-join). Returns (doc_id, cluster_id) where
    cluster_id = min doc_id of the component.

    Near-dup clusters are shallow (cliques through shared bands), so this
    converges in 1-3 rounds; the per-round cost is one hash-partitioned join
    + one aggregate — the standard large-graph CC shape."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    # default edge source: MinHash near-dup pairs; pass
    # pair_fn=dedup_embedding_cosine for the SQL-checkable edge set (that
    # variant is oracle-verified against a DuckDB recursive-CTE closure)
    pairs = (pair_fn or dedup_minhash_lsh)(sf_dir)

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.r_[a, b], pa.int64()),
            "peer": pa.array(np.r_[b, a], pa.int64()),
        })

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "label": pa.array([], pa.int64())}))
    # size-derived join fan-out: edges is materialized so count() is free
    # metadata (~2M edge rows per partition, floor 8)
    cc_parts = max(8, min(1024, edges.count() // 2_000_000))
    labels = edges.groupby("node").aggregate(Min("peer", alias_name="nbr_min"))

    def init_label(t: pa.Table) -> pa.Table:
        lab = np.minimum(t["node"].to_numpy(zero_copy_only=False),
                         t["nbr_min"].to_numpy(zero_copy_only=False))
        return pa.table({"node": t["node"], "label": pa.array(lab, pa.int64())})

    labels = labels.map_batches(init_label, batch_format="pyarrow").materialize()

    def total(ds) -> int:
        return ds.aggregate(Sum("label"))["sum(label)"]

    prev = total(labels)
    for _ in range(max_iters):
        prop = edges.join(labels, join_type="inner", on=("node",),
                          num_partitions=cc_parts)

        def peer_label(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["peer"], "label": t["label"]})

        cand = labels.union(
            prop.map_batches(peer_label, batch_format="pyarrow"))
        labels = cand.groupby("node").aggregate(
            Min("label", alias_name="label")).materialize()
        cur = total(labels)
        if cur == prev:
            break
        prev = cur
    return labels
