"""Dataset curation operators a training-data pipeline needs around dedup:
deterministic train/test splitting, stratified sampling, length profiling
and cross-source exact contamination — each a streaming map / bucketed
reduce with an exact DuckDB oracle.

Hash parity contract: ``_md5_low64(s)`` equals DuckDB's
``md5_number_lower(s)`` (little-endian low 8 digest bytes), so the split /
sample predicates are bit-identical between the Ray path and the SQL
oracle — the property that makes a REPRODUCIBLE split: membership depends
only on the key, never on partitioning, ordering or cluster size.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.bucketing import grouped_apply, segment_sort

NUM_BUCKETS = 64


def _docs(sf_dir: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def _hash_map(t: pa.Table) -> pa.Table:
    """Shared map stage: (content_hash = md5 of the utf-8 text, source).
    ONE definition so every curation operator keys on the same content-hash
    semantics (and stays in sync with the DuckDB md5() oracles)."""
    hs = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
    return pa.table({"content_hash": pa.array(hs, pa.string()),
                     "source": t["source"]})


def _hash_source_segments(t: pa.Table):
    """Factorize + sort one bucket's (content_hash, source) rows; returns
    (h, s, hc, sc, order, hstarts, hends, n_src_per_hash) — the shared
    segment arithmetic for contamination/dedup-rate kernels."""
    h = np.asarray(t["content_hash"].to_pylist(), dtype=object)
    s = np.asarray(t["source"].to_pylist(), dtype=object)
    _, hc = np.unique(h, return_inverse=True)
    _, sc = np.unique(s, return_inverse=True)
    order = np.lexsort((sc, hc))
    hs_sorted, sc_sorted = hc[order], sc[order]
    hash_start = np.r_[True, hs_sorted[1:] != hs_sorted[:-1]]
    pair_start = np.r_[True, (hs_sorted[1:] != hs_sorted[:-1])
                       | (sc_sorted[1:] != sc_sorted[:-1])]
    hstarts = np.nonzero(hash_start)[0]
    hends = np.r_[hstarts[1:], len(order)]
    cps = np.cumsum(pair_start)
    n_src = cps[hends - 1] - np.r_[0, cps[hstarts[1:] - 1]]
    return h, s, hc, sc, order, hstarts, hends, n_src


def _md5_low64(values) -> np.ndarray:
    """uint64 per value: little-endian low 8 bytes of md5(str(v)) —
    DuckDB ``md5_number_lower`` parity."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16],
                        "little") for v in values),
        dtype=np.uint64, count=len(values))


def train_test_split(sf_dir: str, test_pct: int = 10):
    """Deterministic hash split: doc -> 'test' iff
    md5_low64(doc_id) % 100 < test_pct, else 'train'. Stable under any
    re-partitioning / re-run — the reproducibility property a training
    pipeline needs from its split."""
    def tag(t: pa.Table) -> pa.Table:
        h = _md5_low64(t["doc_id"].to_pylist()) % np.uint64(100)
        split = np.where(h < test_pct, "test", "train")
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "split": pa.array(split.tolist(), pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        tag, batch_format="pyarrow")


def sample_stratified(sf_dir: str, mod: int = 10):
    """Per-source deterministic sampling accounting: n_total and n_sampled
    (docs whose md5_low64(doc_id) % mod == 0) per source. The sample is a
    fixed ~1/mod rate in every stratum without a shuffle or an RNG."""
    def partial(t: pa.Table) -> pa.Table:
        h = _md5_low64(t["doc_id"].to_pylist()) % np.uint64(mod)
        sampled = (h == 0).astype(np.int64)
        return pa.table({
            "source": t["source"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "sampled": pa.array(sampled),
        })

    from ray.data.aggregate import Sum

    agg = (_docs(sf_dir, ["doc_id", "source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("one", alias_name="n_total"),
                      Sum("sampled", alias_name="n_sampled")))
    return agg.map_batches(
        lambda t: t.select(["source", "n_total", "n_sampled"]),
        batch_format="pyarrow")


def length_buckets(sf_dir: str, width: int = 256):
    """Length profile: (source, bucket) -> doc count + total bytes, with
    bucket = utf8_bytes // width (exact integer arithmetic — no float
    binning to diverge from the oracle). Pre-aggregated per batch before
    the small groupby shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        nb = pc.binary_length(pc.cast(t["text"], pa.binary())).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bucket = nb // width
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        order, starts = segment_sort(
            np.unique(src, return_inverse=True)[1].astype(np.int64), bucket)
        sb, bb, nbs = src[order], bucket[order], nb[order]
        ends = np.r_[starts[1:], len(order)]
        csum = np.r_[0, np.cumsum(nbs)]
        return pa.table({
            "source": pa.array(sb[starts].tolist(), pa.string()),
            "bucket": pa.array(bb[starts], pa.int64()),
            "n_docs": pa.array(ends - starts, pa.int64()),
            "sum_bytes": pa.array(csum[ends] - csum[starts], pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (_docs(sf_dir, ["text", "source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["source", "bucket"])
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("sum_bytes", alias_name="sum_bytes")))
    return agg.map_batches(
        lambda t: t.select(["source", "bucket", "n_docs", "sum_bytes"]),
        batch_format="pyarrow")


def cross_source_contamination(sf_dir: str):
    """Exact contamination check across sources: content hashes (md5 of the
    utf-8 text) that appear in MORE THAN ONE source, with how many sources
    and docs carry them. The train/eval-leakage primitive: any hash shared
    between a training source and an eval source is a leak.

    Shape: per-batch md5 map -> bucketed shuffle on the hash -> one
    vectorized pass per bucket (factorize + segment count-distinct)."""
    def bucket_count(t: pa.Table) -> pa.Table:
        if "_bucket" in t.column_names:
            t = t.drop_columns(["_bucket"])
        if t.num_rows == 0:
            return pa.table({"content_hash": pa.array([], pa.string()),
                             "n_sources": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64())})
        h, s, hc, sc, order, hstarts, hends, n_sources = \
            _hash_source_segments(t)
        n_docs = hends - hstarts
        keep = n_sources > 1
        return pa.table({
            "content_hash": pa.array(h[order][hstarts][keep].tolist(),
                                     pa.string()),
            "n_sources": pa.array(n_sources[keep], pa.int64()),
            "n_docs": pa.array(n_docs[keep], pa.int64()),
        })

    mapped = _docs(sf_dir, ["text", "source"]).map_batches(
        _hash_map, batch_format="pyarrow")
    return grouped_apply(mapped, ["content_hash"], bucket_count, NUM_BUCKETS)


def contamination_summary(sf_dir: str):
    """Per-source leakage summary: (source, n_docs, n_contaminated) where
    n_contaminated counts docs whose exact content hash also appears in a
    DIFFERENT source. Non-empty on any corpus (one row per source), so it
    oracle-checks even when the corpus is clean; the hash-level detail is
    :func:`cross_source_contamination` (planted-duplicate tested — Ray's
    ``to_pandas`` drops the schema of an all-empty Dataset, so an
    empty-by-construction result cannot be the oracle-checked surface).

    Same bucketed shape: hashes meet in buckets; each bucket emits partial
    per-source (docs, contaminated) counts; a tiny groupby(source) sums."""
    def bucket_partial(t: pa.Table) -> pa.Table:
        if "_bucket" in t.column_names:
            t = t.drop_columns(["_bucket"])
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_contaminated": pa.array([], pa.int64())})
        h, s, hc, sc, order, hstarts, hends, n_src = \
            _hash_source_segments(t)
        contam_hash = np.zeros(int(hc.max()) + 1, dtype=bool)
        contam_hash[hc[order][hstarts]] = n_src > 1
        row_contam = contam_hash[hc].astype(np.int64)
        # per-source partial sums
        so, s_starts = segment_sort(sc.astype(np.int64))
        s_ends = np.r_[s_starts[1:], len(so)]
        ccum = np.r_[0, np.cumsum(row_contam[so])]
        return pa.table({
            "source": pa.array(s[so][s_starts].tolist(), pa.string()),
            "n_docs": pa.array(s_ends - s_starts, pa.int64()),
            "n_contaminated": pa.array(ccum[s_ends] - ccum[s_starts],
                                       pa.int64()),
        })

    from ray.data.aggregate import Sum

    mapped = _docs(sf_dir, ["text", "source"]).map_batches(
        _hash_map, batch_format="pyarrow")
    partials = grouped_apply(mapped, ["content_hash"], bucket_partial,
                             NUM_BUCKETS)
    agg = partials.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_contaminated", alias_name="n_contaminated"))
    return agg.map_batches(
        lambda t: t.select(["source", "n_docs", "n_contaminated"]),
        batch_format="pyarrow")


def dedup_rate(sf_dir: str):
    """Per-source duplication profile: (source, n_docs, n_distinct) with
    n_distinct = distinct content hashes — the pre-dedup corpus audit that
    sizes how much exact dedup will remove. Bucketed on the hash so each
    distinct hash is counted exactly once even when its copies span blocks."""
    def bucket_partial(t: pa.Table) -> pa.Table:
        if "_bucket" in t.column_names:
            t = t.drop_columns(["_bucket"])
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64())})
        h = np.asarray(t["content_hash"].to_pylist(), dtype=object)
        s = np.asarray(t["source"].to_pylist(), dtype=object)
        _, hc = np.unique(h, return_inverse=True)
        _, sc = np.unique(s, return_inverse=True)
        # per (source): docs; distinct = first occurrence of (source, hash)
        order = np.lexsort((hc, sc))
        ss, hh = sc[order], hc[order]
        first_pair = np.r_[True, (ss[1:] != ss[:-1]) | (hh[1:] != hh[:-1])]
        src_start = np.r_[True, ss[1:] != ss[:-1]]
        starts = np.nonzero(src_start)[0]
        ends = np.r_[starts[1:], len(order)]
        cfp = np.cumsum(first_pair)
        n_distinct = cfp[ends - 1] - np.r_[0, cfp[starts[1:] - 1]]
        return pa.table({
            "source": pa.array(s[order][starts].tolist(), pa.string()),
            "n_docs": pa.array(ends - starts, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
        })

    from ray.data.aggregate import Sum

    mapped = _docs(sf_dir, ["text", "source"]).map_batches(
        _hash_map, batch_format="pyarrow")
    partials = grouped_apply(mapped, ["content_hash"], bucket_partial,
                             NUM_BUCKETS)
    agg = partials.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_distinct", alias_name="n_distinct"))
    return agg.map_batches(
        lambda t: t.select(["source", "n_docs", "n_distinct"]),
        batch_format="pyarrow")


# -- deterministic source mixing -------------------------------------------

# The mix weight of a source is a pure function of its NAME (md5 parity with
# the DuckDB oracle): w = (md5_low64(source) % 8 + 1) * 0.25 ∈ {0.25 … 2.0}.
# Weights > 1 mean upsampling with repetition (extra epochs), < 1 mean
# deterministic downsampling — the LLM data-mixing primitive, reproducible
# under any partitioning because membership depends only on (source, doc_id).

def _mix_copies(t: pa.Table) -> np.ndarray:
    """Per-row emit count: floor(w) copies + 1 more iff
    md5_low64(doc_id) % 10000 < frac(w) * 10000 (exact integer arithmetic —
    frac(w) ∈ {0, .25, .5, .75} so the threshold is a whole number)."""
    widx = (_md5_low64(t["source"].to_pylist()) % np.uint64(8)).astype(
        np.int64) + 1
    base = widx // 4
    thresh = (widx % 4) * 2500
    h = (_md5_low64(t["doc_id"].to_pylist()) % np.uint64(10000)).astype(
        np.int64)
    return base + (h < thresh).astype(np.int64)


def mix_by_weight(sf_dir: str):
    """The mixed dataset itself: each doc row repeated ``copies`` times with
    an ``epoch`` column (0 … copies-1) — what a training run consumes.
    Vectorized repetition via ``Table.take(np.repeat(...))``; docs whose
    source downsamples away emit zero rows."""
    def emit(t: pa.Table) -> pa.Table:
        copies = _mix_copies(t)
        idx = np.repeat(np.arange(t.num_rows), copies)
        epoch = np.concatenate(
            [np.arange(c) for c in copies]) if len(idx) else np.array(
                [], dtype=np.int64)
        out = t.select(["doc_id", "source"]).take(pa.array(idx, pa.int64()))
        return out.append_column("epoch", pa.array(epoch, pa.int64()))

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        emit, batch_format="pyarrow")


def mix_weights_summary(sf_dir: str):
    """Oracle surface for the mix: per source, input docs and emitted rows
    (sum of per-doc copies). Non-empty on any corpus — one row per source —
    and exactly equal to ``mix_by_weight``'s per-source output cardinality."""
    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t["source"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "copies": pa.array(_mix_copies(t), pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (_docs(sf_dir, ["doc_id", "source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("one", alias_name="n_docs"),
                      Sum("copies", alias_name="n_emitted")))
    return agg.map_batches(
        lambda t: t.select(["source", "n_docs", "n_emitted"]),
        batch_format="pyarrow")


# -- shard packing (distributed prefix scan) ---------------------------------

def pack_shards(sf_dir: str, budget: int = 4096, n_buckets: int = 256):
    """Assign every document to a fixed-token-budget training shard in a
    deterministic global order — the "pack the corpus into shard files"
    step of a training-data pipeline, built as the classic TWO-PASS
    DISTRIBUTED PREFIX SCAN:

    - global order = (md5_low64(doc_id), doc_id); its top byte is the
      bucket, so buckets partition the keyspace into ``n_buckets`` ordered,
      statistically equal ranges;
    - pass 1 streams per-batch ``(bucket, token_sum)`` partials into a
      tiny ``groupby(bucket).sum`` — the all-to-all moves <= n_buckets rows
      per block, never documents;
    - the driver turns those <= n_buckets totals into exclusive bucket
      offsets (the only driver-side state: one small array);
    - pass 2 shuffles docs once by bucket; each bucket task sorts locally
      and emits shard = (bucket_offset + local_exclusive_cumsum) // budget.

    Token count = single-space split length (``count_substring + 1``),
    matching the DuckDB twin's ``len(string_split(text, ' '))``; shard ids
    are exact int64 arithmetic, so the oracle match is hash-exact. At
    100 TB raise ``n_buckets`` (top 2 bytes -> 65k ranges): pass-1 traffic
    stays metadata-sized and pass-2 is the one unavoidable full shuffle."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two (top-bits "
                         "bucketing keeps ranges ordered and complete)")
    ds = _docs(sf_dir, ["doc_id", "text"])
    shift = np.uint64(64 - int(n_buckets - 1).bit_length())

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = _md5_low64(ids.tolist())
        n_tok = pc.count_substring(t["text"], " ").to_numpy(
            zero_copy_only=False).astype(np.int64) + 1
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "k": pa.array(k, pa.uint64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "bucket": pa.array((k >> shift).astype(np.int32), pa.int32()),
        })

    # materialized once: both passes consume it, and the keyed projection
    # is tiny (4 fixed-width columns, no text) — without this the corpus
    # read + md5 keying would re-execute for pass 2
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        sums = np.bincount(b, weights=tok, minlength=n_buckets)
        nz = np.nonzero(sums)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int32), pa.int32()),
                         "tok": pa.array(sums[nz].astype(np.int64),
                                         pa.int64())})

    from ray.data.aggregate import Sum

    totals = (keyed_ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .aggregate(Sum("tok", alias_name="tok"))
              .take_all())  # <= n_buckets rows: metadata, not data
    per_bucket = np.zeros(n_buckets, np.int64)
    for r in totals:
        per_bucket[r["bucket"]] = r["tok"]
    offsets = np.r_[0, np.cumsum(per_bucket)[:-1]]  # exclusive, in order

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t["k"].to_numpy(zero_copy_only=False)
        tok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = int(t["bucket"][0].as_py())
        order = np.lexsort((ids, k))
        tok_s = tok[order]
        before = offsets[b] + np.r_[0, np.cumsum(tok_s)[:-1]]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_tokens": pa.array(tok_s, pa.int64()),
            "shard": pa.array(before // budget, pa.int64()),
        })

    return keyed_ds.groupby("bucket").map_groups(pack,
                                                 batch_format="pyarrow")


def source_filter(sf_dir: str,
                  allow: tuple[str, ...] = ("src1", "src3", "src5", "src7",
                                            "src11", "src13")):
    """Source/domain allowlist filter — the curation gate every production
    corpus applies first (licensing, quality tiers, domain blocklists).
    The list broadcasts as an Arrow value_set; the filter is one zero-copy
    ``is_in`` per batch (at 10^10 rows with a large list, swap the
    value_set for a shared sorted-hash array — same shape as the crawl's
    broadcast fetch keys)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    allow_arr = pa.array(sorted(allow))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["source"], value_set=allow_arr))

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    ).map_batches(keep, batch_format="pyarrow")
