"""Deduplication pipelines over the ``documents`` table — the training-data
ops a 100 TB corpus needs (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), each expressed as Ray Data stages.

Scale shape: every variant reduces to (1) a vectorized per-batch signature
stage, (2) a hash-shuffle on the signature key, (3) per-group resolution.
Nothing materializes the corpus on the driver; candidate verification happens
inside the bucket groups.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns or ["doc_id", "text"])


# ---------------------------------------------------------------------------
# Exact dedup: content hash -> hash-partition -> per-group first
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str):
    """Exact dedup (D2/D5 generalized): md5(text) groups, keep min doc_id.
    The md5 key matches DuckDB's ``md5()`` so the oracle can verify."""
    ds = _docs(sf_dir)

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(hs, pa.string())})

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [g["doc_id"].min()]})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .map_groups(first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+")


def _shingles(text: str, k: int = 3) -> set[int]:
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        if not words:
            return set()
        h = hashlib.blake2b(" ".join(words).encode(), digest_size=8).digest()
        return {int.from_bytes(h, "big")}
    out = set()
    for i in range(len(words) - k + 1):
        h = hashlib.blake2b(" ".join(words[i:i + k]).encode(), digest_size=8).digest()
        out.add(int.from_bytes(h, "big"))
    return out


class MinHasher:
    """Stateful signature stage: the permutation parameters are built once per
    actor (__init__), applied vectorized per batch (__call__)."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.p = np.uint64((1 << 61) - 1)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = np.fromiter(_shingles(text), dtype=np.uint64, count=-1)
        if len(sh) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a * x + b) mod p for all perms x shingles, take min per perm
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = [self.signature(s) for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def minhash_bands(t: pa.Table, bands: int = 16, rows: int = 4) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) rows."""
    doc_ids, band_ids, band_hashes, sigs_out = [], [], [], []
    sig_col = t["sig"].to_pylist()
    ids = t["doc_id"].to_pylist()
    for did, sig in zip(ids, sig_col):
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            # process-stable hash (Python's hash() is salted per process and
            # would break the cross-worker groupby collision)
            blob = np.asarray(chunk, dtype=np.uint64).tobytes() + bytes([b])
            bh = int.from_bytes(
                hashlib.blake2b(blob, digest_size=8).digest(), "big"
            ) & 0x7FFFFFFFFFFFFFFF
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(bh)
            sigs_out.append(sig)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            "sig": pa.array(sigs_out, pa.list_(pa.uint64())),
        }
    )


def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16):
    """MinHash+LSH near-dup pairs: shingle -> minhash (actor pool) -> band
    explode -> groupby(band) -> verified candidate pairs (estimated Jaccard =
    matching minhash fraction >= threshold). Returns unique (id_a, id_b)."""
    rows = num_perm // bands
    ds = _docs(sf_dir)
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs={"num_perm": num_perm},
                          batch_format="pyarrow", concurrency=(1, 8))
    banded = sigs.map_batches(
        lambda t: minhash_bands(t, bands=bands, rows=rows), batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs_ = np.stack(g["sig"].to_numpy())
        out_a, out_b = [], []
        for i in range(len(ids)):
            est = (sigs_[i + 1:] == sigs_[i]).mean(axis=1)
            hits = np.nonzero(est >= threshold)[0]
            for j in hits:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # distinct pairs (a pair can surface from several bands)
    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(dedup_pair, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word features; near-dups share the hash up to
    `hamming_max` bits. Buckets on 4x16-bit chunks so any pair within
    hamming distance 3 collides in >=1 chunk (pigeonhole)."""

    def __init__(self):
        self.word = _WORD_RE

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in self.word.findall(text.lower()):
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        return int.from_bytes(np.packbits(acc > 0).tobytes(), "big")

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = [self.simhash(s) for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array([h - (1 << 63) for h in hs], pa.int64())})


def dedup_simhash(sf_dir: str, hamming_max: int = 3):
    """SimHash near-dup pairs via 16-bit chunk bucketing + in-bucket hamming
    verification."""
    ds = _docs(sf_dir)
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))

    def explode(t: pa.Table) -> pa.Table:
        ids, chunk_ids, chunk_vals, full = [], [], [], []
        for did, sh in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            u = sh + (1 << 63)
            for c in range(4):
                ids.append(did)
                chunk_ids.append(c)
                chunk_vals.append((u >> (16 * c)) & 0xFFFF)
                full.append(sh)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_id": pa.array(chunk_ids, pa.int32()),
                         "chunk_val": pa.array(chunk_vals, pa.int32()),
                         "simhash": pa.array(full, pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = (g["simhash"].to_numpy().astype(np.int64) + (1 << 63)).astype(np.uint64)
        out_a, out_b = [], []
        for i in range(len(ids)):
            x = hs[i + 1:] ^ hs[i]
            dist = np.array([bin(int(v)).count("1") for v in x])
            for j in np.nonzero(dist <= hamming_max)[0]:
                out_a.append(int(ids[i])); out_b.append(int(ids[i + 1 + j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cand = sigs.map_batches(explode, batch_format="pyarrow") \
        .groupby(["chunk_id", "chunk_val"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact verification flavor)
# ---------------------------------------------------------------------------


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.8, k: int = 3):
    """Exact n-gram Jaccard near-dup pairs. Candidate generation by smallest
    shingle (documents sharing their minimum shingle meet in one group), then
    exact Jaccard verify in-group. A one-permutation LSH: cheap, deterministic,
    recall-bounded; the MinHash variant is the production path."""
    ds = _docs(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        keys, shingle_sets = [], []
        for s in t["text"].to_pylist():
            sh = _shingles(s, k)
            keys.append(min(sh) if sh else 0)
            shingle_sets.append(sorted(sh))
        return pa.table({"doc_id": t["doc_id"],
                         "min_shingle": pa.array(keys, pa.uint64()),
                         "shingles": pa.array(shingle_sets, pa.list_(pa.uint64()))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [set(s) for s in g["shingles"]]
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                if union and inter / union >= threshold:
                    out_a.append(int(ids[i])); out_b.append(int(ids[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("min_shingle")
        .map_groups(pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def dedup_embedding_cosine(sf_dir: str, threshold: float = 0.4, limit_ids: int = 512):
    """Embedding near-dup pairs among vec_id < limit_ids: normalize per batch,
    then an all-pairs cosine against a broadcast slice (numpy matmul). The
    broadcast side is the capped candidate set; the streaming side stays a
    Dataset — the scale path swaps the cap for LSH bucketing (see
    similarity.ann_lsh)."""
    import ray

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def cap(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids < limit_ids))

    capped = ds.map_batches(cap, batch_format="pyarrow")
    mat_tbl = capped.to_pandas()
    ids = mat_tbl["vec_id"].to_numpy()
    mat = np.stack(mat_tbl["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self, r):
            self.ids, self.mat = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, t: pa.Table) -> pa.Table:
            my_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            vecs = np.stack(t["embedding"].to_pylist()).astype(np.float64)
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            cos = vecs @ self.mat.T
            out_a, out_b = [], []
            for i in range(len(my_ids)):
                hits = np.nonzero(cos[i] >= threshold)[0]
                for j in hits:
                    a, b = int(my_ids[i]), int(self.ids[j])
                    if a < b:
                        out_a.append(a); out_b.append(b)
            return pa.table({"id_a": pa.array(out_a, pa.int64()),
                             "id_b": pa.array(out_b, pa.int64())})

    return capped.map_batches(PairFinder, fn_constructor_args=(ref,),
                              batch_format="pyarrow", concurrency=(1, 4))
