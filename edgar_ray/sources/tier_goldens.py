"""Per-tier golden tables for the approximate / hash-keyed operators whose
semantics no SQL engine can express (MinHash+LSH, sign-LSH embedding dedup,
IVF probe, trigram lang-ID, winnowing fingerprints).

The pattern is the one that made the crawl driver-checkable: an INDEPENDENT
spec-level evaluator (straightforward scalar/driver-side code, separate from
the vectorized Ray pipelines) computes the op's expected output for a
testdata tier and writes it as Parquet under /tmp; the DuckDB oracle twin is
then a plain ``read_parquet`` of the golden filtered to the current tier.

Tier keying: sf0.001 and sf0.01 both have 500 documents, so row counts
cannot key the golden. The key is ``sum(n_chars)`` over ``documents`` —
an integer DuckDB computes exactly (``corpus_key`` below), distinct across
the shipped tiers (153156 / 149174 / 1485576). Every golden row carries the
key; the oracle SQL filters ``WHERE corpus_key = (SELECT
CAST(sum(n_chars) AS BIGINT) FROM documents)``.

Independence caveat, stated plainly: seeded constants (hash bases, LSH
planes, permutation parameters) are part of each operator's SPEC and are
shared; everything else — tokenization, grouping, candidate capping,
verification — is reimplemented here in plain Python/numpy over the whole
tier at once, so a bug in the distributed bucketing/segmentation shows up
as a golden mismatch.
"""

from __future__ import annotations

import os
import re
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# bump to invalidate all cached goldens when any evaluator changes
GOLDEN_VERSION = 3


def _multi_probe_buckets(proj_l: np.ndarray, w: np.ndarray,
                         flips: int) -> list[int]:
    """Spec-level multi-probe set for one table: exact bucket + every flip
    combination of the ``flips`` lowest-|projection| bits."""
    import itertools

    qb = int((proj_l > 0).astype(np.int64) @ w)
    probes = {qb}
    low = np.argsort(np.abs(proj_l))[:flips]
    for r in range(1, flips + 1):
        for combo in itertools.combinations(low, r):
            pb = qb
            for bit in combo:
                pb ^= int(w[bit])
            probes.add(pb)
    return sorted(probes)

_ROOT = f"/tmp/edgar_ray_tier_goldens_v{GOLDEN_VERSION}"

_M64 = (1 << 64) - 1


def corpus_key(sf_dir: str) -> int:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["n_chars"])
    return int(np.sum(t["n_chars"].to_numpy(zero_copy_only=False)))


CORPUS_KEY_SQL = "(SELECT CAST(sum(n_chars) AS BIGINT) FROM documents)"


def golden_glob(op: str) -> str:
    return os.path.join(_ROOT, op, "*.parquet")


def ensure_golden(op: str, sf_dir: str) -> str:
    """Compute (once per tier) and return the golden parquet path."""
    key = corpus_key(sf_dir)
    d = os.path.join(_ROOT, op)
    path = os.path.join(d, f"{key}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(d, exist_ok=True)
    tbl = _BUILDERS[op](sf_dir)
    tbl = tbl.append_column(
        "corpus_key", pa.array([key] * tbl.num_rows, pa.int64()))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic under concurrent test workers
    return path


def golden_oracle_sql(op: str, cols: str) -> str:
    return (f"SELECT {cols} FROM read_parquet('{golden_glob(op)}') "
            f"WHERE corpus_key = {CORPUS_KEY_SQL}")


def _docs_table(sf_dir: str, columns) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=columns)


# ---------------------------------------------------------------------------
# text_langid / text_fingerprint: per-doc scalar twins
# ---------------------------------------------------------------------------


# Language trigram profiles: SPEC CONSTANTS of the lang-ID operator (like
# the seeded hash bases below, shared by definition between the pipeline
# and this evaluator; everything computational is reimplemented here).
_LANG_PROFILES = {
    "en": "the and that with have this from they were which their said "
          "would there about when what your them some could other than "
          "then into time only over also after most made through",
    "de": "der die und den von das mit sich des auf nicht eine als auch "
          "werden aber nach wird bei einer durch haben wenn kann noch "
          "gegen schon zwischen wurde seine unter",
    "fr": "les des une est dans pour par sur sont avec plus cette mais "
          "comme tout nous leur bien sans peut dont aussi cela entre "
          "pendant toujours depuis quelques",
    "es": "que los del las por una con para como mas pero sus esta entre "
          "cuando muy sin sobre tambien hasta donde quien desde todos "
          "durante estos mucho antes",
}

_LANG_WORD_RE = re.compile(rb"[a-z]+")


def _lang_profile_vecs() -> dict[str, dict[bytes, float]]:
    out: dict[str, dict[bytes, float]] = {}
    for lang, toks in _LANG_PROFILES.items():
        grams: dict[bytes, float] = {}
        for tk in toks.encode().split():
            for i in range(len(tk) - 2):
                g = tk[i:i + 3]
                grams[g] = grams.get(g, 0.0) + 1.0
        norm = sum(v * v for v in grams.values()) ** 0.5
        out[lang] = {g: v / norm for g, v in grams.items()}
    return out


def _langid_eval(text: str, profiles: dict[str, dict[bytes, float]]) -> str:
    """Spec-level scalar lang-ID (independent of pipelines/text.LangId):
    ASCII-lowercase the UTF-8 bytes, words = [a-z]+ runs joined by single
    spaces; 'und' when the joined length < 20; score = cosine of the
    space-free trigram count vector against each (pre-normalized) profile;
    best language wins on strict > (first profile order breaks ties), 'und'
    unless the best score clears 0.05."""
    bs = text.encode("utf-8", "ignore")
    lowered = bytes(b + 32 if 65 <= b <= 90 else b for b in bs)
    words = _LANG_WORD_RE.findall(lowered)
    norm_len = sum(len(w) for w in words) + max(len(words) - 1, 0)
    if norm_len < 20:
        return "und"
    joined = b" ".join(words)
    grams: dict[bytes, float] = {}
    for i in range(len(joined) - 2):
        g = joined[i:i + 3]
        if b" " in g:
            continue
        grams[g] = grams.get(g, 0.0) + 1.0
    norm = sum(v * v for v in grams.values()) ** 0.5 or 1.0
    best, best_s = "und", 0.0
    for lang, prof in profiles.items():
        s = sum(v * prof.get(g, 0.0) for g, v in grams.items()) / norm
        if s > best_s:
            best, best_s = lang, s
    return best if best_s > 0.05 else "und"


def _langid_golden(sf_dir: str) -> pa.Table:
    t = _docs_table(sf_dir, ["doc_id", "text", "lang"])
    profiles = _lang_profile_vecs()
    preds = [_langid_eval(s, profiles) for s in t["text"].to_pylist()]
    return pa.table({"doc_id": t["doc_id"],
                     "lang_pred": pa.array(preds, pa.string()),
                     "lang": t["lang"]})


def _to_i64(x: int) -> int:
    """Two's-complement reinterpretation of an unsigned value (mod 2^64)."""
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


# winnowing spec constants (Schleimer et al., SIGMOD 2003 parameters as
# shipped): k-gram size, window, polynomial base and the avalanche constant
_FP_K, _FP_W = 8, 16
_FP_B = 0x100000001B3
_FP_MIX = 0xFF51AFD7ED558CCD
_FP_POWS = [pow(_FP_B, _FP_K - 1 - j, 1 << 64) for j in range(_FP_K)]


def _fingerprint_eval(text: str) -> list[int]:
    """Spec-level scalar winnowing (independent of pipelines/text.
    Fingerprinter — pure-Python integer arithmetic, no shared kernels):
    k-gram hash = avalanche(sum_j byte[s+j] * B^(k-1-j) mod 2^64); docs
    shorter than k fall back to one blake2b-64 value; <=W k-grams emit the
    single minimum; otherwise the sorted distinct sliding-window minima,
    capped at 64."""
    import hashlib

    data = text.encode()
    if not data:
        return []
    if len(data) < _FP_K:
        return [int.from_bytes(
            hashlib.blake2b(data, digest_size=8).digest(), "big")]
    hs = []
    for s in range(len(data) - _FP_K + 1):
        h = 0
        for j in range(_FP_K):
            h += data[s + j] * _FP_POWS[j]
        h &= _M64
        h ^= h >> 33
        h = (h * _FP_MIX) & _M64
        h ^= h >> 33
        hs.append(h)
    if len(hs) <= _FP_W:
        return [min(hs)]
    mins = {min(hs[i:i + _FP_W]) for i in range(len(hs) - _FP_W + 1)}
    return sorted(mins)[:64]


def _fingerprint_golden(sf_dir: str) -> pa.Table:
    t = _docs_table(sf_dir, ["doc_id", "text"])
    n_fp, fp_min, fp_xor = [], [], []
    for s in t["text"].to_pylist():
        fp = _fingerprint_eval(s)  # sorted ascending, uint64
        n_fp.append(len(fp))
        if fp:
            x = 0
            for v in fp:
                x ^= v
            # the pipeline emits (value - 2^63) reinterpreted as int64
            fp_min.append(_to_i64(fp[0] - (1 << 63)))
            fp_xor.append(_to_i64(x - (1 << 63)))
        else:
            fp_min.append(0)
            fp_xor.append(0)
    return pa.table({"doc_id": t["doc_id"],
                     "n_fp": pa.array(n_fp, pa.int64()),
                     "fp_min": pa.array(fp_min, pa.int64()),
                     "fp_xor": pa.array(fp_xor, pa.int64())})


# ---------------------------------------------------------------------------
# dedup_minhash_lsh: scalar word/shingle hashing + global band grouping
# ---------------------------------------------------------------------------

_B = 0x100000001B3
_FMIX1 = 0xFF51AFD7ED558CCD
_FMIX2 = 0xC4CEB9FE1A85EC53
_WORD_RE = re.compile(rb"[0-9a-z_\x80-\xff]+")


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * _FMIX1) & _M64
    h ^= h >> 33
    h = (h * _FMIX2) & _M64
    h ^= h >> 33
    return h


def _word_hashes_scalar(text: str) -> list[int]:
    """Spec twin of _word_hash_batch: ASCII-lowercase the UTF-8 bytes, words
    = maximal [0-9a-z_] or >=0x80 byte runs, hash = fmix64(sum_j b_j*B^j)."""
    bs = text.encode("utf-8", "ignore")
    lowered = bytes(b + 32 if 65 <= b <= 90 else b for b in bs)
    out = []
    for w in _WORD_RE.findall(lowered):
        h, p = 0, 1
        for byte in w:
            h = (h + byte * p) & _M64
            p = (p * _B) & _M64
        out.append(_fmix64(h))
    return out


_C = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _shingles_scalar(text: str, k: int = 3) -> set[int]:
    hw = _word_hashes_scalar(text)
    if not hw:
        return set()
    if len(hw) < k:
        acc = (hw[0] * _C[0]) & _M64
        for j in range(1, len(hw)):
            acc ^= (hw[j] * _C[j % 3]) & _M64
        return {acc}
    out = set()
    for i in range(len(hw) - k + 1):
        sh = (hw[i] * _C[0]) & _M64
        for j in range(1, k):
            sh ^= (hw[i + j] * _C[j % 3]) & _M64
        out.add(sh)
    return out


def _minhash_golden(sf_dir: str, threshold: float = 0.7, num_perm: int = 64,
                    bands: int = 16, max_segment: int = 512) -> pa.Table:
    t = _docs_table(sf_dir, ["doc_id", "text"])
    rng = np.random.default_rng(7)  # the op's spec constants
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    p = np.uint64((1 << 61) - 1)
    rows = num_perm // bands
    groups: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        sh = _shingles_scalar(text)
        if not sh:
            continue  # empty-shingle docs never band
        arr = np.fromiter(sh, np.uint64, count=len(sh))
        sig = ((a[:, None] * arr[None, :] + b[:, None]) % p).min(axis=1)
        for band in range(bands):
            bh = 0xCBF29CE484222325
            for r in range(rows):
                bh = ((bh * _B) & _M64) ^ int(sig[band * rows + r])
            bh ^= (band * 0x9E3779B9) & _M64
            bh &= (1 << 63) - 1
            groups.setdefault((band, bh), []).append((doc_id, sig))
    pairs: set[tuple[int, int]] = set()
    for members in groups.values():
        members.sort(key=lambda m: m[0])
        members = members[:max_segment]
        for i in range(len(members) - 1):
            for j in range(i + 1, len(members)):
                est = float(np.mean(members[i][1] == members[j][1]))
                if est >= threshold:
                    pairs.add((members[i][0], members[j][0]))
    out = sorted(pairs)
    return pa.table({"id_a": pa.array([x for x, _ in out], pa.int64()),
                     "id_b": pa.array([y for _, y in out], pa.int64())})


# ---------------------------------------------------------------------------
# dedup_embedding_lsh: global sign-LSH grouping + float32 cosine verify
# ---------------------------------------------------------------------------


def _emb_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, mat


def _emb_lsh_golden(sf_dir: str, threshold: float = 0.4, nbits: int = 8,
                    ntables: int = 8, max_segment: int = 512) -> pa.Table:
    ids, mat = _emb_matrix(sf_dir)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    dim = mat.shape[1]
    planes = np.random.default_rng(11).standard_normal((ntables, nbits, dim))
    weights = (1 << np.arange(nbits)).astype(np.int64)
    f32 = mat.astype(np.float32)  # the pipeline verifies in float32
    pairs: set[tuple[int, int]] = set()
    for l in range(ntables):
        buckets = ((mat @ planes[l].T) > 0).astype(np.int64) @ weights
        for bval in np.unique(buckets):
            sel = np.nonzero(buckets == bval)[0]
            if len(sel) < 2:
                continue
            sel = sel[np.argsort(ids[sel], kind="stable")][:max_segment]
            cos = f32[sel] @ f32[sel].T
            ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
            for x, y in zip(ids[sel][ii], ids[sel][jj]):
                if x != y:
                    pairs.add((int(min(x, y)), int(max(x, y))))
    out = sorted(pairs)
    return pa.table({"id_a": pa.array([x for x, _ in out], pa.int64()),
                     "id_b": pa.array([y for _, y in out], pa.int64())})


# ---------------------------------------------------------------------------
# similarity_ann_ivf_partitioned: whole-corpus numpy IVF probe
# ---------------------------------------------------------------------------


def _ivf_golden(sf_dir: str, query_id: int = 0, k: int = 10,
                nlist: int = 32, nprobe: int = 8) -> pa.Table:
    ids, mat = _emb_matrix(sf_dir)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                            1e-12)
    cent_sel = ids < nlist
    cents = norm[cent_sel][np.argsort(ids[cent_sel])]
    q = norm[ids == query_id][0]
    probes = set(np.argsort(-(cents @ q))[:nprobe].tolist())
    assign = np.argmax(norm @ cents.T, axis=1)
    cand = np.isin(assign, list(probes))
    cos = norm[cand] @ q
    cids = ids[cand]
    order = np.lexsort((cids, -cos))[:k]
    return pa.table({"vec_id": pa.array(cids[order], pa.int64())})


def _ann_recall_golden(sf_dir: str, query_ids=(0, 1, 2, 3), k: int = 10,
                       lsh_nbits: int = 8, lsh_ntables: int = 32,
                       lsh_flips: int = 2,
                       ivf_nlist: int = 32, ivf_nprobe: int = 8) -> pa.Table:
    """Whole-corpus numpy twin of similarity.ann_recall: exact / LSH-probed
    / IVF-probed top-k per query, recall of each approximate set."""
    ids, raw = _emb_matrix(sf_dir)
    norm = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True),
                            1e-12)
    dim = raw.shape[1]
    planes = np.random.default_rng(11).standard_normal(
        (lsh_ntables, lsh_nbits, dim))
    w = (1 << np.arange(lsh_nbits)).astype(np.int64)
    vec_buckets = np.stack(
        [((raw @ planes[l].T) > 0).astype(np.int64) @ w
         for l in range(lsh_ntables)], axis=1)  # (n, L); sign == normalized
    cent_sel = ids < ivf_nlist
    cents = norm[cent_sel][np.argsort(ids[cent_sel])]
    assign = np.argmax(norm @ cents.T, axis=1)
    rows = []
    for qid in query_ids:
        q = norm[ids == qid][0]
        cos = norm @ q

        def topk(mask):
            sel = np.nonzero(mask)[0]
            order = np.lexsort((ids[sel], -cos[sel]))[:k]
            return set(ids[sel][order].tolist())

        exact = topk(np.ones(len(ids), bool))
        lsh_mask = np.zeros(len(ids), bool)
        for l in range(lsh_ntables):
            probes = _multi_probe_buckets(q @ planes[l].T, w, lsh_flips)
            lsh_mask |= np.isin(vec_buckets[:, l], probes)
        probes = np.argsort(-(cents @ q))[:ivf_nprobe]
        ivf_mask = np.isin(assign, probes)
        for method, mask in (("lsh", lsh_mask), ("ivf", ivf_mask)):
            hits = len(topk(mask) & exact)
            rows.append((int(qid), method, hits, hits / k))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "method": pa.array([r[1] for r in rows], pa.string()),
        "n_hits": pa.array([r[2] for r in rows], pa.int64()),
        "recall": pa.array([r[3] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------------------
# dedup_simhash / dedup_ngram_jaccard: scalar feature twins, global grouping
# ---------------------------------------------------------------------------


def _simhash_scalar(text: str) -> int | None:
    """Position-wise word-hash bit majority (None for word-less docs)."""
    hw = _word_hashes_scalar(text)
    if not hw:
        return None
    n = len(hw)
    sim = 0
    for p in range(64):
        cnt = sum((h >> p) & 1 for h in hw)
        if 2 * cnt > n:
            sim |= 1 << p
    return sim


def _simhash_golden(sf_dir: str, hamming_max: int = 3,
                    max_segment: int = 512) -> pa.Table:
    t = _docs_table(sf_dir, ["doc_id", "text"])
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        sim = _simhash_scalar(text)
        if sim is None:
            continue
        for c in range(4):
            groups.setdefault((c, (sim >> (16 * c)) & 0xFFFF),
                              []).append((doc_id, sim))
    pairs: set[tuple[int, int]] = set()
    for members in groups.values():
        members.sort(key=lambda m: m[0])
        members = members[:max_segment]
        for i in range(len(members) - 1):
            for j in range(i + 1, len(members)):
                if bin(members[i][1] ^ members[j][1]).count("1") \
                        <= hamming_max:
                    pairs.add((members[i][0], members[j][0]))
    out = sorted(pairs)
    return pa.table({"id_a": pa.array([x for x, _ in out], pa.int64()),
                     "id_b": pa.array([y for _, y in out], pa.int64())})


def _ngram_jaccard_golden(sf_dir: str, threshold: float = 0.8, k: int = 3,
                          max_segment: int = 512) -> pa.Table:
    t = _docs_table(sf_dir, ["doc_id", "text"])
    groups: dict[int, list[tuple[int, set[int]]]] = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        sh = _shingles_scalar(text, k)
        if not sh:
            continue
        groups.setdefault(min(sh), []).append((doc_id, sh))
    pairs: set[tuple[int, int]] = set()
    for members in groups.values():
        members.sort(key=lambda m: m[0])
        members = members[:max_segment]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i][1], members[j][1]
                union = len(a | b)
                if union and len(a & b) / union >= threshold:
                    pairs.add((members[i][0], members[j][0]))
    out = sorted(pairs)
    return pa.table({"id_a": pa.array([x for x, _ in out], pa.int64()),
                     "id_b": pa.array([y for _, y in out], pa.int64())})


def _clusters_golden(sf_dir: str) -> pa.Table:
    """Union-find closure over the minhash golden pairs: (node, label=min
    component member) — the spec twin of the iterative min-label CC."""
    p = _minhash_golden(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(p["id_a"].to_pylist(), p["id_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "label": pa.array([find(n) for n in nodes], pa.int64())})


def _ann_probe_golden(sf_dir: str, method: str, query_id: int = 0,
                      k: int = 10) -> pa.Table:
    """Top-k of one approximate probe (the per-method slice of
    _ann_recall_golden's machinery)."""
    ids, raw = _emb_matrix(sf_dir)
    norm = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True),
                            1e-12)
    dim = raw.shape[1]
    q = norm[ids == query_id][0]
    cos = norm @ q
    if method == "lsh":
        planes = np.random.default_rng(11).standard_normal((32, 8, dim))
        w = (1 << np.arange(8)).astype(np.int64)
        vec_buckets = np.stack(
            [((raw @ planes[l].T) > 0).astype(np.int64) @ w
             for l in range(32)], axis=1)
        mask = np.zeros(len(ids), bool)
        for l in range(32):
            probes = _multi_probe_buckets(q @ planes[l].T, w, 2)
            mask |= np.isin(vec_buckets[:, l], probes)
    else:  # ivf
        cent_sel = ids < 32
        cents = norm[cent_sel][np.argsort(ids[cent_sel])]
        probes = np.argsort(-(cents @ q))[:8]
        mask = np.isin(np.argmax(norm @ cents.T, axis=1), probes)
    sel = np.nonzero(mask)[0]
    order = np.lexsort((ids[sel], -cos[sel]))[:k]
    return pa.table({"vec_id": pa.array(ids[sel][order], pa.int64())})


def _ann_lsh_golden(sf_dir: str) -> pa.Table:
    return _ann_probe_golden(sf_dir, "lsh")


def _ann_ivf_golden(sf_dir: str) -> pa.Table:
    return _ann_probe_golden(sf_dir, "ivf")


_BUILDERS = {
    "text_langid": _langid_golden,
    "text_fingerprint": _fingerprint_golden,
    "dedup_minhash_lsh": _minhash_golden,
    "dedup_embedding_lsh": _emb_lsh_golden,
    "similarity_ann_ivf_partitioned": _ivf_golden,
    "similarity_ann_recall": _ann_recall_golden,
    # extras (locally-oracled rows-only siblings, same golden machinery)
    "dedup_simhash": _simhash_golden,
    "dedup_ngram_jaccard": _ngram_jaccard_golden,
    "dedup_clusters": _clusters_golden,
    "similarity_ann_lsh": _ann_lsh_golden,
    "similarity_ann_ivf": _ann_ivf_golden,
}

GOLDEN_OPS = tuple(_BUILDERS)
