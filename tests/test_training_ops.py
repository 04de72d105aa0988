"""Semantic tests for the training-data ops: planted near-duplicates are
found by every dedup variant, ANN recall against the exact baseline, and
fingerprint stability."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen analysts "
    "review quarterly filings for revenue recognition and balance sheet "
    "adjustments across multiple reporting periods in the annual report "
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory, ray_session):
    """documents.parquet with: exact dup pair (0,1), near-dup pair (2,3)
    (one word changed), an unrelated doc 4, and filler docs 5..49."""
    out = tmp_path_factory.mktemp("planted")
    rng = np.random.default_rng(3)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = [
        BASE * 3,                                  # 0
        BASE * 3,                                  # 1: exact dup of 0
        BASE * 3 + "closing remarks follow here",  # 2
        BASE * 3 + "closing remarks follow there",  # 3: near dup of 2
        "completely different tiny document about nothing in particular "
        "with several distinct tokens never seen above",  # 4
    ]
    for i in range(5, 50):
        texts.append(" ".join(rng.choice(words, size=60).tolist()) + f" doc{i}")
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    path = os.path.join(str(out), "documents.parquet")
    pq.write_table(tbl, path)
    return str(out)


def _pairs(ds):
    return {(r["id_a"], r["id_b"]) for r in ds.take_all()}


def test_minhash_finds_planted(planted_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_minhash_lsh

    pairs = _pairs(dedup_minhash_lsh(planted_dir))
    assert (0, 1) in pairs  # exact dup: identical signatures
    assert (2, 3) in pairs  # near dup: high jaccard
    flat = {i for p in pairs for i in p}
    assert 4 not in flat  # unrelated doc never pairs


def test_simhash_finds_planted(planted_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_simhash

    pairs = _pairs(dedup_simhash(planted_dir))
    assert (0, 1) in pairs
    assert (2, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_ngram_jaccard_finds_planted(planted_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_ngram_jaccard

    pairs = _pairs(dedup_ngram_jaccard(planted_dir))
    assert (0, 1) in pairs
    assert (2, 3) in pairs


def test_exact_dedup_planted(planted_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_exact

    kept = sorted(r["doc_id"] for r in dedup_exact(planted_dir).take_all())
    assert 0 in kept and 1 not in kept  # min doc_id survives per content hash
    assert len(kept) == 49


def test_ann_recall_vs_brute(ray_session):
    from edgar_ray.pipelines import similarity

    sf = "/root/testdata/sf0.01"
    brute = [r["vec_id"] for r in similarity.knn_brute(sf, 0, 10).take_all()]
    ann = [r["vec_id"] for r in similarity.ann_lsh(sf, 0, 10).take_all()]
    # the testdata embeddings are near-random (top-10 cosine ~0.37) — the
    # hostile regime for any sublinear index. The shipped multi-probe
    # constants (nbits=8, 32 tables, 2 flip bits) were chosen by the
    # ann_recall metric to clear 0.8 on all four queries at sf0.01/sf0.1
    # at ~0.41 candidate fraction (NOTES.md round-5 sweep).
    assert 0 in ann
    assert len(set(brute) & set(ann)) / 10 >= 0.8
    ivf = [r["vec_id"] for r in similarity.ann_ivf(sf, 0, 10).take_all()]
    assert 0 in ivf
    assert len(set(brute) & set(ivf)) / 10 >= 0.5


def test_ann_recall_lsh_clears_bar(ray_session):
    """The shipped LSH defaults must serve a real user: recall@10 >= 0.8
    for EVERY query of the ann_recall quality row at the driver tier."""
    from edgar_ray.pipelines import similarity

    t = similarity.ann_recall("/root/testdata/sf0.01").to_pandas()
    lsh = t[t["method"] == "lsh"]
    assert len(lsh) == 4
    assert (lsh["recall"] >= 0.8).all(), lsh.to_dict("records")


def test_fingerprint_stability(planted_dir, ray_session):
    from edgar_ray.pipelines.text import Fingerprinter

    f = Fingerprinter()
    a = f.fingerprint(BASE * 3)
    b = f.fingerprint(BASE * 3)
    assert a == b and len(a) > 0
    # near-identical docs share most fingerprint mins (winnowing property)
    c = f.fingerprint(BASE * 3 + "closing remarks follow here")
    overlap = len(set(a) & set(c)) / max(1, len(set(a) | set(c)))
    assert overlap > 0.5


def test_multimodal_resize_and_frames(ray_session):
    from edgar_ray.pipelines import multimodal

    sf = "/root/testdata/sf0.001"
    df = multimodal.resize_images(sf).to_pandas()
    im = df[df["modality"] == "image"]
    assert len(im) > 0
    assert (im["meta_width"] == 224).all() and (im["meta_height"] == 224).all()
    other = df[df["modality"] != "image"]
    # non-image rows pass through untouched
    src = multimodal.synthesize_payloads(sf).to_pandas()
    merged = other.merge(src, on="item_id", suffixes=("", "_src"))
    assert (merged["payload"] == merged["payload_src"]).all()

    frames = multimodal.sample_frames(sf).to_pandas()
    vids = set(src[src["modality"] == "video"]["item_id"])
    assert set(frames["item_id"]) <= vids
    # frame count respects fps x duration, capped
    per = frames.groupby("item_id")["frame_idx"].max() + 1
    durs = src.set_index("item_id")["meta_duration_ms"]
    import numpy as np
    for item, n in per.items():
        want = min(16, max(1, int(durs[item] / 1000.0)))
        assert n == want, item
    # deterministic frame bytes
    f2 = multimodal.sample_frames(sf).to_pandas()
    a = frames.sort_values(["item_id", "frame_idx"])["frame"].tolist()
    b = f2.sort_values(["item_id", "frame_idx"])["frame"].tolist()
    assert a == b


def test_langid_planted(ray_session):
    """The testdata documents are synthetic keyword salad (their lang column
    is arbitrary metadata), so accuracy is asserted on planted natural-
    language snippets instead."""
    from edgar_ray.pipelines.text import LangId

    clf = LangId()
    samples = {
        "en": "the committee said that they would review the report and "
              "provide their findings after the meeting with the board",
        "de": "der ausschuss sagte dass sie den bericht mit der zeit "
              "durch die sitzung und nach einer weiteren woche vorlegen werden",
        "fr": "le comite a dit que les membres vont examiner le rapport "
              "dans les prochains jours pour une decision avec leur conseil",
        "es": "el comite dijo que los miembros van a revisar el informe "
              "durante los proximos dias para una decision con sus asesores",
    }
    for lang, text in samples.items():
        assert clf.classify(text) == lang, (lang, clf.classify(text))
    assert clf.classify("xz qj vv") == "und"  # too short / no signal


def test_ivf_partitioned_index(tmp_path, ray_session):
    """The partitioned IVF index (prune-at-read) returns exactly what the
    scan-and-filter IVF returns, reading only the probed partitions."""
    import os

    from edgar_ray.pipelines import similarity

    sf = "/root/testdata/sf0.01"
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(sf, idx)
    part_dirs = [d for d in os.listdir(idx) if d.startswith("centroid=")]
    assert len(part_dirs) > 1  # corpus actually spreads over centroids
    got = [r["vec_id"] for r in
           similarity.ann_ivf_partitioned(idx, sf, 0, 10).take_all()]
    want = [r["vec_id"] for r in similarity.ann_ivf(sf, 0, 10).take_all()]
    assert got == want


def test_connected_components_matches_union_find(ray_session):
    """Distributed label propagation == sequential union-find on the same
    near-dup pair set."""
    from edgar_ray.pipelines.dedup import (
        dedup_connected_components,
        dedup_minhash_lsh,
    )

    sf = "/root/testdata/sf0.01"
    labels = dedup_connected_components(sf).to_pandas()
    pairs = dedup_minhash_lsh(sf).to_pandas()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs.itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in set(pairs["id_a"]) | set(pairs["id_b"])}
    got = dict(zip(labels["node"], labels["label"]))
    assert got == want


@pytest.fixture(scope="module")
def planted_emb_dir(tmp_path_factory, ray_session):
    """embeddings.parquet with 700 random vectors plus a planted near-dup
    pair at ids (600, 650) — both ABOVE the capped-twin's 512-id window, so
    only the uncapped LSH scale path can find them."""
    out = tmp_path_factory.mktemp("planted_emb")
    rng = np.random.default_rng(9)
    n, dim = 700, 16
    mat = rng.standard_normal((n, dim))
    mat[650] = mat[600] + rng.standard_normal(dim) * 0.01  # near dup
    tbl = pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(str(out), "embeddings.parquet"))
    return str(out)


def test_embedding_lsh_finds_planted_beyond_cap(planted_emb_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_embedding_lsh

    pairs = _pairs(dedup_embedding_lsh(planted_emb_dir, threshold=0.95))
    assert (600, 650) in pairs
    # random 16-dim gaussians essentially never hit cosine >= 0.95
    assert len(pairs) < 20


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory, ray_session):
    """documents.parquet planting the quadratic-blowup regime: 1000 empty /
    whitespace docs (which share the degenerate all-max MinHash signature
    and simhash 0) around one real near-dup pair."""
    out = tmp_path_factory.mktemp("degen")
    texts = [BASE * 3, BASE * 3 + "closing remarks follow here"]
    texts += ["" if i % 2 else "   " for i in range(1000)]
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, os.path.join(str(out), "documents.parquet"))
    return str(out)


def test_minhash_degenerate_guard(degenerate_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_minhash_lsh

    pairs = _pairs(dedup_minhash_lsh(degenerate_dir))
    assert (0, 1) in pairs          # the real near-dup still found
    flat = {i for p in pairs for i in p}
    assert flat <= {0, 1}           # empty docs never pair (dropped pre-band)


def test_simhash_degenerate_guard(degenerate_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_simhash

    pairs = _pairs(dedup_simhash(degenerate_dir))
    assert (0, 1) in pairs
    flat = {i for p in pairs for i in p}
    assert flat <= {0, 1}


def test_ngram_degenerate_guard(degenerate_dir, ray_session):
    from edgar_ray.pipelines.dedup import dedup_ngram_jaccard

    pairs = _pairs(dedup_ngram_jaccard(degenerate_dir))
    assert (0, 1) in pairs
    flat = {i for p in pairs for i in p}
    assert flat <= {0, 1}


def test_langid_vectorized_equals_scalar(ray_session):
    """classify_batch (one numpy pass per batch) is output-identical to the
    per-doc classify reference implementation."""
    from edgar_ray.pipelines.text import LangId

    li = LangId()
    rng = np.random.default_rng(5)
    samples = [
        "", "ab", "the quick brown fox jumps over the lazy dog",
        "Der schnelle braune Fuchs springt über den faulen Hund", 
        "le renard brun rapide saute par dessus le chien paresseux",
        "ab ab ab ab ab ab ab ab ab ab ab",   # long but trigram-free
        "x" * 19, "x" * 25, "123 456 789 !!!",
        "Ünïcödé tëxt wîth áccents and the usual english words here",
    ]
    words = "the and that with der die und les des que los".split()
    for _ in range(100):
        k = int(rng.integers(3, 40))
        samples.append(" ".join(rng.choice(words, size=k).tolist()))
    assert li.classify_batch(samples) == [li.classify(s) for s in samples]


@pytest.fixture(scope="module")
def contaminated_dir(tmp_path_factory, ray_session):
    """documents.parquet with planted CROSS-SOURCE exact duplicates:
    text 'shared-A' in 3 sources (5 docs), 'shared-B' in 2 sources, and
    within-source-only dups that must NOT be flagged."""
    out = tmp_path_factory.mktemp("contam")
    rows = [
        (0, "shared A text body", "web"),
        (1, "shared A text body", "books"),
        (2, "shared A text body", "wiki"),
        (3, "shared A text body", "web"),      # extra copy, same source
        (4, "shared A text body", "books"),
        (5, "shared B text body", "web"),
        (6, "shared B text body", "wiki"),
        (7, "within only", "web"),
        (8, "within only", "web"),             # same-source dup: not flagged
        (9, "unique doc", "books"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(tbl, os.path.join(str(out), "documents.parquet"))
    return str(out)


def test_cross_source_contamination_planted(contaminated_dir, ray_session):
    import hashlib

    from edgar_ray.pipelines.sampling import cross_source_contamination

    got = {r["content_hash"]: (r["n_sources"], r["n_docs"])
           for r in cross_source_contamination(contaminated_dir).take_all()}
    ha = hashlib.md5(b"shared A text body").hexdigest()
    hb = hashlib.md5(b"shared B text body").hexdigest()
    assert got[ha] == (3, 5)
    assert got[hb] == (2, 2)
    assert len(got) == 2  # within-source dups and uniques never flagged


def test_train_test_split_reproducible(ray_session):
    """Split membership depends only on doc_id — identical across runs and
    close to the requested rate."""
    from edgar_ray.pipelines.sampling import train_test_split

    sf = "/root/testdata/sf0.01"
    a = {r["doc_id"]: r["split"] for r in train_test_split(sf).take_all()}
    b = {r["doc_id"]: r["split"] for r in train_test_split(sf).take_all()}
    assert a == b
    rate = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.03 < rate < 0.2  # ~10% with small-sample noise


def test_contamination_summary_planted(contaminated_dir, ray_session):
    from edgar_ray.pipelines.sampling import contamination_summary

    got = {r["source"]: (r["n_docs"], r["n_contaminated"])
           for r in contamination_summary(contaminated_dir).take_all()}
    # shared-A: web x2 + books x2 + wiki x1; shared-B: web + wiki
    assert got["web"] == (5, 3)    # 2 A-copies + 1 B-copy; within-dups not
    assert got["books"] == (3, 2)  # 2 A-copies; unique doc clean
    assert got["wiki"] == (2, 2)   # 1 A + 1 B


def test_dedup_rate_planted(contaminated_dir, ray_session):
    from edgar_ray.pipelines.sampling import dedup_rate

    got = {r["source"]: (r["n_docs"], r["n_distinct"])
           for r in dedup_rate(contaminated_dir).take_all()}
    # web: 5 docs {A,A,B,within,within} -> 3 distinct
    assert got["web"] == (5, 3)
    assert got["books"] == (3, 2)   # {A,A,unique}
    assert got["wiki"] == (2, 2)    # {A,B}


def test_quality_vectorized_equals_scalar(ray_session):
    """The byte-pass QualityScorer kernel is output-identical (bitwise, all
    six columns) to the scalar pandas twin on testdata plus boundary cases:
    empty/whitespace docs, apostrophes, unicode (multi-byte UTF-8), doc
    boundaries where adjacent docs end/start with letters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from edgar_ray.pipelines.text import QualityScorer

    qs = QualityScorer()
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    tricky = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array([
            "", " ", "don't stop the beat", "the the the",
            "é ünïcödé wörds the", "UPPER the LOWER", "a",
            "which which' 'which", "x" * 100,
            "one two, three; four: five! six? the...",
            "русский текст the and", "mixed é1n2d3 the-quick don't",
        ], pa.string()),
    })
    for t in (docs, tricky):
        vec = qs(t).to_pandas()
        ref = qs.score_frame(t.to_pandas()).reset_index(drop=True)
        for c in vec.columns:
            assert (vec[c].to_numpy() == ref[c].to_numpy()).all(), c
    # the chunked path (big batches split into CHUNK-doc sub-batches)
    many = pa.table({
        "doc_id": pa.array(range(qs.CHUNK + 7), pa.int64()),
        "text": pa.array((["the quick brown fox."] * (qs.CHUNK + 7))),
    })
    out = qs(many).to_pandas()
    assert len(out) == qs.CHUNK + 7
    assert (out["n_words"] == 4).all()


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory, ray_session):
    """documents.parquet with planted PII: emails, dashed/dotted phones,
    long ID digit runs — and near-misses that must survive unredacted."""
    out = tmp_path_factory.mktemp("pii")
    rows = [
        (0, "contact jane.doe+spam@example.co.uk or bob@corp.io today"),
        (1, "call 555-867-5309 or 555.867.5309 after hours"),
        (2, "card 4111111111111111 and ssn-ish 123456789 leak"),
        (3, "clean text with number 1234 and word a@b (not an email)"),
        (4, "mixed: a@b.com then 111-222-3333 then 98765432109876"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(tbl, os.path.join(str(out), "documents.parquet"))
    return str(out)


def test_pii_scrub_planted(pii_dir, ray_session):
    from edgar_ray.pipelines.text import pii_scrub

    got = {r["doc_id"]: r for r in pii_scrub(pii_dir).take_all()}
    assert got[0]["text_clean"] == "contact <EMAIL> or <EMAIL> today"
    assert got[0]["n_pii"] == 2
    assert got[1]["text_clean"] == "call <PHONE> or <PHONE> after hours"
    assert got[1]["n_pii"] == 2
    assert got[2]["text_clean"] == "card <ID> and ssn-ish <ID> leak"
    assert got[2]["n_pii"] == 2
    # near-misses: short number and a@b (no dotted TLD) stay untouched
    assert got[3]["text_clean"] == (
        "clean text with number 1234 and word a@b (not an email)")
    assert got[3]["n_pii"] == 0
    assert got[4]["text_clean"] == "mixed: <EMAIL> then <PHONE> then <ID>"
    assert got[4]["n_pii"] == 3


def test_vocabulary_matches_counter(planted_dir, ray_session):
    """Top-k vocabulary equals a brute-force Counter over the same
    tokenization (single-space split, empties dropped), with the
    (count desc, word asc) total order."""
    from collections import Counter

    from edgar_ray.pipelines.text import vocabulary

    texts = pq.read_table(
        os.path.join(planted_dir, "documents.parquet"))["text"].to_pylist()
    c = Counter(w for t in texts for w in t.split(" ") if w)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r["word"], r["n_occurrences"])
           for r in vocabulary(planted_dir, top_n=25).take_all()]
    assert got == want


def test_mix_weights_emit_matches_summary(contaminated_dir, ray_session):
    """The emitted mixed dataset's per-source cardinality equals the
    summary's n_emitted; epochs are dense 0..copies-1 per doc; the mix is
    deterministic across runs."""
    from collections import Counter

    from edgar_ray.pipelines.sampling import mix_by_weight, mix_weights_summary

    rows = mix_by_weight(contaminated_dir).take_all()
    summ = {r["source"]: (r["n_docs"], r["n_emitted"])
            for r in mix_weights_summary(contaminated_dir).take_all()}
    per_src = Counter(r["source"] for r in rows)
    assert set(summ) == {"web", "books", "wiki"}
    for s, (_, n_emitted) in summ.items():
        assert per_src.get(s, 0) == n_emitted
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for eps in per_doc.values():
        assert sorted(eps) == list(range(len(eps)))
    rows2 = mix_by_weight(contaminated_dir).take_all()
    key = lambda r: (r["doc_id"], r["epoch"])  # noqa: E731
    assert sorted(rows, key=key) == sorted(rows2, key=key)


def test_dedup_chunk_planted(tmp_path, ray_session):
    """A 16-word chunk copied verbatim into two otherwise-different docs is
    reported with the right occurrence count and first owner; unique docs
    contribute no rows; a within-doc repeat counts occurrences but one doc."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from edgar_ray.pipelines.dedup import dedup_chunk

    shared = " ".join(f"shared{i}" for i in range(16))
    texts = [
        shared + " " + " ".join(f"tail{i}" for i in range(16)),   # 0
        shared + " " + " ".join(f"other{i}" for i in range(16)),  # 1
        " ".join(f"unique{i}" for i in range(40)),                # 2
        shared + " " + shared,                                    # 3: twice
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))

    import hashlib
    rows = {r["chunk_hash"]: r for r in dedup_chunk(str(tmp_path)).take_all()}
    h = hashlib.md5(shared.encode()).hexdigest()
    assert h in rows
    assert rows[h]["n_occurrences"] == 4  # docs 0, 1, and twice in 3
    assert rows[h]["n_docs"] == 3
    assert rows[h]["first_doc"] == 0
    # no unique chunk leaks into the report
    uniq_h = hashlib.md5(" ".join(
        f"unique{i}" for i in range(16)).encode()).hexdigest()
    assert uniq_h not in rows


def test_repetition_signals_planted(tmp_path, ray_session):
    """Degenerate repeats score 1.0-ish; an all-distinct doc scores 0."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from edgar_ray.pipelines.text import repetition_signals

    texts = [
        "spam " * 9 + "spam",                      # one word repeated 10x
        " ".join(f"w{i}" for i in range(10)),      # all distinct
        "a b a b a b",                             # alternating bigram
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    rows = {r["doc_id"]: r for r in
            repetition_signals(str(tmp_path)).take_all()}
    assert rows[0]["dup_word_frac"] == 0.9       # 1 distinct / 10 words
    assert rows[0]["top_bigram_frac"] == 1.0     # "spam spam" x9 / 9
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[1]["top_bigram_frac"] == 1.0 / 9
    assert rows[2]["n_words"] == 6
    assert rows[2]["top_bigram_frac"] == 3.0 / 5  # "a b" 3 of 5 bigrams


def test_pack_shards_invariants(tmp_path, ray_session):
    """Shard packing: shard ids are dense from 0, contiguous in the global
    (md5 key, doc_id) order, each doc's shard = its exclusive-prefix-sum //
    budget (recomputed locally), and the assignment is identical across
    runs (partition-independent)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from edgar_ray.pipelines.sampling import _md5_low64, pack_shards

    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{rng.integers(100)}" for _ in range(rng.integers(1, 60)))
             for _ in range(400)]
    tbl = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))

    budget = 512
    rows = pack_shards(str(tmp_path), budget=budget).take_all()
    got = {r["doc_id"]: (r["n_tokens"], r["shard"]) for r in rows}
    # local reference: sort by (key, doc_id), exclusive cumsum // budget
    ids = np.arange(400)
    k = _md5_low64(ids.tolist())
    n_tok = np.array([len(t.split(" ")) for t in texts], np.int64)
    order = np.lexsort((ids, k))
    before = np.r_[0, np.cumsum(n_tok[order])[:-1]]
    for pos, d in enumerate(order):
        assert got[d] == (n_tok[d], before[pos] // budget), d
    shards = np.array([got[d][1] for d in order])
    assert shards[0] == 0
    assert ((np.diff(shards) == 0) | (np.diff(shards) == 1)).all()
    rows2 = pack_shards(str(tmp_path), budget=budget).take_all()
    assert sorted(rows, key=lambda r: r["doc_id"]) == \
        sorted(rows2, key=lambda r: r["doc_id"])


# -- round-4 byte-kernel parity (vectorized twins vs scalar references) ------

def _random_texts(seed=11, n=2000):
    import random
    import string

    rng = random.Random(seed)
    chars = (string.ascii_letters + string.digits
             + " \t\n\v\f\r.,;:!?()@#$%-_'\"" + "\x1c\x1d\x1e\x1f")
    out = ["".join(rng.choice(chars) for _ in range(rng.randrange(0, 300)))
           for _ in range(n)]
    # multi-byte UTF-8 (continuation bytes must not double-count), plus the
    # degenerate shapes
    out += ["", " ", "   ", "a", "\t\n", "x " * 5, "é" * 3, "中 文 字",
            "mixé tökens 中文", BASE]
    return out


# ASCII-explicit TokenCounter boundary cases: fullwidth digits count one
# piece per char (not one [0-9]+ run); non-ASCII whitespace (NBSP, EM SPACE)
# is a piece, not a separator; \x1c-\x1f are ASCII whitespace. These chars
# diverge from len(s.split()) by design, so they are NOT in _random_texts
# (the token_count kernel documents that boundary instead).
PIECES_BOUNDARY = ["\uff11\uff12\uff13", "a\u00a0b", "x\u2003y",
                   "12\uff13 4", "a\x1cb\x1fc"]


def _as_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_count_kernel_parity():
    from edgar_ray.pipelines.text import _token_count_batch, token_count_rows

    texts = _random_texts()
    got = _token_count_batch(_as_table(texts))["n_tokens"].to_pylist()
    assert got == token_count_rows(texts)


def test_token_pieces_kernel_parity():
    from edgar_ray.pipelines.text import TokenCounter

    tc = TokenCounter()
    texts = _random_texts(seed=12) + PIECES_BOUNDARY
    got = tc(_as_table(texts))["n_pieces"].to_pylist()
    assert got == tc.count_pieces_rows(texts)


def test_fingerprint_batch_parity():
    from edgar_ray.pipelines.text import Fingerprinter

    f = Fingerprinter()
    texts = _random_texts(seed=13, n=500)
    # include docs shorter than k and exactly k/window boundary lengths
    texts += ["abc", "a" * 8, "a" * 23, "b" * 24, BASE * 3]
    batch = f.fingerprint_batch(_as_table(texts)["text"])
    for i, s in enumerate(texts):
        assert [int(x) for x in batch[i]] == [int(x) for x in f.fingerprint(s)], i


def test_minhash_nonascii_planted_pair(tmp_path, ray_session):
    """Pins the byte-level tokenizer's behavior on non-ASCII text: a planted
    Cyrillic near-dup pair (one word changed out of ~90) is recalled by
    MinHash+LSH, and identical non-ASCII byte content yields identical
    signatures (the documented guarantee of _word_hash_batch)."""
    import numpy as np

    from edgar_ray.pipelines.dedup import MinHasher, dedup_minhash_lsh

    ru = ("данные обучение корпус модель язык токен слово документ "
          "частота анализ система вектор матрица граф число очень "
          "большой маленький быстрый медленный новый старый ").split()
    base = " ".join(ru * 4)
    texts = [base, base.replace("матрица", "матрицы", 1),
             "совсем другой документ о прочем " * 5]
    rng = np.random.default_rng(5)
    for i in range(3, 40):
        texts.append(" ".join(rng.choice(ru, size=50).tolist()) + f" doc{i}")
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    pairs = dedup_minhash_lsh(str(tmp_path)).to_pandas()
    assert (1, 0) in set(zip(pairs["id_b"], pairs["id_a"])) or \
        (0, 1) in set(zip(pairs["id_a"], pairs["id_b"]))
    # identical bytes -> identical signature, regardless of script
    mh = MinHasher()
    s = mh.signatures(pa.array([base, base, base + " хвост"], pa.string()))
    assert (s[0] == s[1]).all() and not (s[0] == s[2]).all()


def test_dedup_incremental_planted(tmp_path, ray_session):
    """Incoming docs that duplicate a base doc report the min base doc_id;
    unseen incoming docs report -1; base docs never appear in the output."""
    from edgar_ray.pipelines.dedup import dedup_incremental

    texts = {
        0: "shared corpus boilerplate text",     # base
        2: "shared corpus boilerplate text",     # base dup of 0 (min wins)
        4: "unique base document",               # base
        1: "shared corpus boilerplate text",     # incoming dup -> 0
        3: "fresh incoming document",            # incoming, unseen -> -1
        5: "unique base document",               # incoming dup -> 4
    }
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[k] for k in sorted(texts)],
                                     pa.string())})
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    out = dedup_incremental(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 3, 5]
    assert out["dup_of"].tolist() == [0, -1, 4]


def test_compression_ratio_orders_repetition(tmp_path, ray_session):
    """Templated/repetitive text compresses below prose; empty docs get the
    1.0 sentinel; ratios are deterministic across runs."""
    from edgar_ray.pipelines.text import compression_ratio

    texts = ["spam spam spam " * 50,
             BASE,  # prose
             "",
             "x" * 4000]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    out = compression_ratio(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    r = out["compression_ratio"]
    assert r[0] < r[1]          # repetition compresses below prose
    assert r[3] < r[0]          # constant run compresses best
    assert r[2] == 1.0          # empty sentinel
    out2 = compression_ratio(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["compressed_bytes"] == out2["compressed_bytes"]).all()


def test_normalize_text_nfc_branch(tmp_path, ray_session):
    """The shipped corpora are ASCII, so the oracle never exercises NFC;
    plant decomposed/composed pairs and non-ASCII whitespace and compare
    against the scalar spec (unicodedata + lower + RE2-equivalent)."""
    import re
    import unicodedata

    import pyarrow.parquet as pq2

    from edgar_ray.pipelines.text import normalize_text

    texts = ["Café  DELUXE", "café deluxe", "  A\tB\nC  ",
             "ASCII only  here", "", "MIXéd́ CaSe",
             "nbsp stays"]
    d = tmp_path / "docs"
    d.mkdir()
    pq2.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(d / "documents.parquet"))
    got = {r["doc_id"]: r["norm_text"]
           for r in normalize_text(str(d)).take_all()}
    for i, s in enumerate(texts):
        # RE2 \s is ASCII-only (both the Arrow kernel and the DuckDB twin
        # are RE2) — the scalar spec must match that, so NBSP survives
        want = re.sub(r"[ \t\n\r\f\v]+", " ",
                      unicodedata.normalize("NFC", s).lower()).strip(" ")
        assert got[i] == want, (i, got[i], want)
    # composed == decomposed after NFC
    assert got[0] == got[1]
