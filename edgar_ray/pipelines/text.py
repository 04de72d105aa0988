"""Text-analysis pipelines over ``documents``: language-ID, quality scoring,
token counting, document fingerprinting. All stateful setup (compiled
regexes, n-gram profiles, stopword sets) happens once per actor in
``__init__``; per-batch work is vectorized pandas/numpy string kernels.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.cache import cached_instance as _cached


def _docs(sf_dir: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ASCII whitespace bytes of Python ``str.split()`` (every c < 128 with
# c.isspace(): \t \n \v \f \r \x1c-\x1f space). Non-ASCII Unicode whitespace
# (U+00A0, U+2003, ...) is multi-byte in UTF-8 and treated as a regular
# character by the byte kernels below — a documented divergence from
# ``str.split()`` that cannot occur on the single-space/newline-separated
# oracle corpora (the scalar twins in the parity tests pin this).
_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[[9, 10, 11, 12, 13, 28, 29, 30, 31, 32]] = True


def _runs_per_doc(mask: np.ndarray, starts: np.ndarray,
                  ends: np.ndarray) -> np.ndarray:
    """Count of maximal True runs per doc over a concatenated byte buffer;
    runs break at doc boundaries (adjacent docs never merge)."""
    rs_mask = mask.copy()
    rs_mask[1:] &= ~mask[:-1]  # run starts, ignoring doc boundaries
    ds_idx = starts[ends > starts]  # a doc's first byte always starts a run
    rs_mask[ds_idx] = mask[ds_idx]
    rs = np.nonzero(rs_mask)[0]
    return np.searchsorted(rs, ends) - np.searchsorted(rs, starts)


def _token_count_batch(t: pa.Table) -> pa.Table:
    """Whitespace token counts = number of maximal non-whitespace byte runs
    per doc — one vectorized pass over the batch's UTF-8 buffer (zero-copy
    from Arrow), no per-row Python. Output-identical to ``len(s.split())``
    for ASCII-whitespace text (parity-tested against the scalar twin)."""
    n = t.num_rows
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})
    data, starts, ends = _utf8_buffers(t["text"])
    if len(data) == 0:
        counts = np.zeros(n, np.int64)
    else:
        # complement of _WS_LUT as a comparison chain (2x the LUT gather's
        # throughput on this box's memory system)
        nonws = ((data > 32) | (data < 9)
                 | ((data >= 14) & (data <= 27)))
        counts = _runs_per_doc(nonws, starts, ends)
    return pa.table({"doc_id": t["doc_id"],
                     "n_tokens": pa.array(counts, pa.int64())})


def token_count_rows(texts: list[str]) -> list[int]:
    """Scalar twin (the original per-row implementation), kept as the parity
    reference for the byte kernel."""
    return [len(s.split()) for s in texts]


def token_count(sf_dir: str):
    """Whitespace token counts per document (the BPE-ish regex twin is in
    TokenCounter). Matches the DuckDB oracle's regexp_split_to_array."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _token_count_batch, batch_format="pyarrow", batch_size=4096)


class TokenCounter:
    """BPE-ish subword token estimate: alphabetic runs + ASCII-digit runs +
    one piece per other non-(ASCII-space) character. The contract is
    ASCII-EXPLICIT on digits and whitespace — ``[A-Za-z]+|[0-9]+|[^ \\t\\n
    \\v\\f\\r\\x1c-\\x1fA-Za-z0-9]`` — so non-ASCII digits (e.g. fullwidth
    '１２３') count one piece PER CHARACTER and non-ASCII Unicode whitespace
    (U+00A0, U+2003, ...) counts as a piece rather than a separator, in both
    the byte kernel and the scalar twin (same boundary as the ``_WS_LUT``
    note above). The batch kernel is one vectorized pass over the batch's
    UTF-8 buffer: run counting like :func:`_token_count_batch` for the two
    run classes, plus a positional count of other non-continuation bytes
    (so a multi-byte UTF-8 char counts once, like the regex). The compiled
    regex stays as the scalar parity twin (``count_pieces_rows``)."""

    def __init__(self):
        self.pat = re.compile(
            r"[A-Za-z]+|[0-9]+|[^ \t\n\v\f\r\x1c-\x1fA-Za-z0-9]")

    def count_pieces_rows(self, texts: list[str]) -> list[int]:
        """Scalar twin (the original per-row implementation)."""
        return [len(self.pat.findall(s)) for s in texts]

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_pieces": pa.array([], pa.int64())})
        data, starts, ends = _utf8_buffers(t["text"])
        if len(data) == 0:
            counts = np.zeros(n, np.int64)
        else:
            alpha = ((data >= 65) & (data <= 90)) | ((data >= 97)
                                                     & (data <= 122))
            digit = (data >= 48) & (data <= 57)
            other = (~(alpha | digit | _WS_LUT[data])
                     & ((data & 0xC0) != 0x80))
            op = np.nonzero(other)[0]
            counts = (_runs_per_doc(alpha, starts, ends)
                      + _runs_per_doc(digit, starts, ends)
                      + (np.searchsorted(op, ends)
                         - np.searchsorted(op, starts)))
        return pa.table({"doc_id": t["doc_id"],
                         "n_pieces": pa.array(counts, pa.int64())})


def token_pieces(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _cached(TokenCounter)(t), batch_format="pyarrow",
        batch_size=4096,
    )


def _utf8_buffers(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy view of an Arrow string column's UTF-8 bytes: returns
    (data bytes, per-doc start offsets, per-doc end offsets). Falls back to
    an encode pass only for null-bearing columns."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count == 0 and pa.types.is_string(arr.type):
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        return data, offs[:-1], offs[1:]
    blobs = [(s or "").encode("utf-8", "ignore") for s in arr.to_pylist()]
    lengths = np.fromiter((len(b) for b in blobs), np.int64, count=len(blobs))
    ends = np.cumsum(lengths)
    return (np.frombuffer(b"".join(blobs), dtype=np.uint8),
            ends - lengths, ends)


class QualityScorer:
    """Heuristic quality signals (C4/Gopher-style, public recipes): length,
    mean word length, stopword ratio, punctuation density.

    One vectorized byte pass over the batch's concatenated UTF-8 buffer
    (zero-copy from Arrow; the ``classify_batch`` technique): word runs =
    maximal ``[a-z']`` spans of the lowercased bytes split at doc
    boundaries; stopword membership = zero-padded first-8-bytes uint64 keys
    matched with np.isin (exact — every stopword is <= 5 chars, so a key
    collides only with the identical word); char counts = bytes minus UTF-8
    continuation bytes (== Python ``len(str)``). Output-identical to
    :meth:`score_frame`, the scalar pandas twin kept for parity tests."""

    STOPWORDS = frozenset(
        "the of and to in a is that it for on as with be at by an are this "
        "from or have was not but had they you which one all we can her his".split()
    )

    _PUNCT = frozenset(b".,;:!?")

    def __init__(self):
        self.word = re.compile(r"[a-z']+")
        self.punct = re.compile(r"[.,;:!?]")
        # zero-padded big-endian byte keys; all stopwords are <= 8 bytes
        self.stop_keys = np.sort(np.array(
            [int.from_bytes(w.encode().ljust(8, b"\0"), "big")
             for w in self.STOPWORDS], dtype=np.uint64))
        self.punct_lut = np.zeros(256, dtype=bool)
        self.punct_lut[list(self._PUNCT)] = True

    # sub-batch size: keeps every temporary array a few MB so allocations
    # stay inside the allocator's reuse window — one monolithic pass over a
    # huge batch spends more time first-touch page-faulting fresh mmap'd
    # temporaries than computing (measured 3.5-4x on 100k-doc batches)
    CHUNK = 4096

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows > self.CHUNK:
            return pa.concat_tables(
                [self._score(t.slice(i, self.CHUNK))
                 for i in range(0, t.num_rows, self.CHUNK)])
        return self._score(t)

    def _score(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        data, starts, ends = _utf8_buffers(t["text"])
        nbytes = len(data)
        lengths = ends - starts
        nonempty = lengths > 0
        is_doc_start = np.zeros(nbytes + 1, dtype=bool)
        is_doc_start[starts[nonempty]] = True
        is_doc_last = np.zeros(nbytes + 1, dtype=bool)
        is_doc_last[ends[nonempty] - 1] = True
        lower = np.where((data >= 65) & (data <= 90), data + 32, data)
        w = ((lower >= 97) & (lower <= 122)) | (lower == 39)  # [a-z']
        # word runs break at doc boundaries (the buffer is concatenated)
        prev_w = np.r_[False, w[:-1]]
        next_w = np.r_[w[1:], False]
        run_start = w & (~prev_w | is_doc_start[:nbytes])
        run_end = w & (~next_w | is_doc_last[:nbytes])
        rs = np.nonzero(run_start)[0]
        re_ = np.nonzero(run_end)[0]
        word_len = re_ - rs + 1
        # per-doc aggregation by BOUNDARY search (O(docs log words), not a
        # per-word doc lookup): words never span docs, so doc d owns word
        # indices [wstart[d], wend[d])
        wstart = np.searchsorted(rs, starts)
        wend = np.searchsorted(rs, ends)
        n_words = wend - wstart
        cum_wl = np.r_[0, np.cumsum(word_len)]
        sum_len = (cum_wl[wend] - cum_wl[wstart]).astype(np.float64)
        # stopword keys: first 8 bytes zero-padded; only words <= 8 bytes
        # can match (stopwords are <= 5, so padding zeroes are decisive).
        # Built as 8 shifted 1D passes over the short-word subset — a 2D
        # (n_words, 8) gather allocates ~70 bytes/word of int64 temporaries
        # and is memory-bound at big batches.
        n_stop = np.zeros(n, dtype=np.int64)
        cand = np.nonzero(word_len <= 8)[0]
        if len(cand):
            crs = rs[cand]
            clen = word_len[cand]
            keys = np.zeros(len(cand), dtype=np.uint64)
            for k in range(8):
                b = np.where(k < clen,
                             lower[np.minimum(crs + k, nbytes - 1)], 0)
                keys = (keys << np.uint64(8)) | b.astype(np.uint64)
            pos = np.searchsorted(self.stop_keys, keys)
            pos_c = np.minimum(pos, len(self.stop_keys) - 1)
            hit_words = cand[self.stop_keys[pos_c] == keys]  # sorted
            n_stop = (np.searchsorted(hit_words, wend)
                      - np.searchsorted(hit_words, wstart))
        pp = np.nonzero(self.punct_lut[data])[0]
        n_punct = np.searchsorted(pp, ends) - np.searchsorted(pp, starts)
        cont = np.nonzero((data & 0xC0) == 0x80)[0]
        n_cont = np.searchsorted(cont, ends) - np.searchsorted(cont, starts)
        n_chars = lengths - n_cont
        nw_floor = np.maximum(n_words, 1)
        mean_word_len = np.where(n_words > 0, sum_len / nw_floor, 0.0)
        stop_ratio = n_stop / nw_floor
        punct_per_100 = n_punct / nw_floor * 100.0
        quality_ok = ((n_chars >= 50) & (mean_word_len >= 2.5)
                      & (mean_word_len <= 12.0) & (stop_ratio >= 0.05))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "punct_per_100": pa.array(punct_per_100, pa.float64()),
            "quality_ok": pa.array(quality_ok, pa.bool_()),
        })

    def score_frame(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Scalar pandas twin (the original per-row implementation), kept as
        the parity reference for the vectorized byte-pass kernel."""
        texts = batch["text"]
        lower = texts.str.lower()
        words = lower.map(self.word.findall)
        n_words = words.map(len).clip(lower=1)
        batch = batch[["doc_id"]].copy()
        batch["n_chars"] = texts.str.len()
        batch["n_words"] = words.map(len)
        batch["mean_word_len"] = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        batch["stop_ratio"] = words.map(
            lambda ws: sum(w in self.STOPWORDS for w in ws) / max(1, len(ws))
        )
        batch["punct_per_100"] = texts.map(lambda s: len(self.punct.findall(s))) / n_words * 100.0
        batch["quality_ok"] = (
            (batch["n_chars"] >= 50)
            & (batch["mean_word_len"].between(2.5, 12.0))
            & (batch["stop_ratio"] >= 0.05)
        )
        return batch

    @staticmethod
    def pipeline(sf_dir: str):
        return _docs(sf_dir, ["doc_id", "text"]).map_batches(
            lambda b: _cached(QualityScorer)(b), batch_format="pyarrow",
            batch_size=4096,
        )


def quality_scores(sf_dir: str):
    return QualityScorer.pipeline(sf_dir)


def quality_filter(sf_dir: str, lo: int = 100, hi: int = 20000):
    """Oracle-checkable slice of the quality gate: length band + lang=en
    (the SQL-expressible component; the full scorer is quality_scores)."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "n_chars", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["n_chars"], pa.scalar(lo, pa.int64())),
                    pc.less_equal(t["n_chars"], pa.scalar(hi, pa.int64()))),
            pc.equal(t["lang"], pa.scalar("en")),
        )
        return t.filter(m).select(["doc_id", "n_chars"])

    return ds.map_batches(keep, batch_format="pyarrow")


class LangId:
    """Character-n-gram language heuristic (public trigram-profile approach):
    profiles for a few languages built once per actor; classification =
    cosine over trigram count vectors, 'und' when too short."""

    PROFILES = {
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

    _V = 27 ** 3  # trigram code space: letters mapped to 0..25, base 27

    def __init__(self):
        self.word = re.compile(r"[a-z]+")
        self.profiles = {}
        self.langs = list(self.PROFILES)
        # dense per-language profile vectors over the trigram-code space —
        # built once per actor; per-batch scoring is then one gather + one
        # segment-reduce instead of a Python dict walk per document
        self.prof_dense = np.zeros((len(self.langs), self._V))
        for li, (lang, toks) in enumerate(self.PROFILES.items()):
            grams: dict[str, float] = {}
            for tk in toks.split():
                for i in range(len(tk) - 2):
                    g = tk[i:i + 3]
                    grams[g] = grams.get(g, 0.0) + 1.0
            norm = np.sqrt(sum(v * v for v in grams.values()))
            self.profiles[lang] = {g: v / norm for g, v in grams.items()}
            for g, v in self.profiles[lang].items():
                code = ((ord(g[0]) - 97) * 729 + (ord(g[1]) - 97) * 27
                        + (ord(g[2]) - 97))
                self.prof_dense[li, code] = v

    def classify(self, text: str) -> str:
        text = " ".join(self.word.findall(text.lower()))
        if len(text) < 20:
            return "und"
        grams: dict[str, float] = {}
        for i in range(len(text) - 2):
            g = text[i:i + 3]
            if " " in g:
                continue
            grams[g] = grams.get(g, 0.0) + 1.0
        norm = np.sqrt(sum(v * v for v in grams.values())) or 1.0
        best, best_s = "und", 0.0
        for lang, prof in self.profiles.items():
            s = sum(v * prof.get(g, 0.0) for g, v in grams.items()) / norm
            if s > best_s:
                best, best_s = lang, s
        return best if best_s > 0.05 else "und"

    def classify_batch(self, texts: list[str]) -> list[str]:
        """Vectorized batch classification, output-identical to
        :meth:`classify` per doc: one byte pass over the concatenated batch
        computes per-doc normalized length, per-(doc, trigram) counts
        (np.unique over composite int keys), doc norms and all language
        dot-products via segment reduces — no per-document Python loop."""
        n = len(texts)
        if n == 0:
            return []
        blobs = [s.encode("utf-8", "ignore") for s in texts]
        sep = b"\x00"
        data = np.frombuffer(sep.join(blobs) + sep, dtype=np.uint8)
        lengths = np.array([len(b) for b in blobs], dtype=np.int64)
        ends = np.cumsum(lengths + 1)  # position of each doc's separator
        # lowercase + letter mask (ASCII; multi-byte utf-8 bytes are
        # non-letters, exactly like the regex [a-z]+ on the decoded string
        # treats non-ascii chars as separators)
        lower = np.where((data >= 65) & (data <= 90), data + 32, data)
        letter = (lower >= 97) & (lower <= 122)
        pos = np.arange(len(data), dtype=np.int64)
        doc_of = np.searchsorted(ends, pos, side="right")
        # normalized length = letters + (runs - 1) single-space gaps
        letters_per_doc = np.bincount(doc_of[letter], minlength=n)
        run_start = letter & np.r_[True, ~letter[:-1]]
        runs_per_doc = np.bincount(doc_of[run_start], minlength=n)
        norm_len = letters_per_doc + np.maximum(runs_per_doc - 1, 0)
        # trigram codes at every position whose 3 bytes are letters (word
        # boundaries/doc separators are non-letters and break the window)
        tri_ok = letter[:-2] & letter[1:-1] & letter[2:]
        ti = np.nonzero(tri_ok)[0]
        out = np.full(n, "und", dtype=object)
        if len(ti):
            l0 = (lower[ti] - 97).astype(np.int64)
            l1 = (lower[ti + 1] - 97).astype(np.int64)
            l2 = (lower[ti + 2] - 97).astype(np.int64)
            code = l0 * 729 + l1 * 27 + l2
            key = doc_of[ti] * np.int64(self._V) + code
            uk, cnt = np.unique(key, return_counts=True)
            kdoc = uk // self._V
            kgram = uk % self._V
            cntf = cnt.astype(np.float64)
            starts = np.nonzero(np.r_[True, kdoc[1:] != kdoc[:-1]])[0]
            seg_docs = kdoc[starts]
            norms = np.sqrt(np.add.reduceat(cntf * cntf, starts))
            norms[norms == 0] = 1.0
            scores = np.empty((len(self.langs), len(starts)))
            for li in range(len(self.langs)):
                scores[li] = np.add.reduceat(
                    cntf * self.prof_dense[li, kgram], starts) / norms
            best = np.argmax(scores, axis=0)
            best_s = scores[best, np.arange(len(starts))]
            ok = (best_s > 0.05) & (norm_len[seg_docs] >= 20)
            lang_arr = np.asarray(self.langs, dtype=object)
            out[seg_docs[ok]] = lang_arr[best[ok]]
        return out.tolist()

    def __call__(self, t: pa.Table) -> pa.Table:
        langs = self.classify_batch(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"],
                         "lang_pred": pa.array(langs, pa.string()),
                         "lang": t["lang"]})


def langid(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        lambda t: _cached(LangId)(t), batch_format="pyarrow", batch_size=2048
    )


class Fingerprinter:
    """Winnowing-style rolling-hash fingerprint (public algorithm — Schleimer
    et al., SIGMOD 2003): k-gram rolling hashes, minimum per window, distinct
    sorted mins as the doc fingerprint; plus a single stable content hash."""

    def __init__(self, k: int = 8, window: int = 16):
        self.k = k
        self.window = window

    _B = np.uint64(0x100000001B3)
    _BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))

    def fingerprint(self, text: str) -> list[int]:
        """Vectorized: polynomial rolling k-gram hash (sliding window view x
        precomputed base powers, uint64 wraparound), then a sliding-window
        minimum — no per-offset hashlib calls."""
        data = np.frombuffer(text.encode(), dtype=np.uint8)
        if len(data) == 0:
            return []
        if len(data) < self.k:
            h = hashlib.blake2b(data.tobytes(), digest_size=8).digest()
            return [int.from_bytes(h, "big")]
        win = np.lib.stride_tricks.sliding_window_view(data, self.k)
        powers = self._B ** np.arange(self.k - 1, -1, -1, dtype=np.uint64)
        hs = (win.astype(np.uint64) * powers[None, :]).sum(
            axis=1, dtype=np.uint64)
        # avalanche so byte-local k-grams spread over the full 64-bit space
        hs ^= hs >> np.uint64(33)
        hs *= np.uint64(0xFF51AFD7ED558CCD)
        hs ^= hs >> np.uint64(33)
        if len(hs) <= self.window:
            return [int(hs.min())]
        mins = np.lib.stride_tricks.sliding_window_view(
            hs, self.window).min(axis=1)
        return np.unique(mins)[:64].tolist()

    def _kgram_hashes(self, data: np.ndarray) -> np.ndarray:
        """Avalanched k-gram hashes for EVERY position of a byte buffer,
        value-identical to :meth:`fingerprint`'s per-doc sliding-window
        product-sum: hash(s) = fmix-ish(sum_j data[s+j] * B^(k-1-j) mod
        2^64), computed from an inverse-power prefix sum so the cost is
        O(bytes), not O(bytes * k). B is odd, hence invertible mod 2^64,
        so the prefix-difference form is exact."""
        nb = len(data)
        k = self.k
        ipows = np.empty(nb, dtype=np.uint64)
        ipows[0] = 1
        if nb > 1:
            np.cumprod(np.full(nb - 1, self._BINV, dtype=np.uint64),
                       out=ipows[1:])
        pows = np.empty(nb, dtype=np.uint64)
        pows[0] = 1
        if nb > 1:
            np.cumprod(np.full(nb - 1, self._B, dtype=np.uint64),
                       out=pows[1:])
        pref = np.zeros(nb + 1, dtype=np.uint64)
        np.cumsum(data.astype(np.uint64) * ipows, out=pref[1:])
        s = np.arange(nb - k + 1)
        hs = ((pref[s + k] - pref[s]) * pows[s]
              * (self._B ** np.uint64(k - 1)))
        hs ^= hs >> np.uint64(33)
        hs *= np.uint64(0xFF51AFD7ED558CCD)
        hs ^= hs >> np.uint64(33)
        return hs

    # doc-aligned buffer chunk: keeps the ~24 B/byte prefix temporaries a
    # few tens of MB (same rationale as _word_hash_batch)
    CHUNK_BYTES = 1 << 20

    def fingerprint_batch(self, col) -> list[np.ndarray]:
        """Whole-batch twin of :meth:`fingerprint` (the scalar parity
        reference): k-gram hashes for the batch's concatenated UTF-8 buffer
        in one pass per chunk, doc-local sliding-window minima, per-doc
        sorted-distinct cap-64 via one lexsort — no per-document rolling-
        hash loop. Returns one uint64 array per doc, bit-identical to the
        scalar method."""
        data, starts, ends = _utf8_buffers(col)
        n = len(starts)
        lengths = ends - starts
        k, W = self.k, self.window
        out: list[np.ndarray] = [np.empty(0, np.uint64)] * n
        # short docs (0 < len < k): blake2b fallback, rare by construction
        for d in np.nonzero((lengths > 0) & (lengths < k))[0]:
            h = hashlib.blake2b(data[starts[d]:ends[d]].tobytes(),
                                digest_size=8).digest()
            out[d] = np.array([int.from_bytes(h, "big")], dtype=np.uint64)
        longd = np.nonzero(lengths >= k)[0]
        d0 = 0
        while d0 < len(longd):
            d1 = int(np.searchsorted(ends[longd],
                                     ends[longd[d0]] + self.CHUNK_BYTES,
                                     side="left"))
            d1 = min(max(d1, d0 + 1), len(longd))
            docs = longd[d0:d1]
            lo = starts[docs[0]]
            hs = self._kgram_hashes(data[lo:ends[docs[-1]]])
            s_l = starts[docs] - lo
            m = lengths[docs] - k + 1  # k-gram count per doc
            a = m <= W  # single-min docs
            if a.any():
                am, as_ = m[a], s_l[a]
                offs = np.r_[0, np.cumsum(am)[:-1]]
                idx = np.arange(int(am.sum())) + np.repeat(as_ - offs, am)
                mins = np.minimum.reduceat(hs[idx], offs)
                for i, d in enumerate(docs[a]):
                    out[d] = mins[i:i + 1]
            b = ~a
            if b.any():
                smins = np.lib.stride_tricks.sliding_window_view(
                    hs, W).min(axis=1)
                bm, bs = m[b] - W + 1, s_l[b]
                offs = np.r_[0, np.cumsum(bm)[:-1]]
                idx = np.arange(int(bm.sum())) + np.repeat(bs - offs, bm)
                v = smins[idx]
                doc_of = np.repeat(np.arange(len(bm)), bm)
                order = np.lexsort((v, doc_of))
                vs, ds_ = v[order], doc_of[order]
                newv = np.r_[True, (ds_[1:] != ds_[:-1])
                             | (vs[1:] != vs[:-1])]
                uv, ud = vs[newv], ds_[newv]
                # per-doc ascending rank -> np.unique(mins)[:64] cap
                dstarts = np.r_[0, np.nonzero(ud[1:] != ud[:-1])[0] + 1]
                dcounts = np.diff(np.r_[dstarts, len(uv)])
                rank = np.arange(len(uv)) - np.repeat(dstarts, dcounts)
                uv, ud = uv[rank < 64], ud[rank < 64]
                counts = np.bincount(ud, minlength=len(bm))
                offs2 = np.r_[0, np.cumsum(counts)]
                for i, d in enumerate(docs[b]):
                    out[d] = uv[offs2[i]:offs2[i + 1]]
            d0 = d1
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = self.fingerprint_batch(t["text"])
        counts = np.fromiter((len(f) for f in fps), np.int64,
                             count=len(fps))
        flat = (np.concatenate(fps) if fps else np.empty(0, np.uint64))
        # (f - 2^63) mod 2^64 reinterpreted as int64 == int(f) - 2^63
        vals = (flat - np.uint64(1 << 63)).view(np.int64)
        offsets = np.zeros(len(fps) + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        fp_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                          pa.array(vals, pa.int64()))
        return pa.table({
            "doc_id": t["doc_id"],
            "fingerprint": fp_col,
            "n_fp": pa.array(counts, pa.int64()),
        })


def fingerprints(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _cached(Fingerprinter)(t), batch_format="pyarrow",
        batch_size=1024,
    )


def _fingerprint_summary_batch(t: pa.Table) -> pa.Table:
    """Scalar projection of the winnowing fingerprint (driver-hash-checkable
    where the list<int64> column is not): count, minimum and xor-fold of the
    per-doc fingerprint mins. Empty fingerprints emit 0 sentinels."""
    fps = _cached(Fingerprinter).fingerprint_batch(t["text"])
    n = len(fps)
    counts = np.fromiter((len(f) for f in fps), np.int64, count=n)
    mins = np.zeros(n, np.uint64)
    xors = np.zeros(n, np.uint64)
    for i, f in enumerate(fps):
        if len(f):
            mins[i] = f[0]  # per-doc mins are sorted ascending
            xors[i] = np.bitwise_xor.reduce(f)
    shift = np.uint64(1 << 63)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_fp": pa.array(counts, pa.int64()),
        "fp_min": pa.array(np.where(counts > 0, (mins - shift),
                                    np.uint64(0)).view(np.int64), pa.int64()),
        "fp_xor": pa.array(np.where(counts > 0, (xors - shift),
                                    np.uint64(0)).view(np.int64), pa.int64()),
    })


def fingerprint_summary(sf_dir: str):
    """Driver-facing fingerprint op: same kernel as :func:`fingerprints`,
    scalar summary columns so the value-hash oracle (a per-tier golden from
    the independent scalar evaluator, sources/tier_goldens.py) applies."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _fingerprint_summary_batch, batch_format="pyarrow", batch_size=1024)


# -- compression-ratio signal ------------------------------------------------


def compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (compressed/raw bytes) — the standard
    cheap boilerplate/template detector in web curation stacks (highly
    repetitive or templated text compresses far below prose). Doc-local map,
    zlib runs at C speed per row; deterministic for a fixed level so the
    stability/ordering properties are test-pinned (rows-only by nature:
    no SQL engine exposes zlib)."""
    import zlib

    def score(t: pa.Table) -> pa.Table:
        data, starts, ends = _utf8_buffers(t["text"])
        mv = memoryview(data)
        raw = (ends - starts).astype(np.int64)
        comp = np.fromiter(
            (len(zlib.compress(mv[a:b], 6)) for a, b in zip(starts, ends)),
            np.int64, count=t.num_rows)
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return pa.table({
            "doc_id": t["doc_id"],
            "raw_bytes": pa.array(raw, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
            "compression_ratio": pa.array(ratio, pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", batch_size=4096)


# -- repetition signals (Gopher-style) --------------------------------------

def repetition_signals(sf_dir: str):
    """Per-document repetition signals from the Gopher/Dolma quality
    recipes: ``dup_word_frac`` (1 - distinct words / words) and
    ``top_bigram_frac`` (occurrences of the most frequent word bigram /
    total bigrams). Doc-local, so it scales embarrassingly: one
    ``map_batches`` stage, no shuffle.

    Vectorized via Arrow: ``split_pattern`` on single spaces (the DuckDB
    ``string_split`` contract), ``dictionary_encode`` for exact C-side word
    identity (no hash collisions to break oracle equality), then numpy
    segment reductions over (doc, code) and (doc, bigram-key) sort orders."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow")


def _repetition_batch(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = t.num_rows
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_words": pa.array([], pa.int64()),
            "dup_word_frac": pa.array([], pa.float64()),
            "top_bigram_frac": pa.array([], pa.float64()),
        })
    words = pc.split_pattern(t["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = np.frombuffer(words.buffers()[1], dtype=np.int32)[
        words.offset: words.offset + n + 1].astype(np.int64)
    flat = words.flatten()
    codes = pc.dictionary_encode(flat).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_words = np.diff(offs)          # every doc has >= 1 word
    doc = np.repeat(np.arange(n), n_words)
    # distinct words per doc: count (doc, code) runs
    order = np.lexsort((codes, doc))
    d_s, c_s = doc[order], codes[order]
    new = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
    n_distinct = np.add.reduceat(new, offs[:-1])
    # bigram runs per doc (pairs that don't straddle a doc boundary)
    within = doc[1:] == doc[:-1]
    v = np.int64(codes.max()) + 1
    bkey = codes[:-1][within] * v + codes[1:][within]
    bdoc = doc[:-1][within]
    top = np.zeros(n, np.float64)
    if len(bkey):
        order2 = np.lexsort((bkey, bdoc))
        bd, bk = bdoc[order2], bkey[order2]
        new2 = np.r_[True, (bd[1:] != bd[:-1]) | (bk[1:] != bk[:-1])]
        run_starts = np.nonzero(new2)[0]
        run_len = np.diff(np.r_[run_starts, len(bk)])
        run_doc = bd[run_starts]
        doc_starts = np.r_[0, np.nonzero(run_doc[1:] != run_doc[:-1])[0]
                           + 1]
        present = run_doc[doc_starts]
        top[present] = (np.maximum.reduceat(run_len, doc_starts)
                        / (n_words[present] - 1.0))
    return pa.table({
        "doc_id": t["doc_id"],
        "n_words": pa.array(n_words, pa.int64()),
        "dup_word_frac": pa.array(1.0 - n_distinct / n_words,
                                  pa.float64()),
        "top_bigram_frac": pa.array(top, pa.float64()),
    })


# -- global vocabulary ------------------------------------------------------

def vocabulary(sf_dir: str, top_n: int = 200):
    """Global word-frequency table (top ``top_n`` by count desc, word asc) —
    the corpus-statistics / tokenizer-training primitive. Per-batch partial
    counts (split → ``np.unique``) are the map-side combine that keeps the
    Zipfian word key space from flooding the groupby: the shuffle ships one
    row per distinct word per block, never one per occurrence. Post-agg the
    vocabulary is small, so the desc sort + limit run on a reduced table.

    Tokenization contract (shared with the DuckDB oracle): split on single
    spaces, drop empty tokens."""
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # all-Arrow partial: split -> flatten -> C-side value_counts (24x
        # over the np.unique-on-object-words form in a same-process A/B)
        words = pc.split_pattern(t["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({
            "word": vc.field("values"),
            "n_occurrences": pc.cast(vc.field("counts"), pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("word")
           .aggregate(Sum("n_occurrences", alias_name="n_occurrences")))
    # (count desc, word asc) is a total order — the top_n cut is exact
    return (agg.sort(["n_occurrences", "word"], descending=[True, False])
            .limit(top_n))


# -- PII scrubbing ----------------------------------------------------------

# RE2-compatible patterns (no lookaround) so the Arrow compute kernels and
# the DuckDB oracle — both RE2 — match byte-for-byte. Applied in this order.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{9,19}\b", "<ID>"),
)


def pii_scrub(sf_dir: str):
    """C4-style PII redaction over ``documents``: emails, phone-shaped
    numbers and long ID digit runs replaced by typed placeholders, plus a
    per-doc redaction count. Fully Arrow-native — both the count and the
    replacement are RE2 kernels (`pyarrow.compute.count_substring_regex` /
    `replace_substring_regex`), no Python per row."""
    import pyarrow.compute as pc

    def scrub(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = np.zeros(t.num_rows, dtype=np.int64)
        for pat, repl in PII_PATTERNS:
            n += pc.count_substring_regex(col, pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
            col = pc.replace_substring_regex(col, pat, repl)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_pii": pa.array(n, pa.int64()),
            "text_clean": col,
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")


def normalize_text(sf_dir: str):
    """Canonical text normalization (the first stage of most LLM data
    recipes): Unicode NFC, lowercase, collapse whitespace runs to single
    spaces, trim. Arrow-native hot path — ``utf8_lower`` +
    ``replace_substring_regex`` + ``utf8_trim`` are C kernels; the NFC
    step detects pure-ASCII batches with one vectorized byte scan (NFC is
    the identity there — the common web-text case) and falls back to
    per-row ``unicodedata.normalize`` ONLY for rows that actually carry
    non-ASCII bytes. Oracle twin: DuckDB ``nfc_normalize`` + ``lower`` +
    RE2 ``regexp_replace`` (both sides are RE2, so ``\\s`` agrees)."""
    import unicodedata

    import pyarrow.compute as pc

    def norm(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        data, starts, ends = _utf8_buffers(col)
        if len(data) and (data >= 0x80).any():
            # NFC only where needed: per-doc non-ASCII mask via one
            # searchsorted over the non-ASCII byte positions
            nz = np.nonzero(data >= 0x80)[0]
            has = (np.searchsorted(nz, ends) - np.searchsorted(nz, starts)
                   ) > 0
            if has.any():
                vals = col.to_pylist()
                for i in np.nonzero(has)[0]:
                    vals[i] = unicodedata.normalize("NFC", vals[i])
                col = pa.array(vals, pa.string())
        col = pc.utf8_lower(col)
        col = pc.replace_substring_regex(col, r"\s+", " ")
        col = pc.utf8_trim(col, characters=" ")
        return pa.table({"doc_id": t["doc_id"], "norm_text": col})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow")
