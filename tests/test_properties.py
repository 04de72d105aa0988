"""Property-based tests (hypothesis) over the scalar kernels and state
structures: number normalization round-trips Go-style renderings, URL
canonicalization is idempotent, the cuckoo filter never false-negatives,
and the bucketed group-head equals a pandas reference implementation."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from edgar_ray.functions.parse import go_round, normalize_number
from edgar_ray.state.canonical import canonicalize, parse_cik_and_doc_id
from edgar_ray.state.cuckoo import CuckooFilter


@given(st.integers(min_value=0, max_value=10**15),
       st.integers(min_value=0, max_value=99),
       st.booleans(), st.booleans(), st.booleans())
@settings(max_examples=300, deadline=None)
def test_normalize_number_roundtrip(whole, cents, negative, dollar, commas):
    """Go-style rendered currency strings parse back to their value
    (/root/reference/utils.go:11-46 semantics)."""
    val = whole + cents / 100.0
    digits = f"{whole:,d}" if commas else str(whole)
    s = f"{digits}.{cents:02d}"
    if negative:
        s = f"({s})"
    if dollar:
        # EDGAR renders the dollar sign OUTSIDE the negativity parens:
        # "$ (1,234.50)" — "$" inside parens errors in the reference too
        s = "$ " + s
    got = normalize_number(s)
    assert abs(got - (-val if negative else val)) < 1e-6 * max(1.0, val)


@given(st.text(alphabet="0123456789,.$() _", max_size=20))
@settings(max_examples=300, deadline=None)
def test_normalize_number_never_crashes_unexpectedly(s):
    """Any garbage either parses to a float or raises ValueError — never
    another exception type (the reference returns (0, err))."""
    try:
        v = normalize_number(s)
        assert isinstance(v, float)
    except ValueError:
        pass


@given(st.floats(min_value=-1e12, max_value=1e12,
                 allow_nan=False, allow_infinity=False))
@settings(max_examples=200, deadline=None)
def test_go_round_truncates(x):
    """go_round is floor-truncation to 2 decimals, never rounds up
    (/root/reference/utils.go:165-167)."""
    r = go_round(x)
    # float64 rounding of x*100 can push the result one ULP past x at large
    # magnitudes — Go's math.Floor(x*100)/100 behaves identically, so the
    # truncation property holds only up to relative precision
    tol = max(1e-9, abs(x) * 1e-12)
    assert r <= x + tol
    assert x - r < 0.01 + tol


_URL = st.builds(
    lambda host, path, q, frag: f"https://{host}/{path}" + (f"?{q}" if q else "") + (f"#{frag}" if frag else ""),
    st.sampled_from(["www.sec.gov", "WWW.SEC.GOV", "example.com:443"]),
    st.text(alphabet="abcdefgh0123456789/", max_size=30),
    st.text(alphabet="abc=&123", max_size=20),
    st.text(alphabet="xyz", max_size=5),
)


@given(_URL)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    c = canonicalize(url)
    assert canonicalize(c) == c
    assert "#" not in c  # fragments stripped


def test_parse_cik_and_doc_id():
    cik, acc = parse_cik_and_doc_id(
        "https://www.sec.gov/cgi-bin/viewer?action=view&cik=320193"
        "&accession_number=0001193125-15-356351&xbrl_type=v")
    assert cik == "320193"
    assert acc == "000119312515356351".zfill(18)
    assert parse_cik_and_doc_id("https://www.sec.gov/") == ("", "")


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives(keys):
    """Everything inserted is contained; re-adding reports zero fresh."""
    f = CuckooFilter(1 << 12)
    h = np.array(keys, dtype=np.uint64)
    f.add_many(h)
    if len(h):
        assert f.contains_many(h).all()
        assert not f.add_many(h).any()


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 1000),
                          st.integers(0, 1000)),
                min_size=1, max_size=300),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=50, deadline=None)
def test_bucket_head_matches_pandas(rows, k):
    """The vectorized in-bucket top-k (head_fn core) == pandas
    groupby-sort-head on any input."""
    from edgar_ray.stages.bucketing import _sort_key

    t = pa.table({
        "g": pa.array([r[0] for r in rows], pa.int64()),
        "a": pa.array([r[1] for r in rows], pa.int64()),
        "b": pa.array([r[2] for r in rows], pa.int64()),
    })
    gkeys = [_sort_key(t["g"], False)]
    skeys = [_sort_key(t["a"], True), _sort_key(t["b"], False)]
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
    keep = np.sort(order[rank < k])
    got = t.take(pa.array(keep, pa.int64())).to_pandas() \
        .sort_values(["g", "a", "b"]).reset_index(drop=True)

    want = (t.to_pandas()
            .sort_values(["a", "b"], ascending=[False, True], kind="stable")
            .groupby("g", sort=False).head(k)
            .sort_values(["g", "a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


_HTML_SOUP = st.text(
    alphabet=st.sampled_from(list(
        "<>/abctdr =\"'&;#!-\n\t table row spanclass num id onclick href")),
    max_size=400,
)


@given(_HTML_SOUP)
@settings(max_examples=200, deadline=None)
def test_parsers_never_crash_on_soup(soup):
    """The HTML walkers degrade gracefully on arbitrary input (the reference
    tokenizer never panics on malformed markup; neither may we)."""
    from edgar_ray.functions.parse import (
        extracted_text,
        filing_page_parser,
        fin_report_raw,
        query_page_parser,
    )

    for ft in ("10-K",):
        r = query_page_parser(soup, ft)
        assert isinstance(r, dict)
    assert isinstance(filing_page_parser(soup, "10-K"), dict)
    headings, rows = fin_report_raw(soup)
    assert isinstance(headings, list) and isinstance(rows, list)
    assert isinstance(extracted_text("https://x/soup.htm", soup), str)


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_parsers_accept_bytes(blob):
    from edgar_ray.functions.parse import extracted_text, fin_report_raw

    headings, rows = fin_report_raw(blob)
    assert isinstance(headings, list)
    assert isinstance(extracted_text("https://x/b.htm", blob), str)


# ---------------------------------------------------------------------------
# Round-2 kernels vs brute-force references (pure-python oracles on random
# small inputs; the distributed shape is covered by the oracle/golden tests)
# ---------------------------------------------------------------------------


def _events_table(rows):
    import numpy as np
    import pyarrow as pa

    return pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype="int64")
                       .astype("datetime64[us]")),
        "value": pa.array([float(r[1] % 7) for r in rows], pa.float64()),
    })


@given(st.lists(st.tuples(st.integers(0, 5),        # user_id
                          st.integers(0, 50),       # ts us (coarse -> ties)
                          st.sampled_from(["click", "purchase", "view"])),
                min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_asof_kernel_vs_brute(rows):
    """Vectorized as-of kernel == brute-force 'latest purchase at or before
    each click per user' (ties broken by the stable sort: latest position)."""
    from edgar_ray.pipelines.windows import bucket_asof

    got = {(r["event_id"], r["purchase_id"])
           for r in bucket_asof(_events_table(rows)).to_pylist()}
    want = set()
    for i, (u, ts, et) in enumerate(rows):
        if et != "click":
            continue
        best = None
        for j, (u2, ts2, et2) in enumerate(rows):
            if u2 == u and et2 == "purchase" and ts2 <= ts:
                if best is None or (ts2, j) >= (rows[best][1], best):
                    best = j
        if best is not None:
            want.add((i, best))
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(0, 10),       # ts in HOURS -> many ties
                          st.just("view")),
                min_size=0, max_size=40))
@settings(max_examples=60, deadline=None)
def test_sliding_window_kernel_vs_brute_with_ties(rows):
    """Trailing-1h kernel == brute force INCLUDING tied timestamps (RANGE
    frame: all equal-ts peers inside the frame) — regression for the
    peer-group bug the sf0.01 data masked."""
    import pyarrow as pa

    from edgar_ray.pipelines.windows import bucket_window

    # hours -> us so many rows tie exactly; window is 1h inclusive
    rows_us = [(u, h * 1_800_000_000, et) for u, h, et in rows]
    t = _events_table(rows_us)
    out = {r["event_id"]: (r["n_1h"], r["sum_value_1h"])
           for r in bucket_window(t).to_pylist()}
    vals = [float(ts % 7) for _, ts, _ in rows_us]
    HOUR = 3_600_000_000
    for i, (u, ts, _) in enumerate(rows_us):
        in_frame = [j for j, (u2, ts2, _) in enumerate(rows_us)
                    if u2 == u and ts - HOUR <= ts2 <= ts]
        n, sv = out[i]
        assert n == len(in_frame)
        assert abs(sv - sum(round(vals[j] * 100) / 100.0
                            for j in in_frame)) < 1e-9


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_validate_reports_batch_matches_scalar(data):
    """validate_reports_batch (the vectorized merge-stage validator) is
    value-, bit-, and error-string-identical to validate_financial_report
    run per report — including the WAShares scale override (both division
    orders, 0/0 NaN), zero-division Dps (±Inf, NaN), and generated-field
    hits and misses."""
    from edgar_ray.functions.report import (new_financial_report,
                                            validate_financial_report,
                                            validate_reports_batch)
    from edgar_ray.schema import FACT_FIELDS, STRUCT_FIELDS, fact_col

    n = data.draw(st.integers(min_value=1, max_value=40))
    # adversarial value pool: zeros (both signs), tiny/huge, negatives —
    # zeros drive the go_div Inf/NaN branches and the scale override
    pool = [0.0, -0.0, 1.0, -1.0, 3.5, 1e12, -2e9, 250.0]
    vals: dict[str, np.ndarray] = {}
    for f in FACT_FIELDS:
        vals[fact_col(f)] = np.array(
            [data.draw(st.sampled_from(pool)) for _ in range(n)], np.float64)
    bits: dict[str, np.ndarray] = {}
    for struct, fields in STRUCT_FIELDS.items():
        hi = 1 << (max(f.bit for f in fields) + 1)
        bits[struct] = np.array(
            [data.draw(st.integers(min_value=0, max_value=hi - 1))
             for _ in range(n)], np.uint64)

    # scalar expectation
    exp_vals = {c: v.copy() for c, v in vals.items()}
    exp_bits = {s: b.copy() for s, b in bits.items()}
    exp_errs = []
    for i in range(n):
        fr = new_financial_report("10-K")
        for f in FACT_FIELDS:
            fr[f.struct][f.name] = float(vals[fact_col(f)][i])
        for s in bits:
            fr[s]["CollectedData"] = int(bits[s][i])
        exp_errs.append(validate_financial_report(fr))
        for f in FACT_FIELDS:
            exp_vals[fact_col(f)][i] = fr[f.struct][f.name]
        for s in bits:
            exp_bits[s][i] = fr[s]["CollectedData"]

    got_vals = {c: v.copy() for c, v in vals.items()}
    got_bits = {s: b.copy() for s, b in bits.items()}
    got_errs = validate_reports_batch(got_vals, got_bits)

    assert list(got_errs) == exp_errs
    for s in bits:
        assert (got_bits[s] == exp_bits[s]).all(), s
    for c in vals:
        g, e = got_vals[c], exp_vals[c]
        assert ((g == e) | (np.isnan(g) & np.isnan(e))).all(), c


@given(st.lists(
    st.text(alphabet=st.sampled_from(list("ab é")), max_size=40),
    min_size=1, max_size=12))
@settings(max_examples=80, deadline=None)
def test_dedup_chunk_kernel_vs_naive(texts):
    """The zero-copy chunk-span kernel equals naive split(' ') chunking for
    ANY text — multi-space runs, leading/trailing spaces, empty docs,
    multi-byte UTF-8."""
    import hashlib
    from collections import Counter

    from edgar_ray.pipelines.dedup import _chunk_spans
    from edgar_ray.pipelines.text import _utf8_buffers

    t = pa.table({"text": pa.array(texts, pa.string())})
    want = Counter()
    for s in texts:
        words = s.split(" ")
        for j in range(0, len(words), 16):
            chunk = " ".join(words[j:j + 16])
            want[hashlib.md5(chunk.encode()).hexdigest()] += 1

    data, dstarts, dends = _utf8_buffers(t["text"])
    cdoc, a, b = _chunk_spans(data, dstarts, dends, 16)
    mv = memoryview(data)
    got = Counter(hashlib.md5(mv[lo:hi]).hexdigest()
                  for lo, hi in zip(a, b))
    assert got == want
    # every span belongs to the right doc's byte range
    assert (dstarts[cdoc] <= a).all() and (b <= dends[cdoc]).all()


@given(st.lists(
    st.text(alphabet=st.sampled_from(list("xy z")), max_size=30),
    min_size=1, max_size=10))
@settings(max_examples=80, deadline=None)
def test_repetition_kernel_vs_naive(texts):
    """_repetition_batch equals a naive Counter reference for any text,
    including multi-space runs and empty docs (string_split semantics:
    every doc has >= 1 word)."""
    from collections import Counter

    from edgar_ray.pipelines.text import _repetition_batch

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = _repetition_batch(t).to_pylist()
    for row, s in zip(out, texts):
        words = s.split(" ")
        assert row["n_words"] == len(words)
        assert row["dup_word_frac"] == 1.0 - len(set(words)) / len(words)
        if len(words) < 2:
            assert row["top_bigram_frac"] == 0.0
        else:
            bigrams = Counter(zip(words, words[1:]))
            assert row["top_bigram_frac"] == \
                max(bigrams.values()) / (len(words) - 1)


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_inwave_winners_subset_tiebreak_equals_full_sort(data):
    """The duplicate-group-restricted tie-break in _inwave_winners picks
    exactly the winners of the original one-shot full-comparator lexsort —
    including duplicate hashes with equal priority keys that differ only
    in metadata, and fully-identical copies (original-order stability)."""
    from edgar_ray.state.frontier import _TIE_COLS, _inwave_winners

    n = data.draw(st.integers(min_value=1, max_value=60))
    # small domains force plenty of hash collisions and full-key ties
    h = np.array([data.draw(st.integers(0, 7)) for _ in range(n)], np.uint64)
    prio = [np.array([data.draw(st.integers(0, 2)) for _ in range(n)],
                     np.int64) for _ in range(4)]
    # randomly DROP tie columns so the column-absent branch (hand-built
    # candidate tables) is exercised too
    present = [c for c in ("url", "doc_type", "accession", "cik", "ticker")
               if data.draw(st.booleans())] or ["url"]
    tbl = {}
    for c in present:
        tbl[c] = pa.array([f"v{data.draw(st.integers(0, 2))}"
                           for _ in range(n)], pa.string())
    t = pa.table(tbl)

    # reference: the original full-table comparator sort
    ties = []
    for c in _TIE_COLS:
        if c not in t.column_names:
            continue
        _, inv = np.unique(np.asarray(t[c].to_pylist(), dtype=object),
                           return_inverse=True)
        ties.append(inv.astype(np.int64))
    order = np.lexsort(tuple(reversed(ties))
                       + (prio[3], prio[2], prio[1], prio[0], h))
    hs = h[order]
    first = np.r_[True, hs[1:] != hs[:-1]]
    want = order[first]

    got, dups = _inwave_winners(t, h, prio)
    assert dups == n - len(want)
    assert np.array_equal(np.sort(got), np.sort(want))
    assert np.array_equal(got, want)  # same comparator order too


# -- round-4 byte-kernel parity under hypothesis ------------------------------

_KTEXT = st.lists(
    st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            max_size=80),
    min_size=1, max_size=24)


@given(_KTEXT)
@settings(max_examples=60, deadline=None)
def test_token_count_kernel_matches_split(texts):
    """The whitespace byte kernel equals len(s.split()) whenever the text
    has no non-ASCII Unicode whitespace (the documented boundary)."""
    import pyarrow as pa

    from edgar_ray.pipelines.text import _token_count_batch, token_count_rows

    texts = ["".join(c for c in s
                     if not (c.isspace() and ord(c) > 127)) for s in texts]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    assert _token_count_batch(t)["n_tokens"].to_pylist() \
        == token_count_rows(texts)


@given(_KTEXT)
@settings(max_examples=60, deadline=None)
def test_fingerprint_batch_matches_scalar(texts):
    import pyarrow as pa

    from edgar_ray.pipelines.text import Fingerprinter

    f = Fingerprinter()
    batch = f.fingerprint_batch(pa.array(texts, pa.string()))
    for i, s in enumerate(texts):
        assert [int(x) for x in batch[i]] == [int(x) for x in f.fingerprint(s)]
