"""Synthetic corpus generator: page grammars parse back to the spec, and the
reference-faithful parse+merge path reproduces the INDEPENDENT golden
evaluator's facts for every filing (FIXTURES.md §1-4)."""

import pyarrow.compute as pc
import pytest

from edgar_ray.functions.parse import (
    extracted_text,
    filing_page_parser,
    query_page_parser,
)
from edgar_ray.functions.report import parse_filing
from edgar_ray.schema import STRUCT_FIELDS, fact_col
from edgar_ray.sources.synth import (
    gen_corpus,
    golden_facts,
    make_universe,
    render_index_page,
    render_query_page,
    render_report_page,
)


@pytest.fixture(scope="module")
def specs():
    return make_universe(6, 3)


def test_query_page_roundtrip(specs):
    fs = [s for s in specs if s.ticker == "SYN0001" and s.filing_type == "10-Q"]
    page = render_query_page("SYN0001", "10-Q", fs, 42)
    parsed = query_page_parser(page, "10-Q")
    # AMEND + pre-2012 rows dropped; one date per filing plus the one
    # duplicate-URL row under an older date (frontier-dedup fodder)
    assert {f.filed_date for f in fs} <= set(parsed)
    assert len(parsed) == len(fs) + 1
    for f in fs:
        assert parsed[f.filed_date] == f.index_url()[len("https://www.sec.gov"):]


def test_index_page_roundtrip(specs):
    for fs in specs[:6]:
        docs = filing_page_parser(render_index_page(fs), fs.filing_type)
        want = {d.doc_type: f"/Archives/edgar/data/{fs.cik_int}/{fs.acc_nodash}/R{d.report_num}.htm"
                for d in fs.docs if d.doc_type != "Ignore"}
        assert docs == want  # .xml entries rewritten, Parenthetical ignored


def test_parse_merge_matches_golden(specs):
    for fs in specs:
        doc_pages = {d.doc_type: render_report_page(d)
                     for d in fs.docs if d.doc_type != "Ignore"}
        fr, err = parse_filing(fs.filing_type, doc_pages)
        g = golden_facts(fs)
        for struct, fields in STRUCT_FIELDS.items():
            for f in fields:
                assert fr[struct][f.name] == g[fact_col(f)], (fs.accession, f.name)
            assert fr[struct]["CollectedData"] == g[f"collected_{struct}"]
        assert err == g["validation_error"]


def test_corpus_tables():
    t = gen_corpus(4, 2)
    pages, golden, crawl = t["pages"], t["filings_golden"], t["crawl_order_golden"]
    assert pc.count_distinct(pages["url"]).as_py() == pages.num_rows
    # seed_rank 2 is robots-blocked (ROBOTS_BLOCK_MOD/REM): its filings never
    # yield facts, so golden covers 3 of 4 tickers
    assert golden.num_rows == 3 * 2 * 2  # unblocked tickers x types x filings
    # pages = crawl order + one never-crawled Parenthetical per filing (4x2x2)
    # + the robots-blocked ticker's R pages + robots.txt itself
    n_blocked_r = sum(1 for u in pages["url"].to_pylist()
                      if "/Archives/edgar/data/" in u
                      and u not in set(crawl["url"].to_pylist()))
    assert crawl.num_rows == pages.num_rows - n_blocked_r - 1  # -1: robots.txt
    # crawl order is wave-monotone
    waves = crawl["wave"].to_pylist()
    assert waves == sorted(waves)
    # text column is the canonical extracted text
    row = pages.slice(0, 1).to_pylist()[0]
    assert extracted_text(row["url"], row["html"]) == row["text"]


def test_determinism():
    a = gen_corpus(3, 2)["pages"]
    b = gen_corpus(3, 2)["pages"]
    assert a.equals(b)
