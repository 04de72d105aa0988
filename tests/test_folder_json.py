"""Folder-JSON parity (SURVEY.md §5 layer 4): the nested marshal shape
matches the reference's sample structure key-for-key, Go's integral-float
rendering is reproduced, and save -> load round-trips the facts exactly."""

import json

import pyarrow.parquet as pq
import pytest

from edgar_ray.schema import FACT_FIELDS, fact_col
from edgar_ray.stages.folder_json import (
    facts_to_folder,
    filing_to_dict,
    folder_json_to_rows,
    folder_to_json,
    folders_dataset,
)

REF_SAMPLE = "/root/reference/samples/sample_folder.json"


def _synthetic_rows():
    from edgar_ray.sources.synth import gen_corpus

    return gen_corpus(3, 2)["filings_golden"].to_pylist()


def test_marshal_shape_matches_reference_sample():
    ref = json.loads(open(REF_SAMPLE).read())
    rows = _synthetic_rows()
    ours = facts_to_folder([r for r in rows if r["ticker"] == rows[0]["ticker"]],
                           rows[0]["ticker"])
    assert list(ours) == list(ref) == ["Company", "Financial Reports"]
    ref_filing = next(iter(next(iter(ref["Financial Reports"].values())).values()))
    our_filing = next(iter(next(iter(ours["Financial Reports"].values())).values()))
    assert list(our_filing) == list(ref_filing)
    assert list(our_filing["Financial Data"]) == list(ref_filing["Financial Data"])
    for section in ("Entity Information", "Operational Information",
                    "Balance Sheet Information", "Cash Flow Information"):
        ref_keys = list(ref_filing["Financial Data"][section])
        our_keys = list(our_filing["Financial Data"][section])
        # the checked-in sample predates some bs fields
        # (/root/reference/report.go:41-56 has 13; the sample shows 7) —
        # the shared prefix must match in declaration order
        assert our_keys[:len(ref_keys)] == ref_keys, section


def test_go_number_rendering():
    row = _synthetic_rows()[0]
    text = folder_to_json(facts_to_folder([row], row["ticker"]))
    # integral floats print without a decimal point, like Go's json.Marshal
    fin = filing_to_dict(row)["Financial Data"]
    share = fin["Entity Information"]["Shares Outstanding"]
    if float(share).is_integer():
        assert f'"Shares Outstanding": {int(share)}' in text
        assert f'"Shares Outstanding": {int(share)}.0' not in text


def test_round_trip_exact():
    rows = _synthetic_rows()
    by_ticker: dict = {}
    for r in rows:
        by_ticker.setdefault(r["ticker"], []).append(r)
    for ticker, trows in by_ticker.items():
        text = folder_to_json(facts_to_folder(trows, ticker))
        back = {(r["filing_type"], r["filed_date"]): r
                for r in folder_json_to_rows(text)}
        assert len(back) == len(trows)
        for r in trows:
            b = back[(r["filing_type"], r["filed_date"])]
            for f in FACT_FIELDS:
                assert b[fact_col(f)] == float(r[fact_col(f)]), fact_col(f)
            for s in ("entity", "ops", "bs", "cf"):
                assert b[f"collected_{s}"] == int(r[f"collected_{s}"])


def test_folders_dataset(ray_session, tmp_path):
    import ray.data as rd
    from edgar_ray.sources.synth import write_corpus

    paths = write_corpus(str(tmp_path / "c"), 3, 2)
    facts = rd.from_arrow(pq.read_table(paths["filings_golden"]))
    out = folders_dataset(facts).to_pandas()
    # ticker SYN0002 is robots-blocked -> absent from goldens
    assert sorted(out["ticker"]) == ["SYN0000", "SYN0001"]
    folder = json.loads(out.iloc[0]["folder_json"])
    assert set(folder["Financial Reports"]) == {"10-K", "10-Q"}
