"""The merge shuffle: ``groupby("accession").map_groups(merge_filing_group)``.

Replaces the reference's unsynchronized concurrent merge (goroutine per doc
page writing one shared struct, /root/reference/parser.go:373-388) with a
deterministic distributed reduce: all of one accession's long-format fact rows
are co-located by the shuffle, replayed in (doc priority, row_idx) order with
first-write-wins (/root/reference/data_def.go:185-248), then derived-field
generation + validation (/root/reference/data_def.go:95-183).
"""

from __future__ import annotations

import pandas as pd

from ..functions.report import merge_docs
from ..schema import FACT_FIELDS, FILINGS_FACTS_SCHEMA, fact_col


def merge_filing_group(group: pd.DataFrame) -> pd.DataFrame:
    """One group = one accession's facts_raw rows (all docs). Emits one wide
    filings_facts row."""
    if len(group) == 0:
        return _empty_wide()
    first = group.iloc[0]
    docs: dict[str, tuple[list[str], list[tuple[int, list[str]]]]] = {}
    for doc_type, g in group.groupby("doc_type", sort=False):
        g = g.sort_values("row_idx")
        headings: list[str] = []
        rows: list[tuple[int, list[str]]] = []
        for _, r in g.iterrows():
            if r["row_idx"] < 0:
                headings = list(r["headings"])
            else:
                rows.append((int(r["row_idx"]), list(r["cells"])))
        docs[doc_type] = (headings, rows)

    fr, err = merge_docs(str(first["filing_type"]), docs)
    out = {
        "ticker": [first["ticker"]],
        "cik": [first["cik"]],
        "accession": [first["accession"]],
        "filing_type": [first["filing_type"]],
        "filed_date": [first["filed_date"]],
    }
    for f in FACT_FIELDS:
        out[fact_col(f)] = [float(fr[f.struct][f.name])]
    for struct in ("entity", "ops", "bs", "cf"):
        out[f"collected_{struct}"] = [int(fr[struct]["CollectedData"])]
    out["validation_error"] = [err]
    return pd.DataFrame(out)


def _empty_wide() -> pd.DataFrame:
    cols: dict[str, list] = {c: [] for c in
                             ("ticker", "cik", "accession", "filing_type", "filed_date")}
    for f in FACT_FIELDS:
        cols[fact_col(f)] = []
    for struct in ("entity", "ops", "bs", "cf"):
        cols[f"collected_{struct}"] = []
    cols["validation_error"] = []
    return pd.DataFrame(cols)


def merge_facts(facts_raw_ds):
    """facts_raw Dataset -> filings_facts Dataset (shuffle #1, key=accession)."""
    return facts_raw_ds.groupby("accession").map_groups(
        merge_filing_group, batch_format="pandas"
    )


FILINGS_FACTS_COLUMNS = [f.name for f in FILINGS_FACTS_SCHEMA]
