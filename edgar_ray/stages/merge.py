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


def merge_filing_group(group) -> "pa.Table":
    """One group = one accession's facts_raw rows (all docs), as an Arrow
    table (zero-copy slice of the sorted block — no per-group pandas
    conversion). Emits one wide filings_facts row."""
    import pyarrow as pa

    if group.num_rows == 0:
        return pa.Table.from_pandas(_empty_wide())
    cols = group.to_pydict()
    docs: dict[str, tuple[list[str], list[tuple[int, list[str]]]]] = {}
    for doc_type, headings, rows_idx, rows_cells in zip(
        cols["doc_type"], cols["headings"], cols["rows_idx"], cols["rows_cells"]
    ):
        rows = sorted(zip(rows_idx, rows_cells))
        # first page wins per doc_type (D3, /root/reference/reportmap.go:139)
        docs.setdefault(doc_type, (headings, rows))

    fr, err = merge_docs(cols["filing_type"][0], docs)
    out = {
        "ticker": [cols["ticker"][0]],
        "cik": [cols["cik"][0]],
        "accession": [cols["accession"][0]],
        "filing_type": [cols["filing_type"][0]],
        "filed_date": [cols["filed_date"][0]],
    }
    for f in FACT_FIELDS:
        out[fact_col(f)] = [float(fr[f.struct][f.name])]
    for struct in ("entity", "ops", "bs", "cf"):
        out[f"collected_{struct}"] = [int(fr[struct]["CollectedData"])]
    out["validation_error"] = [err]
    return pa.table(out)


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
        merge_filing_group, batch_format="pyarrow"
    )


FILINGS_FACTS_COLUMNS = [f.name for f in FILINGS_FACTS_SCHEMA]
