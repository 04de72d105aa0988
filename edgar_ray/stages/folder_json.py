"""Reference-shape nested folder JSON: SaveFolder / CreateFolder parity
(S7-S9, /root/reference/folder.go:21-27,152-159 + fetcher.go:35-60).

``Company -> {"Financial Reports": {filing_type: {date: filing}}}`` with the
exact key order of the Go structs' marshal (declaration order,
/root/reference/report.go:8-56; sample at
/root/reference/samples/sample_folder.json) and Go's number rendering
(float64 values that are integral print without a decimal point).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..schema import STRUCT_FIELDS, fact_col

# marshal order of financialReport (/root/reference/report.go:8-14)
_STRUCT_ORDER = (
    ("Entity Information", "entity"),
    ("Operational Information", "ops"),
    ("Balance Sheet Information", "bs"),
    ("Cash Flow Information", "cf"),
)


def _num(v: float):
    """Go json.Marshal renders integral float64s without a decimal point."""
    f = float(v)
    return int(f) if f.is_integer() else f


def filing_to_dict(row: dict) -> dict:
    """One wide filings_facts row -> the reference's filing marshal shape
    (/root/reference/filing.go:17-23)."""
    fin: dict = {"Filing Type": row["filing_type"]}
    for key, struct in _STRUCT_ORDER:
        sub: dict = {"Collected Data": int(row[f"collected_{struct}"])}
        for f in STRUCT_FIELDS[struct]:
            sub[f.json_tag] = _num(row[fact_col(f)])
        fin[key] = sub
    return {
        "Company": row["ticker"],
        "Report date": row["filed_date"],
        "Financial Data": fin,
    }


def facts_to_folder(rows: list[dict], ticker: str) -> dict:
    """filings_facts rows (one ticker) -> company folder marshal shape
    (/root/reference/folder.go:21-27)."""
    reports: dict = {}
    for row in sorted(rows, key=lambda r: (r["filing_type"], r["filed_date"])):
        reports.setdefault(row["filing_type"], {})[row["filed_date"]] = \
            filing_to_dict(row)
    return {"Company": ticker, "Financial Reports": reports}


def folder_to_json(folder: dict) -> str:
    """Indent-4 pretty print, like company.String()'s MarshalIndent."""
    return json.dumps(folder, indent=4)


def folder_json_to_rows(text: str) -> list[dict]:
    """CreateFolder resume path (/root/reference/fetcher.go:35-60): parse a
    saved folder back into wide filings_facts rows."""
    folder = json.loads(text)
    ticker = folder["Company"]
    rows: list[dict] = []
    for ftype, by_date in folder.get("Financial Reports", {}).items():
        for date, filing in by_date.items():
            fin = filing["Financial Data"]
            row: dict = {"ticker": ticker, "filing_type": ftype,
                         "filed_date": date}
            for key, struct in _STRUCT_ORDER:
                sub = fin.get(key, {})
                row[f"collected_{struct}"] = int(sub.get("Collected Data", 0))
                for f in STRUCT_FIELDS[struct]:
                    row[fact_col(f)] = float(sub.get(f.json_tag, 0.0))
            rows.append(row)
    return rows


def folders_dataset(facts_ds):
    """filings_facts Dataset -> one (ticker, folder_json) row per ticker
    (groupby key = ticker; group count is the ticker universe, so the
    per-group call count is naturally bounded)."""

    def to_json(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        if not rows:
            return pa.table({"ticker": pa.array([], pa.string()),
                             "folder_json": pa.array([], pa.string())})
        ticker = rows[0]["ticker"]
        return pa.table({
            "ticker": pa.array([ticker], pa.string()),
            "folder_json": pa.array(
                [folder_to_json(facts_to_folder(rows, ticker))], pa.string()),
        })

    return facts_ds.groupby("ticker").map_groups(to_json, batch_format="pyarrow")
