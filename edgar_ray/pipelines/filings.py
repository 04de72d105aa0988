"""The reference's public query surface (FilingFetcher / CompanyFolder /
Filing, /root/reference/edgar.go:18-94) re-expressed as Dataset operators over
the crawled ``filings_facts`` table.

Getter -> column select; AvailableFilings -> per-ticker sort desc;
CollectedData -> presence-bitmask popcount. The lazily-cached lookup-or-fetch
of the reference (/root/reference/folder.go:42-65) becomes: facts checkpoint
on Parquet + the crawl's anti-join resume path (pipelines/crawl.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import FACT_FIELDS, STRUCT_FIELDS, fact_col

# finDataType display name -> wide facts column (the 27 getters,
# /root/reference/edgar.go:18-49)
GETTER_COLUMNS = {f.json_tag: fact_col(f) for f in FACT_FIELDS}


def available_filings(facts_ds, ticker: str, filing_type: str):
    """Filing dates newest-first (O1, /root/reference/folder.go:120-132)."""
    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["ticker"], pa.scalar(ticker)),
                    pc.equal(t["filing_type"], pa.scalar(filing_type)))
        return t.filter(m).select(["ticker", "filing_type", "filed_date"])

    return facts_ds.map_batches(keep, batch_format="pyarrow") \
        .sort("filed_date", descending=True)


def get_facts(facts_ds, fact_names: list[str]):
    """Column-select getters; unset facts (bit clear) surface as null, like
    the reference's (0, error) getter returns (/root/reference/filing.go:44)."""
    cols = ["ticker", "filing_type", "filed_date", "accession"]
    fields = [next(f for f in FACT_FIELDS if f.json_tag == n) for n in fact_names]

    def mask_unset(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in cols}
        for f in fields:
            col = fact_col(f)
            bit = pc.bit_wise_and(t[f"collected_{f.struct}"],
                                  pa.scalar(1 << f.bit, pa.uint64()))
            set_mask = pc.not_equal(bit, pa.scalar(0, pa.uint64()))
            out[col] = pc.if_else(set_mask, t[col], pa.scalar(None, pa.float64()))
        return pa.table(out)

    return facts_ds.map_batches(mask_unset, batch_format="pyarrow")


def collected_counts(facts_ds):
    """CollectedData() fact-name count per filing (A6,
    /root/reference/filing.go:279-302) — vectorized popcount over the four
    presence bitmasks."""
    import numpy as np

    from ..stages.bucketing import POP8 as pop8

    def count(t: pa.Table) -> pa.Table:
        total = np.zeros(t.num_rows, dtype=np.int64)
        for struct in ("entity", "ops", "bs", "cf"):
            v = t[f"collected_{struct}"].to_numpy(zero_copy_only=False).astype(np.uint64)
            # vectorized popcount: byte-view + 256-entry lookup table
            if len(v):
                total += pop8[v.view(np.uint8)].reshape(len(v), 8).sum(axis=1)
        return pa.table({
            "ticker": t["ticker"], "accession": t["accession"],
            "n_collected": pa.array(total, pa.int64()),
        })

    return facts_ds.map_batches(count, batch_format="pyarrow")


def collected_fact_names_row(row: pd.Series) -> list[str]:
    """Names of set facts in Entity, Bs, Cf, Ops order (the reference's
    CollectedData ordering, /root/reference/filing.go:279-302)."""
    out = []
    for struct in ("entity", "bs", "cf", "ops"):
        bits = int(row[f"collected_{struct}"])
        for f in STRUCT_FIELDS[struct]:
            if bits & (1 << f.bit):
                out.append(f.name)
    return out
