"""Declarative schemas: fact definitions, doc types, Arrow schemas.

Replaces the reference's Go struct tags (/root/reference/report.go:16-56) with
one data-driven module: adding a fact is one row here (reference extension
surface, SURVEY.md §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

# --- Filing types (/root/reference/edgar.go:9-15) ---
FILING_10K = "10-K"
FILING_10Q = "10-Q"

# Earliest filing year collected (/root/reference/data_def.go:27)
THRESHOLD_YEAR = 2012

# --- Document types (/root/reference/data_def.go:30-38) ---
DOC_OPS = "Operations"
DOC_INC = "Income"
DOC_BS = "Assets"
DOC_CF = "Cash Flow"
DOC_EN = "Entity Info"
DOC_EPS_NOTES = "Notes on EPS"
DOC_EQUITY = "Notes on Equity"
DOC_DEBT = "Notes on Debt"
DOC_IGNORE = "Ignore"

REQUIRED_DOC_TYPES = (DOC_OPS, DOC_INC, DOC_BS, DOC_CF, DOC_EN)

# Deterministic cross-document merge priority. The reference merges docs via
# concurrent goroutines writing one shared struct with first-write-wins and no
# ordering guarantee (/root/reference/parser.go:373-388); we replace that race
# with a fixed priority so the distributed merge is deterministic.
DOC_MERGE_PRIORITY = {
    DOC_EN: 0,
    DOC_OPS: 1,
    DOC_INC: 2,
    DOC_BS: 3,
    DOC_CF: 4,
    DOC_EPS_NOTES: 5,
    DOC_EQUITY: 6,
    DOC_DEBT: 7,
}

# --- Scale entities / factors (/root/reference/data_def.go:41-49) ---
SCALE_NONE = 1
SCALE_THOUSAND = 1_000
SCALE_MILLION = 1_000_000
SCALE_BILLION = 1_000_000_000

ENTITY_SHARES = "Shares"
ENTITY_MONEY = "Money"
ENTITY_PER_SHARE = "PerShare"


@dataclass(frozen=True)
class FactField:
    """One financial fact; mirrors a Go struct field + tags
    (/root/reference/report.go:16-56)."""

    struct: str  # "entity" | "ops" | "cf" | "bs"
    name: str  # Go field name (used in validation error strings / getters)
    json_tag: str  # display name == finDataType string
    required: bool
    generate: bool
    entity: str  # scale entity
    bit: int  # presence bit within the struct's CollectedData


# Struct order matters: setData probes Entity, Bs, Cf, Ops in that order
# (/root/reference/data_def.go:235-247).
FACT_FIELDS: tuple[FactField, ...] = (
    FactField("entity", "ShareCount", "Shares Outstanding", True, False, ENTITY_SHARES, 0),
    FactField("bs", "LDebt", "Long-Term debt", False, False, ENTITY_MONEY, 0),
    FactField("bs", "SDebt", "Short-Term debt", False, False, ENTITY_MONEY, 1),
    FactField("bs", "CLiab", "Current Liabilities", True, False, ENTITY_MONEY, 2),
    FactField("bs", "Deferred", "Deferred revenue", False, False, ENTITY_MONEY, 3),
    FactField("bs", "Retained", "Retained Earnings", True, False, ENTITY_MONEY, 4),
    FactField("bs", "Equity", "Total Shareholder Equity", True, False, ENTITY_MONEY, 5),
    FactField("bs", "CAssets", "Current Assets", True, False, ENTITY_MONEY, 6),
    FactField("bs", "Cash", "Cash", True, False, ENTITY_MONEY, 7),
    FactField("bs", "Securities", "Securities", False, False, ENTITY_MONEY, 8),
    FactField("bs", "Goodwill", "Goodwill", False, False, ENTITY_MONEY, 9),
    FactField("bs", "Intangibles", "Intangibles", False, False, ENTITY_MONEY, 10),
    FactField("bs", "Assets", "Total Assets", True, False, ENTITY_MONEY, 11),
    FactField("bs", "Liab", "Total Liabilities", True, False, ENTITY_MONEY, 12),
    FactField("cf", "OpCashFlow", "Operating Cash Flow", True, False, ENTITY_MONEY, 0),
    FactField("cf", "CapEx", "Capital Expenditure", True, False, ENTITY_MONEY, 1),
    FactField("cf", "Dividends", "Dividends paid", False, False, ENTITY_MONEY, 2),
    FactField("cf", "Interest", "Interest paid", False, False, ENTITY_MONEY, 3),
    FactField("ops", "Revenue", "Revenue", True, False, ENTITY_MONEY, 0),
    FactField("ops", "CostOfSales", "Cost Of Revenue", True, False, ENTITY_MONEY, 1),
    FactField("ops", "GrossMargin", "Gross Margin", True, True, ENTITY_MONEY, 2),
    FactField("ops", "OpIncome", "Operational Income", True, False, ENTITY_MONEY, 3),
    FactField("ops", "OpExpense", "Operational Expense", True, True, ENTITY_MONEY, 4),
    FactField("ops", "NetIncome", "Net Income", True, False, ENTITY_MONEY, 5),
    FactField("ops", "WAShares", "Weighted Average Share Count", True, False, ENTITY_SHARES, 6),
    FactField("ops", "Dps", "Dividend Per Share", True, True, ENTITY_PER_SHARE, 7),
)

# json_tag (finDataType string) -> FactField
FACT_BY_TAG: dict[str, FactField] = {f.json_tag: f for f in FACT_FIELDS}
# struct -> ordered field list (declaration order == reflection order)
STRUCT_FIELDS: dict[str, list[FactField]] = {}
for _f in FACT_FIELDS:
    STRUCT_FIELDS.setdefault(_f.struct, []).append(_f)
# flat column name used in the wide facts table: e.g. "ops_Revenue"
def fact_col(f: FactField) -> str:
    return f"{f.struct}_{f.name}"


# Strict data -> doc gating (/root/reference/data_def.go:90-92)
STRICT_DATA_TO_DOC = {"Cash": DOC_BS}

# --- Arrow schemas ---

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

FACTS_RAW_SCHEMA = pa.schema(
    [
        ("accession", pa.string()),
        ("cik", pa.string()),
        ("report_num", pa.int32()),
        ("doc_type", pa.string()),
        ("row_idx", pa.int32()),
        ("xbrl_tag", pa.string()),
        ("cells", pa.list_(pa.string())),
        ("headings", pa.list_(pa.string())),  # non-empty only on row_idx == -1
    ]
)

FILINGS_FACTS_KEYS = [
    ("ticker", pa.string()),
    ("cik", pa.string()),
    ("accession", pa.string()),
    ("filing_type", pa.string()),
    ("filed_date", pa.date32()),
]

FILINGS_FACTS_SCHEMA = pa.schema(
    FILINGS_FACTS_KEYS
    + [(fact_col(f), pa.float64()) for f in FACT_FIELDS]
    + [
        ("collected_entity", pa.uint64()),
        ("collected_ops", pa.uint64()),
        ("collected_bs", pa.uint64()),
        ("collected_cf", pa.uint64()),
        ("validation_error", pa.string()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_sha1", pa.binary()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("ticker", pa.string()),
        ("filing_type", pa.string()),
        ("filed_date", pa.string()),
        ("seed_rank", pa.int32()),
        ("report_num", pa.int32()),
        ("doc_type", pa.string()),
        ("accession", pa.string()),
        ("cik", pa.string()),
    ]
)
