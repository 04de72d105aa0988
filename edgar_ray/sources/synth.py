"""Deterministic synthetic EDGAR-shaped corpus generator (seed=42).

Renders the exact page grammars the reference parses (see FIXTURES.md §1 and
the real captures at /root/reference/samples/):

1. query pages    — 5-cell filing rows with an ``interactiveDataBtn`` viewer
                    href (/root/reference/samples/sample_query.html),
                    including AMEND (``10-K/A``) and pre-2012 rows that the
                    reference drops (/root/reference/parser.go:34-53);
2. filing index   — ``var reports = new Array(N);`` JS block + accordion menu
                    with ``loadReport(n)`` anchors
                    (/root/reference/samples/sample_10K.html);
3. R-report pages — ``<table class="report">`` with scale headings and
                    ``showAR('defref_…')`` fact rows with ``nump`` value
                    cells (/root/reference/samples/sample_bs.html).

Alongside ``pages`` it emits spec-level golden tables (``filings_golden``,
``crawl_order_golden``, ``seed_tickers``) computed by an INDEPENDENT semantic
evaluator over the abstract fact spec — NOT by the parser — so the pipeline's
parse + merge path is genuinely cross-checked.

Per-filing variation cases exercise every reference subtlety: derived
GrossMargin/OpExpense/Dps generation (/root/reference/data_def.go:95-121),
Dps fallback to ShareCount, WAShares scale override
(/root/reference/data_def.go:160-163), strict Cash-from-BS gating
(/root/reference/data_def.go:229-233), first-write-wins duplicate tags
(/root/reference/data_def.go:205), Ops⇔Income title equivalence
(/root/reference/reportmap.go:86-97), ``.xml``→``.htm`` rewrite
(/root/reference/parser.go:108-111), and Parenthetical-page skipping.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import (
    DOC_BS,
    DOC_CF,
    DOC_DEBT,
    DOC_EN,
    DOC_EPS_NOTES,
    DOC_INC,
    DOC_MERGE_PRIORITY,
    DOC_OPS,
    FACT_BY_TAG,
    REQUIRED_DOC_TYPES,
    STRICT_DATA_TO_DOC,
    STRUCT_FIELDS,
    fact_col,
)
from ..functions.parse import go_div, extracted_text, go_round, is_same_scale

BASE_URL = "https://www.sec.gov"
HOST = "www.sec.gov"

# fact display names (finDataType strings) -> canonical us-gaap defref tag used
# when rendering. Company-specific (non-GAAP) tags are derived per case.
_RENDER_TAG = {
    "Shares Outstanding": "defref_dei_EntityCommonStockSharesOutstanding",
    "Revenue": "defref_us-gaap_Revenues",
    "Cost Of Revenue": "defref_us-gaap_CostOfGoodsAndServicesSold",
    "Gross Margin": "defref_us-gaap_GrossProfit",
    "Operational Expense": "defref_us-gaap_OperatingExpenses",
    "Operational Income": "defref_us-gaap_OperatingIncomeLoss",
    "Net Income": "defref_us-gaap_NetIncomeLoss",
    "Weighted Average Share Count": "defref_us-gaap_WeightedAverageNumberOfDilutedSharesOutstanding",
    "Dividend Per Share": "defref_us-gaap_CommonStockDividendsPerShareDeclared",
    "Operating Cash Flow": "defref_us-gaap_NetCashProvidedByUsedInOperatingActivities",
    "Capital Expenditure": "defref_us-gaap_PaymentsToAcquirePropertyPlantAndEquipment",
    "Dividends paid": "defref_us-gaap_PaymentsOfDividends",
    "Interest paid": "defref_us-gaap_InterestPaidNet",
    "Long-Term debt": "defref_us-gaap_LongTermDebtNoncurrent",
    "Short-Term debt": "defref_us-gaap_DebtCurrent",
    "Current Liabilities": "defref_us-gaap_LiabilitiesCurrent",
    "Deferred revenue": "defref_us-gaap_DeferredRevenueCurrent",
    "Retained Earnings": "defref_us-gaap_RetainedEarningsAccumulatedDeficit",
    "Total Shareholder Equity": "defref_us-gaap_StockholdersEquity",
    "Current Assets": "defref_us-gaap_AssetsCurrent",
    "Cash": "defref_us-gaap_CashAndCashEquivalentsAtCarryingValue",
    "Securities": "defref_us-gaap_Securities",  # unknown tag -> resolved via suffix? no: stays Unknown
    "Goodwill": "defref_us-gaap_Goodwill",
    "Intangibles": "defref_us-gaap_IntangibleAssetsNetExcludingGoodwill",
    "Total Assets": "defref_us-gaap_Assets",
    "Total Liabilities": "defref_us-gaap_Liabilities",
}
# 'Securities' has no canonical mapped tag in the reference map
# (/root/reference/xbrltags.go has AvailableForSaleSecurities* absent); render
# it with a tag the map does NOT know so it stays uncollected, matching the
# reference's behavior of never extracting it from our grammar.
_RENDER_TAG["Securities"] = "defref_us-gaap_AvailableForSaleSecuritiesCurrent"


@dataclass
class DocSpec:
    """One R-report page: its menu title, scale heading, and fact rows."""

    report_num: int
    doc_type: str  # golden doc type ("Ignore" pages excluded from golden)
    menu_title: str
    menu_section: str  # "Cover" | "Financial Statements" | "Notes to Financial Statements"
    heading: list[str] = field(default_factory=list)
    scales: dict[str, float] = field(default_factory=dict)
    # rows: (fact display name or raw tag, [rendered value strings per period])
    rows: list[tuple[str, list[str]]] = field(default_factory=list)


@dataclass
class FilingSpec:
    ticker: str
    cik: str
    filing_type: str
    filed_date: str
    accession: str
    seed_rank: int
    docs: list[DocSpec] = field(default_factory=list)
    n_reports: int = 0  # size of the reports array (incl. trailing 'all')
    xml_reports: frozenset = frozenset()  # report nums rendered as .xml in the array

    @property
    def acc_nodash(self) -> str:
        return self.accession.replace("-", "")

    @property
    def cik_int(self) -> int:
        return int(self.cik)

    def index_url(self) -> str:
        return (
            f"{BASE_URL}/cgi-bin/viewer?action=view&cik={self.cik_int}"
            f"&accession_number={self.accession}&xbrl_type=v"
        )

    def report_url(self, n: int) -> str:
        return f"{BASE_URL}/Archives/edgar/data/{self.cik_int}/{self.acc_nodash}/R{n}.htm"


def _rng(seed: int, *key: object) -> np.random.Generator:
    h = hashlib.sha1("|".join(str(k) for k in key).encode()).digest()
    return np.random.default_rng([seed, int.from_bytes(h[:8], "big")])


def _fmt(num: float, dollar: bool = False, decimals: int = 0) -> str:
    """Render a number the way EDGAR report cells do: thousands commas,
    parens for negatives, optional $ prefix."""
    neg = num < 0
    mag = abs(num)
    s = f"{mag:,.{decimals}f}"
    if dollar:
        s = "$ " + s
    if neg:
        s = f"({s})"
    return s


def make_filing_spec(
    ticker: str, cik: str, filing_type: str, filed_date: str, accession: str,
    seed_rank: int, seed: int,
) -> FilingSpec:
    rng = _rng(seed, ticker, filing_type, filed_date)
    case = int(rng.integers(0, 8))  # variation case selector

    fs = FilingSpec(ticker, cik, filing_type, filed_date, accession, seed_rank)

    # ----- true fact values (integers, in "millions" units) -----
    revenue = int(rng.integers(1_000, 90_000))
    cost = int(revenue * rng.uniform(0.4, 0.7))
    gross = revenue - cost
    op_income = int(revenue * rng.uniform(0.1, 0.25))
    op_expense = gross - op_income
    net_income = int(op_income * rng.uniform(0.7, 0.9))
    washares_m = int(rng.integers(500, 5_000))  # millions of shares
    share_count = int(washares_m * 1e6 * rng.uniform(0.96, 1.04))
    dividends = -int(max(0, net_income * rng.uniform(0.05, 0.3)))
    interest = int(max(1, op_income * rng.uniform(0.01, 0.05)))
    op_cf = int(net_income * rng.uniform(1.0, 1.4))
    capex = int(revenue * rng.uniform(0.03, 0.1))
    cash = int(revenue * rng.uniform(0.1, 0.5))
    securities = int(revenue * rng.uniform(0.1, 0.6))
    goodwill = int(revenue * rng.uniform(0.05, 0.3))
    intangibles = int(revenue * rng.uniform(0.01, 0.1))
    cassets = int(cash + securities + revenue * rng.uniform(0.1, 0.3))
    assets = int(cassets * rng.uniform(1.5, 2.5))
    cliab = int(cassets * rng.uniform(0.4, 0.9))
    ldebt = int(assets * rng.uniform(0.1, 0.3))
    sdebt = int(cliab * rng.uniform(0.05, 0.2))
    deferred = int(cliab * rng.uniform(0.05, 0.2))
    liab = int(cliab + ldebt + assets * rng.uniform(0.05, 0.15))
    equity = assets - liab
    retained = int(equity * rng.uniform(0.3, 0.9))
    dps = go_round(-dividends / washares_m)  # per-share, 2-dec truncation

    money_scale_word = "Millions"
    # Case 5: balance sheet in Thousands (values rendered *1000 bigger numbers)
    bs_money_word = "Thousands" if case == 5 else "Millions"

    def money(v: float, word: str) -> str:
        mult = 1_000 if word == "Thousands" else 1
        return _fmt(v * mult)

    # ----- R1: Entity info -----
    en = DocSpec(1, DOC_EN, "Document and Entity Information", "Cover",
                 heading=["Document and Entity Information - shares"],
                 scales={"Shares": 1, "Money": 1e6, "PerShare": 1})
    en.rows.append(("Shares Outstanding", [_fmt(share_count)]))
    fs.docs.append(en)

    # ----- R2: Balance sheet -----
    bs_head = f"CONSOLIDATED BALANCE SHEETS - USD ($)|$ in {bs_money_word}"
    bs = DocSpec(2, DOC_BS, "CONSOLIDATED BALANCE SHEETS", "Financial Statements",
                 heading=bs_head.split("|"),
                 scales={"Shares": 1e6, "Money": 1e3 if bs_money_word == "Thousands" else 1e6,
                         "PerShare": 1})
    bs_facts = [
        ("Cash", cash), ("Securities", securities), ("Current Assets", cassets),
        ("Goodwill", goodwill), ("Intangibles", intangibles), ("Total Assets", assets),
        ("Short-Term debt", sdebt), ("Deferred revenue", deferred),
        ("Current Liabilities", cliab), ("Long-Term debt", ldebt),
        ("Total Liabilities", liab), ("Retained Earnings", retained),
        ("Total Shareholder Equity", equity),
    ]
    if case == 6:
        # strict-gating case: Cash missing from BS -> required-field error;
        # a Cash row in the CF doc is gated and must NOT fill it.
        bs_facts = [f for f in bs_facts if f[0] != "Cash"]
    for i, (name, v) in enumerate(bs_facts):
        val = money(v, bs_money_word)
        if i == 0:
            val = "$ " + val  # first row carries the $ prefix like real pages
        # second period column (prior year) — first non-empty cell wins, so
        # golden is always the FIRST column
        prior = money(int(v * 0.93), bs_money_word)
        bs.rows.append((name, [val, prior]))
    fs.docs.append(bs)

    # ----- R3: Operations / Income -----
    ops_title = ("CONSOLIDATED STATEMENTS OF INCOME" if case == 1
                 else "CONSOLIDATED STATEMENTS OF OPERATIONS")
    ops_doc_type = DOC_INC if case == 1 else DOC_OPS
    shares_word = "Thousands" if case == 4 else "Millions"
    shares_scale = 1e3 if case == 4 else 1e6
    ops = DocSpec(3, ops_doc_type, ops_title, "Financial Statements",
                  heading=[f"{ops_title} - USD ($)",
                           f"shares in {shares_word}, $ in {money_scale_word}"],
                  scales={"Shares": shares_scale, "Money": 1e6, "PerShare": 1})
    ops.rows.append(("Revenue", [_fmt(revenue, dollar=True)]))
    if case == 7:
        # duplicate-tag case: a second Revenue row with a different value;
        # first-write-wins keeps the first.
        ops.rows.append(("Revenue", [_fmt(int(revenue * 0.5))]))
    ops.rows.append(("Cost Of Revenue", [_fmt(cost)]))
    if case != 2:
        ops.rows.append(("Gross Margin", [_fmt(gross)]))
        ops.rows.append(("Operational Expense", [_fmt(op_expense)]))
    ops.rows.append(("Operational Income", [_fmt(op_income)]))
    # empty-first-cell case: golden value sits in the SECOND period column
    ops.rows.append(("Net Income", ["", _fmt(net_income)] if case == 3
                     else [_fmt(net_income)]))
    # WAShares rendered in the doc's shares scale so the stored value matches
    # share_count's magnitude (case 4 exercises the same-scale path at a
    # different rendered scale; the mismatch/override case is case 0).
    if case == 0:
        # Override case: rendered WAShares is wildly off from ShareCount
        # (>2x), so validation overrides the value with ShareCount
        # (/root/reference/data_def.go:160-163).
        ops.rows.append(("Weighted Average Share Count", [_fmt(washares_m // 7)]))
    else:
        ops.rows.append(("Weighted Average Share Count",
                         [_fmt(washares_m * (1e6 / shares_scale))]))
    if case != 3:
        ops.rows.append(("Dividend Per Share", [f"$ {dps:.2f}"]))
    fs.docs.append(ops)

    # ----- R4: Cash flow -----
    cf = DocSpec(4, DOC_CF, "CONSOLIDATED STATEMENTS OF CASH FLOWS", "Financial Statements",
                 heading=["CONSOLIDATED STATEMENTS OF CASH FLOWS - USD ($)",
                          "$ in Millions"],
                 scales={"Shares": 1e6, "Money": 1e6, "PerShare": 1})
    cf.rows.append(("Operating Cash Flow", [_fmt(op_cf, dollar=True)]))
    cf.rows.append(("Capital Expenditure", [_fmt(capex)]))
    cf.rows.append(("Dividends paid", [_fmt(dividends)]))  # negative -> parens
    cf.rows.append(("Interest paid", [_fmt(interest)]))
    if case == 6:
        # gated row: Cash tag on a non-BS doc is skipped by setData
        cf.rows.append(("Cash", [_fmt(cash)]))
    fs.docs.append(cf)

    # ----- R5: Parenthetical (ignored via menu classification) -----
    par = DocSpec(5, "Ignore", f"{ops_title} (Parenthetical)", "Financial Statements",
                  heading=["Parenthetical - $ in Millions"], scales={})
    par.rows.append(("Revenue", [_fmt(int(revenue * 2))]))  # must never be read
    fs.docs.append(par)

    # ----- R6 / R7: notes -----
    eps = DocSpec(6, DOC_EPS_NOTES, "NET EARNINGS PER SHARE", "Notes to Financial Statements",
                  heading=["NET EARNINGS PER SHARE - $ in Millions"],
                  scales={"Shares": 1e6, "Money": 1e6, "PerShare": 1})
    fs.docs.append(eps)
    debt = DocSpec(7, DOC_DEBT, "LONG-TERM DEBT", "Notes to Financial Statements",
                   heading=["LONG-TERM DEBT - $ in Millions"],
                   scales={"Shares": 1e6, "Money": 1e6, "PerShare": 1})
    # cross-statement fact in a note (PSX-style Interest fallback): harmless
    # duplicate — CF already set Interest; first-write-wins keeps CF's.
    debt.rows.append(("Interest paid", [_fmt(interest * 3)]))
    fs.docs.append(debt)

    fs.n_reports = 8  # reports[1..7] + the skipped trailing 'all' entry
    fs.xml_reports = frozenset({6, 7} if case in (2, 5) else set())

    # incomplete-filing case: ~1/8 of filings ship no Cash Flow statement and
    # no debt note (menu entries AND R-pages absent), exercising
    # getMissingDocs (A5) past its len(data)>=len(required) short-circuit
    # (/root/reference/reportmap.go:81-83), the required-field validation
    # error, and partial collected_cf bits. Drawn LAST so every other field's
    # rng stream is unchanged.
    if int(rng.integers(0, 8)) == 5:
        fs.docs = [d for d in fs.docs
                   if d.doc_type not in (DOC_CF, DOC_DEBT)]
    return fs


# ---------------------------------------------------------------------------
# HTML renderers (exact page grammars)
# ---------------------------------------------------------------------------


def render_query_page(ticker: str, filing_type: str, filings: list[FilingSpec],
                      seed: int) -> str:
    """5-cell rows + interactiveDataBtn hrefs; includes one AMEND row and one
    pre-2012 row that the reference's filters drop."""
    rng = _rng(seed, "query", ticker, filing_type)
    rows = []

    def filing_row(ftype: str, fs_: FilingSpec | None, date: str, extra_idx: int = 0) -> str:
        if fs_ is not None:
            href = fs_.index_url()[len(BASE_URL):].replace("&", "&amp;")
            acc = fs_.accession
        else:
            href = (f"/cgi-bin/viewer?action=view&amp;cik=999&amp;"
                    f"accession_number=0000000999-10-{extra_idx:06d}&amp;xbrl_type=v")
            acc = f"0000000999-10-{extra_idx:06d}"
        return (
            "<tr>\n"
            f" <td nowrap=\"nowrap\">{ftype}</td>\n"
            f" <td nowrap=\"nowrap\"><a href=\"/Archives/edgar/data/x/{acc}-index.htm\""
            " id=\"documentsbutton\">&nbsp;Documents</a>&nbsp; "
            f"<a href=\"{href}\" id=\"interactiveDataBtn\">&nbsp;Interactive Data</a></td>\n"
            f" <td class=\"small\">Report<br />Acc-no: {acc}&nbsp;(34 Act)</td>\n"
            f" <td>{date}</td>\n"
            f" <td nowrap=\"nowrap\"><a href=\"/cgi-bin/browse-edgar?x=1\">001-{1000+extra_idx}</a>"
            "<br>18985212</td>\n"
            "</tr>"
        )

    for i, f in enumerate(filings):
        rows.append(filing_row(filing_type, f, f.filed_date, i))
        if i == 0:
            # duplicate listing of the same viewer URL under a one-day-older
            # date — the reference keeps both dates in FilingLinks
            # (/root/reference/parser.go:47) but its visit set is unique URLs;
            # the frontier's cuckoo filter must dedup this.
            y, m, d = f.filed_date.split("-")
            dup_date = f"{y}-{m}-{max(1, int(d) - 1):02d}"
            rows.append(filing_row(filing_type, f, dup_date, i))
    # AMEND row (dropped: type mismatch) and pre-2012 row (dropped: threshold)
    amend = filings[0]
    rows.insert(1, filing_row(filing_type + "/A", amend, amend.filed_date, 90))
    rows.append(filing_row(filing_type, None, "2010-03-15", 91))

    body = "\n".join(rows)
    return (
        "<html><body>\n<table class=\"tableFile2\" summary=\"Results\">\n"
        "<tr><th>Filings</th><th>Format</th><th>Description</th>"
        "<th>Filing Date</th><th>File/Film Number</th></tr>\n"
        f"{body}\n</table>\n</body></html>\n"
    )


def render_index_page(fs: FilingSpec) -> str:
    """``var reports`` JS block + accordion menu."""
    lines = [f"var reports = new Array({fs.n_reports});"]
    for n in range(1, fs.n_reports):
        path = f"/Archives/edgar/data/{fs.cik_int}/{fs.acc_nodash}/R{n}"
        ext = ".xml" if n in fs.xml_reports else ".htm"
        lines.append(f'    reports[{n - 1}+1] = "{path}{ext}";')
    lines.append('    reports[0] = "all";')
    js = "\n".join(lines)

    sections: dict[str, list[DocSpec]] = {}
    for d in fs.docs:
        sections.setdefault(d.menu_section, []).append(d)
    menu_parts = []
    cat = 0
    for section in ("Cover", "Financial Statements", "Notes to Financial Statements"):
        docs = sections.get(section, [])
        if not docs:
            continue
        cat += 1
        items = "\n".join(
            f'            <li class="accordion" id="r{d.report_num}">'
            f'<a class="xbrlviewer" onClick="javascript:highlight(this);" '
            f'href="javascript:loadReport({d.report_num});">{d.menu_title}</a></li>'
            for d in docs
        )
        menu_parts.append(
            f'    <li class="accordion">\n      <a id="menu_cat{cat}" href="#">{section}</a>\n'
            f"      <ul>\n{items}\n      </ul>\n    </li>"
        )
    # trailing unknown menu category — map_reports stops here
    cat += 1
    menu_parts.append(
        f'    <li class="accordion">\n      <a id="menu_cat{cat}" href="#">Accounting Policies</a>\n'
        "      <ul>\n      </ul>\n    </li>"
    )
    menu = "\n".join(menu_parts)
    return (
        "<html><head>\n<script type=\"text/javascript\">\n"
        f"{js}\n</script>\n</head>\n<body>\n<div>\n  <ul id=\"menu\">\n{menu}\n  </ul>\n"
        "</div>\n</body></html>\n"
    )


def render_report_page(d: DocSpec) -> str:
    """``<table class="report">`` with th heading + showAR fact rows."""
    head_cells = "<br> ".join(d.heading)
    rows = [
        "<tr>\n"
        f'<th class="tl" colspan="1" rowspan="1"><div style="width: 200px;">'
        f"<strong>{head_cells}</strong></div></th>\n"
        '<th class="th"><div>Dec. 31, 2017</div></th>\n'
        '<th class="th"><div>Dec. 31, 2016</div></th>\n'
        "</tr>"
    ]
    for name, vals in d.rows:
        tag = _RENDER_TAG.get(name, name)
        cells = []
        for v in vals:
            if v == "":
                cells.append('<td class="text">&#160;<span></span></td>')
            else:
                # occasionally the number is wrapped in an <a> inside a nump
                # cell — class num/nump suppresses href extraction so the text
                # is still read (/root/reference/parser.go:184-188)
                inner = f'<a href="javascript:void(0);">{v}</a>' if name == "Shares Outstanding" else v
                cells.append(f'<td class="nump">{inner}<span></span></td>')
        value_cells = "\n".join(cells)
        rows.append(
            '<tr class="ro">\n'
            f'<td class="pl " style="border-bottom: 0px;" valign="top">'
            f'<a class="a" href="javascript:void(0);" '
            f"onclick=\"top.Show.showAR( this, '{tag}', window );\">{name}</a></td>\n"
            f"{value_cells}\n</tr>"
        )
    body = "\n".join(rows)
    return (
        "<html><body>\n"
        f'<table class="report" border="0" cellspacing="2">\n{body}\n</table>\n'
        "</body></html>\n"
    )


# ---------------------------------------------------------------------------
# Golden semantics (independent evaluator over the spec, NOT the parser)
# ---------------------------------------------------------------------------


def golden_facts(fs: FilingSpec) -> dict:
    """Apply the reference merge semantics to the abstract spec rows."""
    from ..functions.parse import normalize_number

    vals: dict[str, float] = {}
    bits: dict[str, int] = {"entity": 0, "ops": 0, "cf": 0, "bs": 0}
    docs = [d for d in fs.docs if d.doc_type in DOC_MERGE_PRIORITY]
    for d in sorted(docs, key=lambda d: DOC_MERGE_PRIORITY[d.doc_type]):
        for name, rendered in d.rows:
            f = FACT_BY_TAG.get(name)
            if f is None:
                continue
            # tag must resolve through the reference map to be collected
            from ..functions.xbrl import UNKNOWN, fin_data_type_from_xbrl_tag
            if fin_data_type_from_xbrl_tag(_RENDER_TAG.get(name, name)) == UNKNOWN:
                continue
            strict = STRICT_DATA_TO_DOC.get(name)
            if strict is not None and d.doc_type != strict:
                continue
            if vals.get(f.name, 0.0) != 0.0:
                continue  # first-write-wins
            first = next((v for v in rendered if v), None)
            if first is None:
                continue
            num = normalize_number(first) * d.scales.get(f.entity, 1)
            # the reference's setter writes + sets the presence bit whenever
            # the current value is 0 — INCLUDING an explicit 0.0 ("$ 0.00"
            # row): bit on, slot stays writable for a later nonzero row
            # (/root/reference/data_def.go:205-223)
            bits[f.struct] |= 1 << f.bit
            if num == 0.0:
                continue
            vals[f.name] = num

    # WAShares/ShareCount scale sanity override (data_def.go:160-163)
    sc = vals.get("ShareCount", 0.0)
    wa = vals.get("WAShares", 0.0)
    if not is_same_scale(sc, wa):
        vals["WAShares"] = sc  # value replaced; collected bit unchanged

    # generation + validation (data_def.go:95-183) in bs, entity, cf, ops order
    def collected(f) -> bool:
        return bool(bits[f.struct] & (1 << f.bit))

    def generate(name: str) -> float:
        if name == "GrossMargin":
            fr_, fc = FACT_BY_TAG["Revenue"], FACT_BY_TAG["Cost Of Revenue"]
            if collected(fr_) and collected(fc):
                return vals["Revenue"] - vals["CostOfSales"]
        elif name == "Dps":
            fd = FACT_BY_TAG["Dividends paid"]
            if collected(fd):
                if collected(FACT_BY_TAG["Weighted Average Share Count"]):
                    return go_round(go_div(-vals["Dividends"], vals["WAShares"]))
                if collected(FACT_BY_TAG["Shares Outstanding"]):
                    return go_round(go_div(-vals["Dividends"], vals["ShareCount"]))
        elif name == "OpExpense":
            need = ("Revenue", "Cost Of Revenue", "Operational Income")
            if all(collected(FACT_BY_TAG[n]) for n in need):
                return go_round(vals["Revenue"] - vals["CostOfSales"] - vals["OpIncome"])
        return 0.0

    name_by_field = {f.name: f for fields in STRUCT_FIELDS.values() for f in fields}
    # internal-name aliasing for generate()
    alias = {"CostOfSales": "Cost Of Revenue"}
    err = ""
    for struct, doc in (("bs", DOC_BS), ("entity", DOC_EN), ("cf", DOC_CF), ("ops", DOC_OPS)):
        serr = ""
        for f in STRUCT_FIELDS[struct]:
            if not collected(f) and f.required:
                if f.generate:
                    num = generate(f.name)
                    if num == 0:
                        serr += f.name + ","
                    else:
                        vals[f.name] = num
                        bits[struct] |= 1 << f.bit
                else:
                    serr += f.name + ","
        if serr:
            err += "Missing fields in " + doc + "[" + serr + "]\n"
    _ = name_by_field, alias

    out = {
        "ticker": fs.ticker, "cik": fs.cik, "accession": fs.accession,
        "filing_type": fs.filing_type, "filed_date": fs.filed_date,
        "collected_entity": bits["entity"], "collected_ops": bits["ops"],
        "collected_bs": bits["bs"], "collected_cf": bits["cf"],
        "validation_error": err,
    }
    for fields in STRUCT_FIELDS.values():
        for f in fields:
            out[fact_col(f)] = vals.get(f.name, 0.0)
    return out


# Internal field name for CostOfSales in schema is "CostOfSales"
# (FACT_BY_TAG["Cost Of Revenue"].name == "CostOfSales"); vals is keyed by
# field name throughout golden_facts.


def golden_missing_docs(fs: FilingSpec) -> str:
    """Spec-level re-derivation of the reference's getMissingDocs string
    (/root/reference/reportmap.go:80-112) for one filing-index page: which
    required doc types the index's mapped menu entries do NOT cover, with the
    Ops <-> Income equivalence. Computed from DocSpec.doc_type directly (the
    classification golden), independent of the HTML parser under test."""
    data_keys = {d.doc_type for d in fs.docs if d.doc_type in DOC_MERGE_PRIORITY}
    if len(data_keys) >= len(REQUIRED_DOC_TYPES):
        return ""
    diff = []
    for key in REQUIRED_DOC_TYPES:
        if key not in data_keys:
            if key == DOC_OPS and DOC_INC in data_keys:
                continue
            if key == DOC_INC and DOC_OPS in data_keys:
                continue
            diff.append(key)
    if not diff:
        return ""
    return "[ " + "".join(" " + d for d in diff) + " ]"


# marshal order of financialReport (/root/reference/report.go:8-14); the
# golden folder JSON is rebuilt here from golden_facts rows so the driver can
# oracle-compare the crawl+merge+String() pipeline end-to-end
_FOLDER_STRUCT_ORDER = (
    ("Entity Information", "entity"),
    ("Operational Information", "ops"),
    ("Balance Sheet Information", "bs"),
    ("Cash Flow Information", "cf"),
)


def golden_folder_json(ticker: str, rows: list[dict]) -> str:
    """Company folder marshal (/root/reference/folder.go:21-27 +
    report.go:8-56): dict key order = Go struct declaration order; integral
    float64s render without a decimal point (Go json.Marshal)."""
    import json

    reports: dict = {}
    for row in sorted(rows, key=lambda r: (r["filing_type"], r["filed_date"])):
        fin: dict = {"Filing Type": row["filing_type"]}
        for key, struct in _FOLDER_STRUCT_ORDER:
            sub: dict = {"Collected Data": int(row[f"collected_{struct}"])}
            for f in STRUCT_FIELDS[struct]:
                v = float(row[fact_col(f)])
                sub[f.json_tag] = int(v) if v.is_integer() else v
            fin[key] = sub
        reports.setdefault(row["filing_type"], {})[row["filed_date"]] = {
            "Company": ticker,
            "Report date": row["filed_date"],
            "Financial Data": fin,
        }
    return json.dumps({"Company": ticker, "Financial Reports": reports},
                      indent=4)


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------


def make_universe(n_tickers: int, filings_per_type: int = 4, seed: int = 42,
                  ticker_range: tuple[int, int] | None = None
                  ) -> list[FilingSpec]:
    """Specs for tickers [lo, hi) (default all). Per-ticker generation is
    independent (seeded by (seed, ticker, ...)), so ranges compose exactly."""
    lo, hi = ticker_range if ticker_range is not None else (0, n_tickers)
    specs: list[FilingSpec] = []
    for i in range(lo, hi):
        ticker = f"SYN{i:04d}"
        cik = f"{1000000 + i * 9973:010d}"
        for ft in ("10-K", "10-Q"):
            for k in range(filings_per_type):
                if ft == "10-K":
                    date = f"{2018 - k}-10-{8 + (i % 20):02d}"
                    yy = (2018 - k) % 100
                else:
                    q = k % 4
                    date = f"{2018 - k // 4}-{['01', '04', '07', '11'][q]}-{10 + (i % 15):02d}"
                    yy = (2018 - k // 4) % 100
                acc = f"{int(cik):010d}-{yy:02d}-{100 + k + (0 if ft == '10-K' else 50):06d}"
                specs.append(make_filing_spec(ticker, cik, ft, date, acc, i, seed))
    return specs


# robots.txt scenario: every ticker with seed_rank % 8 == 2 has its
# /Archives/edgar/data/<cik>/ directory disallowed — its query+index pages
# crawl normally but every R-report fetch is robots-blocked, so the filing
# yields no facts (goldens below are robots-aware)
ROBOTS_BLOCK_MOD = 8
ROBOTS_BLOCK_REM = 2


def robots_blocked_rank(seed_rank: int) -> bool:
    return seed_rank % ROBOTS_BLOCK_MOD == ROBOTS_BLOCK_REM


def render_robots_txt(specs) -> str:
    """Minimal robots.txt: one User-agent: * group with per-cik Disallows."""
    blocked_ciks = sorted({fs.cik_int for fs in specs
                           if robots_blocked_rank(fs.seed_rank)})
    lines = ["User-agent: *"]
    lines += [f"Disallow: /Archives/edgar/data/{cik}/" for cik in blocked_ciks]
    lines.append("")
    return "\n".join(lines)


def gen_ticker_chunk(n_tickers: int, filings_per_type: int, seed: int,
                     lo: int, hi: int) -> dict:
    """Everything for tickers [lo, hi): pages per wave (with extracted text),
    crawl entries per wave, golden fact rows. Chunks concatenate in rank
    order to EXACTLY the serial corpus (per-ticker generation is
    independently seeded), which is what makes write_corpus parallelizable."""
    specs = make_universe(n_tickers, filings_per_type, seed,
                          ticker_range=(lo, hi))
    by_key: dict[tuple[str, str], list[FilingSpec]] = {}
    for fs in specs:
        by_key.setdefault((fs.ticker, fs.filing_type), []).append(fs)

    w0: list[tuple[str, str]] = []
    w1: list[tuple[str, str]] = []
    w2: list[tuple[str, str]] = []
    crawl: list[tuple[str, int, int, str, str, int]] = []

    # wave 0: query pages, (seed_rank, filing_type) order
    for (ticker, ft), filings in sorted(
        by_key.items(), key=lambda kv: (kv[1][0].seed_rank, kv[0][1])
    ):
        filings_sorted = sorted(filings, key=lambda f: f.filed_date, reverse=True)
        url = (
            f"{BASE_URL}/cgi-bin/browse-edgar?action=getcompany&CIK={ticker}"
            f"&type={ft}&dateb=&owner=include&count=10&action=getcompany"
        )
        html0 = render_query_page(ticker, ft, filings_sorted, seed)
        w0.append((url, html0, extracted_text(url, html0)))
        crawl.append((url, 0, filings[0].seed_rank, ft, "", 0))

    # waves 1-2: index + report pages, (seed_rank, ft, filed_date desc, rnum)
    ordered = sorted(specs, key=lambda f: (f.seed_rank, f.filing_type,
                                           _desc(f.filed_date)))
    for fs in ordered:
        html1 = render_index_page(fs)
        w1.append((fs.index_url(), html1, extracted_text(fs.index_url(), html1)))
        crawl.append((fs.index_url(), 1, fs.seed_rank, fs.filing_type,
                      fs.filed_date, 0))
    for fs in ordered:
        for d in fs.docs:
            url = fs.report_url(d.report_num)
            html2 = render_report_page(d)
            w2.append((url, html2, extracted_text(url, html2)))
            # Ignore-classified docs (Parenthetical) exist in the pages table
            # but are never mapped, hence never crawled
            # (/root/reference/reportmap.go:139-142); robots-blocked tickers'
            # R pages exist on the "web" but never enter the crawl order.
            if d.doc_type in DOC_MERGE_PRIORITY and not robots_blocked_rank(fs.seed_rank):
                crawl.append((url, 2, fs.seed_rank, fs.filing_type,
                              fs.filed_date, d.report_num))

    golden_rows = [golden_facts(fs) for fs in specs
                   if not robots_blocked_rank(fs.seed_rank)]
    # per-index-page missing-docs golden covers EVERY index page in the pages
    # table (robots blocking gates the crawl, not the raw page content)
    missing_rows = [(fs.index_url(), golden_missing_docs(fs)) for fs in ordered]
    return {"w0": w0, "w1": w1, "w2": w2, "crawl": crawl,
            "golden": golden_rows, "missing": missing_rows}


def gen_corpus(n_tickers: int = 8, filings_per_type: int = 4, seed: int = 42,
               chunks: list[dict] | None = None) -> dict[str, pa.Table]:
    """Build the full synthetic corpus: pages + golden tables. ``chunks``
    (rank-ordered gen_ticker_chunk results) assemble byte-identically to the
    serial path."""
    if chunks is None:
        chunks = [gen_ticker_chunk(n_tickers, filings_per_type, seed,
                                   0, n_tickers)]

    pages: list[tuple[str, str]] = []
    crawl: list[tuple[str, int, int, str, str, int]] = []
    golden_rows: list[dict] = []
    for wave_key in ("w0", "w1", "w2"):
        for ch in chunks:
            pages.extend(ch[wave_key])
    for wave in (0, 1, 2):
        for ch in chunks:
            crawl.extend(e for e in ch["crawl"] if e[1] == wave)
    for ch in chunks:
        golden_rows.extend(ch["golden"])

    # the host's robots.txt is a page too (fetched out-of-band by the crawler,
    # never part of the frontier order); blocked ciks derive from the rank
    # formula, no specs needed
    blocked_ciks = sorted(1000000 + i * 9973 for i in range(n_tickers)
                          if robots_blocked_rank(i))
    robots_lines = ["User-agent: *"] + [
        f"Disallow: /Archives/edgar/data/{cik}/" for cik in blocked_ciks] + [""]
    robots_url = f"{BASE_URL}/robots.txt"
    robots_html = "\n".join(robots_lines)
    pages.append((robots_url, robots_html, extracted_text(robots_url, robots_html)))

    # pages table (shuffled deterministically so readers can't rely on order)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pages))
    base_ts = np.datetime64("2020-01-01T00:00:00", "us")
    urls, htmls, texts, tss = [], [], [], []
    for pos, idx in enumerate(order):
        url, html, text = pages[idx]
        urls.append(url)
        htmls.append(html.encode())
        texts.append(text)
        tss.append(base_ts + np.timedelta64(pos, "s"))
    pages_tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls)),
        }
    )

    # crawl order golden (already built in priority order; dedup preserves
    # first occurrence — query pages list each viewer URL twice but the golden
    # has unique urls)
    seen: set[str] = set()
    seq, g_urls, g_sha, g_host, g_wave = [], [], [], [], []
    s = 0
    for url, wave, rank, ft, date, rnum in crawl:
        if url in seen:
            continue
        seen.add(url)
        seq.append(s)
        s += 1
        g_urls.append(url)
        g_sha.append(hashlib.sha1(url.encode()).digest())
        g_host.append(HOST)
        g_wave.append(wave)
    crawl_tbl = pa.table(
        {
            "seq": pa.array(seq, pa.int64()),
            "url": pa.array(g_urls, pa.string()),
            "url_sha1": pa.array(g_sha, pa.binary()),
            "host": pa.array(g_host, pa.string()),
            "wave": pa.array(g_wave, pa.int32()),
        }
    )

    golden_tbl = pa.Table.from_pylist(golden_rows)

    missing_rows: list[tuple[str, str]] = []
    for ch in chunks:
        missing_rows.extend(ch.get("missing", ()))
    missing_tbl = pa.table({
        "url": pa.array([u for u, _ in missing_rows], pa.string()),
        "missing_docs": pa.array([m for _, m in missing_rows], pa.string()),
    })

    by_ticker: dict[str, list[dict]] = {}
    for row in golden_rows:
        by_ticker.setdefault(row["ticker"], []).append(row)
    folder_tbl = pa.table({
        "ticker": pa.array(sorted(by_ticker), pa.string()),
        "folder_json": pa.array(
            [golden_folder_json(t, by_ticker[t]) for t in sorted(by_ticker)],
            pa.string()),
    })

    seeds_tbl = pa.table(
        {
            "ticker": pa.array([f"SYN{i:04d}" for i in range(n_tickers)]),
            "cik": pa.array([f"{1000000 + i * 9973:010d}" for i in range(n_tickers)]),
            "seed_rank": pa.array(list(range(n_tickers)), pa.int32()),
        }
    )
    return {
        "pages": pages_tbl,
        "filings_golden": golden_tbl,
        "crawl_order_golden": crawl_tbl,
        "seed_tickers": seeds_tbl,
        "missing_docs_golden": missing_tbl,
        "folder_json_golden": folder_tbl,
    }


def _desc(date: str) -> str:
    """Map a YYYY-MM-DD string to a string that sorts ascending when the date
    sorts descending (9-complement of each digit)."""
    return "".join(str(9 - int(c)) if c.isdigit() else c for c in date)


def corpus_version() -> str:
    """Content hash of the generator AND the parse/report modules whose
    semantics the goldens encode (golden_facts imports go_div /
    is_same_scale / extracted_text / the tokenizer...): cached corpora embed
    it in their directory names, so a semantics change in ANY of these can
    never serve a stale /tmp cache to the driver or bench."""
    import hashlib as _h

    from ..functions import parse as _parse
    from ..functions import report as _report
    from ..functions import tokenizer as _tok
    from ..functions import xbrl as _xbrl
    from .. import schema as _schema

    h = _h.sha1()
    for mod_file in (__file__, _parse.__file__, _report.__file__,
                     _tok.__file__, _xbrl.__file__, _schema.__file__):
        with open(mod_file, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]


def write_corpus(out_dir: str, n_tickers: int = 8, filings_per_type: int = 4,
                 seed: int = 42, parallelism: int | None = None) -> dict[str, str]:
    """Write the corpus. With Ray initialized and a large ticker universe the
    per-ticker-range chunks generate as parallel Ray tasks (byte-identical to
    the serial path; asserted in tests)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    if parallelism is None:
        parallelism = 28 if (n_tickers >= 64 and ray.is_initialized()) else 1
    if parallelism > 1:
        gen_chunk = ray.remote(gen_ticker_chunk)
        bounds = np.linspace(0, n_tickers, parallelism + 1).astype(int)
        futs = [gen_chunk.remote(n_tickers, filings_per_type, seed, int(lo), int(hi))
                for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
        tables = gen_corpus(n_tickers, filings_per_type, seed,
                            chunks=ray.get(futs))
    else:
        tables = gen_corpus(n_tickers, filings_per_type, seed)
    paths = {}
    for name, tbl in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        # small row groups on the pages table so read_parquet parallelizes
        # (stands in for the many-shard layout of a real WARC-derived table)
        rgs = 2048 if name == "pages" else 64 * 1024
        pq.write_table(tbl, path, row_group_size=rgs)
        paths[name] = path
    return paths
