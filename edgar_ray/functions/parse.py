"""Pure parse functions, faithful to the reference's walk semantics.

Each function cites the reference implementation it matches
(/root/reference/parser.go, reportmap.go, utils.go, date.go). These are the
byte-parity layer: the map_batches stages in edgar_ray.stages call these, and
the golden tests lock them against the 17 reference sample pages.
"""

from __future__ import annotations

import math

from ..schema import (
    DOC_BS,
    DOC_CF,
    DOC_DEBT,
    DOC_EN,
    DOC_EPS_NOTES,
    DOC_EQUITY,
    DOC_IGNORE,
    DOC_INC,
    DOC_OPS,
    ENTITY_MONEY,
    ENTITY_PER_SHARE,
    ENTITY_SHARES,
    REQUIRED_DOC_TYPES,
    SCALE_BILLION,
    SCALE_MILLION,
    SCALE_NONE,
    SCALE_THOUSAND,
    THRESHOLD_YEAR,
)
from .tokenizer import END, ERROR, START, TEXT, TokenWalker

# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


def normalize_number(s: str) -> float:
    """Currency-string -> float: parens negate, strip $/spaces, drop thousands
    commas, keep only the first decimal segment (/root/reference/utils.go:11-46).

    Raises ValueError where the reference returns an error.
    """
    negative = -1.0 if ("(" in s and ")" in s) else 1.0
    s = s.lstrip(" ").lstrip("$").lstrip(" ").rstrip(" ").lstrip("(").rstrip(")")
    parts = s.split(".")
    dec = parts[1] if len(parts) > 1 else ""
    s1 = "".join(parts[0].split(","))
    if dec != "":
        s1 += "." + dec
    if "_" in s1 or not s1:
        # go's strconv.ParseFloat rejects underscores/empty
        raise ValueError(f"Error normalizing number: {s!r}")
    return float(s1) * negative


def go_round(val: float) -> float:
    """floor(x*100)/100 — truncation, NOT half-up (/root/reference/utils.go:165-167).
    Go's math.Floor passes Inf/NaN through; Python's math.floor would raise."""
    if not math.isfinite(val):
        return val
    return math.floor(val * 100) / 100


def go_div(a: float, b: float) -> float:
    """IEEE-754 float division with Go semantics: x/0 = ±Inf, 0/0 = NaN —
    never a trap (Go has no float division panic; the reference's Dps
    generation can divide by an explicitly-zero WAShares,
    /root/reference/data_def.go:105-111)."""
    if b == 0.0:
        if a == 0.0:
            return math.nan
        return math.inf if (a > 0) == (math.copysign(1.0, b) > 0) else -math.inf
    return a / b


def is_same_scale(one: float, two: float) -> bool:
    """Relative difference <= 1.0 (/root/reference/utils.go:169-181).

    Mirrors the reference's division-by-zero behavior via IEEE inf/nan:
    both divisions run with Go float semantics (x/0 = ±Inf, 0/0 = NaN) and
    the ``one < two`` recompute is applied AFTER the first division, exactly
    as the Go source orders it — e.g. (one<0, two==0) gives -Inf then
    recomputes val=(two-one)/one = -1 <= 1 → True, which a shortcut that
    jumps straight to Inf on ZeroDivisionError would get wrong.
    """
    val = go_div(one - two, two)
    if one < two:
        val = go_div(two - one, one)
    if math.isnan(val):
        return False
    return val <= 1


def get_fin_data_xbrl_tag(onclick: str) -> str | None:
    """Extract the defref_* token from showAR(...) onclick
    (/root/reference/utils.go:81-91). None where the reference errors."""
    if "showAR" in onclick:
        d = onclick.split("'")
        if len(d) == 3 and "defref" in d[1]:
            return d[1]
    return None


def get_year(date: str) -> int:
    """(/root/reference/date.go:32-37); Atoi failure -> 0."""
    try:
        return int(date.split("-")[0])
    except ValueError:
        return 0


# ---------------------------------------------------------------------------
# Table walkers (share one TokenWalker cursor across calls, like the
# reference shares one html.Tokenizer)
# ---------------------------------------------------------------------------

REQ_HYPERLINKS = frozenset(("interactiveDataBtn",))


def parse_hyperlink_tag(w: TokenWalker, token: tuple) -> str:
    """(/root/reference/parser.go:205-244). Returns the XBRL tag immediately
    on a showAR onclick (cursor stays at the <a>); otherwise consumes to </a>
    and returns href only for id=interactiveDataBtn."""
    href = ""
    anchor_id = ""
    for key, val in token[2]:
        if key == "id":
            anchor_id = val
        elif key == "href":
            href = val
        elif key == "onclick":
            tag = get_fin_data_xbrl_tag(val)
            if tag is not None:
                return tag
    t = token
    while not (t[1] == "a" and t[0] == END):
        if w.next() == ERROR:
            break
        t = w.token()
    if anchor_id in REQ_HYPERLINKS:
        return href
    return ""


def parse_table_data(w: TokenWalker, parse_href: bool) -> str:
    """First non-empty trimmed text in a <td>, or hyperlink payload when
    parse_href (/root/reference/parser.go:129-160)."""
    t = w.token()
    while not (t[1] == "td" and t[0] == END):
        if t[0] == ERROR and w.at_end():
            break
        if parse_href and t[1] == "a" and t[0] == START:
            s = parse_hyperlink_tag(w, t)
            if s:
                return s
        elif t[0] == TEXT:
            s = t[1].strip()
            if s:
                return s
        w.next()
        t = w.token()
    return ""


def parse_table_row(w: TokenWalker, parse_href: bool) -> list[str] | None:
    """Scan to the next <tr>, collect one string per <td>; cells with
    class num/nump suppress href extraction (/root/reference/parser.go:162-199).
    Returns None at end of input (the reference's 'Done with parsing')."""
    ret: list[str] = []
    t = w.token()
    while not (t[0] == START and t[1] == "tr"):
        if w.next() == ERROR:
            return None
        t = w.token()
    while not (t[1] == "tr" and t[0] == END):
        if t[0] == ERROR and w.at_end():
            return None
        if t[1] == "td" and t[0] == START:
            flag = parse_href
            for key, val in t[2]:
                if key == "class" and (val == "nump" or val == "num"):
                    flag = False
            s = parse_table_data(w, flag)
            if s:
                ret.append(s)
        w.next()
        t = w.token()
    return ret


def parse_table_title(w: TokenWalker) -> list[str]:
    """All non-empty trimmed texts within a <th> (/root/reference/parser.go:246-272)."""
    strs: list[str] = []
    t = w.token()
    while not (t[1] == "th" and t[0] == END):
        if t[0] == ERROR and w.at_end():
            break
        if t[0] == TEXT:
            s = t[1].strip()
            if s:
                strs.append(s)
        w.next()
        t = w.token()
    return strs


def parse_table_heading(w: TokenWalker) -> list[str] | None:
    """All <th> texts of the next row (/root/reference/parser.go:274-305)."""
    ret: list[str] = []
    t = w.token()
    while not (t[0] == START and t[1] == "tr"):
        if w.next() == ERROR:
            return None
        t = w.token()
    while not (t[1] == "tr" and t[0] == END):
        if t[0] == ERROR and w.at_end():
            return None
        if t[1] == "th" and t[0] == START:
            strs = parse_table_title(w)
            if strs:
                ret.extend(strs)
        w.next()
        t = w.token()
    return ret


# ---------------------------------------------------------------------------
# Scale inference
# ---------------------------------------------------------------------------


def filing_scale(strs: list[str], doc_type: str) -> dict[str, float]:
    """Infer unit multipliers from heading text (/root/reference/utils.go:48-79).

    Defaults: Money=1e6; Shares=1 for Entity docs else 1e6; PerShare=1.
    """
    ret = {
        ENTITY_SHARES: SCALE_NONE if doc_type == DOC_EN else SCALE_MILLION,
        ENTITY_MONEY: SCALE_MILLION,
        ENTITY_PER_SHARE: SCALE_NONE,
    }
    for s in strs:
        for part in s.lower().split(","):
            if "share" in part:
                if "thousand" in part:
                    ret[ENTITY_SHARES] = SCALE_THOUSAND
                elif "million" in part:
                    ret[ENTITY_SHARES] = SCALE_MILLION
            elif "$" in part or "usd" in part:
                if "thousand" in part:
                    ret[ENTITY_MONEY] = SCALE_THOUSAND
                elif "billion" in part:
                    ret[ENTITY_MONEY] = SCALE_BILLION
    return ret


def parse_filing_scale(w: TokenWalker, doc_type: str) -> dict[str, float]:
    """(/root/reference/parser.go:307-316)."""
    data = parse_table_heading(w)
    if data:
        return filing_scale(data, doc_type)
    return {}


# ---------------------------------------------------------------------------
# Page parsers
# ---------------------------------------------------------------------------


def query_page_parser(page: str | bytes, filing_type: str) -> dict[str, str]:
    """Query page -> {filed_date: interactive-viewer href}. Drops AMEND
    filings (5-cell + exact type check) and pre-threshold years
    (/root/reference/parser.go:34-53)."""
    w = TokenWalker(page)
    filing_info: dict[str, str] = {}
    data = parse_table_row(w, True)
    while data is not None:
        if len(data) == 5 and data[0] == filing_type:
            if get_year(data[3]) >= THRESHOLD_YEAR:
                filing_info[data[3]] = data[1]
        data = parse_table_row(w, True)
    return filing_info


def cik_page_parser(page: str | bytes) -> str | None:
    """Scan XML for the <cik> element text (/root/reference/parser.go:55-76)."""
    w = TokenWalker(page)
    t = w.token()
    while not (t[1] == "cik" and t[0] == START):
        if w.next() == ERROR:
            return None
        t = w.token()
    while not (t[1] == "cik" and t[0] == END):
        if t[0] == TEXT:
            s = t[1].strip()
            if s:
                return s
        if w.next() == ERROR:
            return None
        t = w.token()
    return None


def _decode(page: str | bytes) -> str:
    if isinstance(page, bytes):
        try:
            return page.decode("utf-8")
        except UnicodeDecodeError:
            return page.decode("latin-1")
    return page


def parse_report_links(page: str | bytes) -> tuple[list[str], int]:
    """Line-scan for the 'var reports = new Array(N)' JS block; collect N-1
    report links, rewriting .xml -> .htm (/root/reference/parser.go:86-122).

    Returns (links, index_of_last_consumed_line); index -1 when no block found
    (then the whole reader was consumed).
    """
    s = _decode(page)
    lines = s.split("\n")
    filing_links: list[str] = []
    li = 0
    n = len(lines)
    while li < n:
        line = lines[li]
        if "var reports" in line:
            cnt = int(line.split("(")[1].split(")")[0])
            # cnt-1 because the 'all' entry at the end is skipped
            for _ in range(cnt - 1):
                li += 1
                if li >= n:
                    raise ValueError("unexpected EOF in reports array")
                s1 = lines[li].split(" = ")
                s3 = s1[1].split(";")[0].strip('"')
                s4 = s3.split(".")
                s5 = s3
                if s4[1] == "xml":
                    s5 = s4[0] + ".htm"
                if "htm" not in s5:
                    raise ValueError("Dont know this type of report")
                filing_links.append(s5)
            return filing_links, li
        li += 1
    return filing_links, -1


def get_menu_category(data: str) -> str:
    """lowercase contains-classifier (/root/reference/reportmap.go:21-32)."""
    data = data.lower()
    if "financial" in data and "statement" in data:
        if "note" in data:
            return "Notes to Financial statements"
        return "Financial statements"
    if "cover" in data:
        return "Cover"
    return "Unknown"


def lookup_doc_type(data: str, menu: str) -> str:
    """uppercase contains-classifier mapping report titles to doc types
    (/root/reference/reportmap.go:34-78)."""
    data = data.upper()
    if menu == "Cover" and "DOCUMENT" in data and "ENTITY" in data:
        return DOC_EN
    if menu == "Financial statements":
        if "PARENTHETICAL" in data:
            return DOC_IGNORE
        if "BALANCE SHEET" in data:
            return DOC_BS
        if "FINANCIAL POSITION" in data:
            return DOC_BS
        if "OPERATIONS" in data:
            return DOC_OPS
        if "INCOME" in data:
            return DOC_INC
        if "EARNINGS" in data:
            return DOC_INC
        if "CASH FLOWS" in data:
            return DOC_CF
    elif menu == "Notes to Financial statements":
        if "EARNINGS" in data and "SHARE" in data:
            return DOC_EPS_NOTES
        if "SHAREHOLDER" in data and "EQUITY" in data:
            return DOC_EQUITY
        if "DEBT" in data:
            return DOC_DEBT
    return DOC_IGNORE


def get_missing_docs(data: dict[str, str]) -> str:
    """Completeness check with Ops <-> Income equivalence
    (/root/reference/reportmap.go:80-112)."""
    if len(data) >= len(REQUIRED_DOC_TYPES):
        return ""
    diff = []
    for key in REQUIRED_DOC_TYPES:
        if key not in data:
            if key == DOC_OPS and DOC_INC in data:
                continue
            if key == DOC_INC and DOC_OPS in data:
                continue
            diff.append(key)
    if not diff:
        return ""
    return "[ " + "".join(" " + d for d in diff) + " ]"


def map_reports(page: str | bytes, filing_links: list[str]) -> dict[str, str]:
    """Walk the accordion menu: classify each loadReport(n) anchor's text via
    the current menu category, first-wins per doc type; stop past the notes
    menu (/root/reference/reportmap.go:114-169)."""
    menu_category = "Unknown"
    ret: dict[str, str] = {}
    w = TokenWalker(page)
    tt = w.next()
    while tt != ERROR:
        token = w.token()
        if token[1] == "a":
            for key, val in token[2]:
                if key == "href" and "loadReport" in val:
                    strs = val.split("loadReport")
                    s1 = strs[1].strip(";").strip("()")
                    try:
                        report_num = int(s1)
                    except ValueError:
                        report_num = 0
                    tt = w.next()  # the text that describes the report
                    if tt != TEXT:
                        break
                    token = w.token()
                    doc_type = lookup_doc_type(token[1], menu_category)
                    if doc_type != DOC_IGNORE:
                        if doc_type not in ret:
                            ret[doc_type] = filing_links[report_num - 1]
                elif key == "id" and "menu_cat" in val:
                    while not (token[1] == "a" and token[0] == END):
                        if token[0] == TEXT:
                            menu_category = get_menu_category(token[1].strip())
                        if w.next() == ERROR:
                            break
                        token = w.token()
                    if menu_category == "Unknown":
                        # Gone past notes of financial statements; stop.
                        return ret
        tt = w.next()
    return ret


def filing_page_parser(page: str | bytes, filing_type: str | None = None) -> dict[str, str]:
    """Filing index page -> {doc_type: R-report url}
    (/root/reference/parser.go:86-127 + reportmap.go:114-169)."""
    s = _decode(page)
    filing_links, last_line = parse_report_links(s)
    if last_line < 0:
        rest = ""
    else:
        rest = "\n".join(s.split("\n")[last_line + 1 :])
    return map_reports(rest, filing_links)


def fin_report_raw(page: str | bytes) -> tuple[list[str], list[tuple[int, list[str]]]]:
    """R-report page -> (heading strings, [(row_idx, cells), ...]).

    The raw per-page extraction used by the distributed pipeline: the heading
    row feeds scale inference (which needs the doc type, only known at merge
    time) and each table row's cells feed the first-write-wins merge
    (/root/reference/parser.go:326-347 split into parse + merge halves).
    Rows are every parsed table row, in document order.
    """
    w = TokenWalker(page)
    headings = parse_table_heading(w) or []
    rows: list[tuple[int, list[str]]] = []
    idx = 0
    data = parse_table_row(w, True)
    while data is not None:
        if data:
            rows.append((idx, data))
        idx += 1
        data = parse_table_row(w, True)
    return headings, rows


def iter_table_rows(page: str | bytes, parse_href: bool = True) -> list[list[str]]:
    """All parsed table rows of a page — the canonical per-url extracted-text
    definition (see extracted_text)."""
    w = TokenWalker(page)
    out: list[list[str]] = []
    data = parse_table_row(w, parse_href)
    while data is not None:
        if data:
            out.append(data)
        data = parse_table_row(w, parse_href)
    return out


def extracted_text(url: str, page: str | bytes) -> str:
    """Canonical per-url extracted text (the pages.text golden column).

    - filing index pages (….htm viewer/index with a reports array): sorted
      "docType\\turl" lines from filing_page_parser;
    - every other page (query pages, R-report pages): tab-joined parsed table
      rows via the reference row walk.
    """
    s = _decode(page)
    if "var reports" in s:
        docs = filing_page_parser(s)
        return "\n".join(f"{k}\t{docs[k]}" for k in sorted(docs))
    return "\n".join("\t".join(r) for r in iter_table_rows(s, True))
