"""Financial-report assembly: first-write-wins set, generation, validation.

Pure-Python twin of /root/reference/data_def.go:95-248 (reflection setter,
derived-field generation, required-field validation) operating on a plain
dict-of-dicts report. Used by both the conformance tests (single-process,
reference-faithful) and the distributed groupby(accession).map_groups merge
stage (edgar_ray.stages.merge).
"""

from __future__ import annotations

import numpy as np

from ..schema import (
    DOC_BS,
    DOC_CF,
    DOC_EN,
    DOC_MERGE_PRIORITY,
    DOC_OPS,
    FACT_BY_TAG,
    STRICT_DATA_TO_DOC,
    STRUCT_FIELDS,
    fact_col,
)
from .parse import (
    filing_scale,
    fin_report_raw,
    go_div,
    go_round,
    is_same_scale,
    normalize_number,
    parse_filing_scale,
    parse_table_row,
)
from .tokenizer import TokenWalker
from .xbrl import UNKNOWN, fin_data_type_from_xbrl_tag


def new_financial_report(filing_type: str) -> dict:
    """(/root/reference/report.go:58-66)."""
    fr: dict = {"DocType": filing_type}
    for struct in ("entity", "ops", "cf", "bs"):
        fr[struct] = {f.name: 0.0 for f in STRUCT_FIELDS[struct]}
        fr[struct]["CollectedData"] = 0
    return fr


def is_collected(fr: dict, struct: str, field_name: str) -> bool:
    """(/root/reference/utils.go:137-163)."""
    for f in STRUCT_FIELDS[struct]:
        if f.name == field_name:
            return bool(fr[struct]["CollectedData"] & (1 << f.bit))
    return False


def set_data(fr: dict, fin_type: str, val: str, scales: dict[str, float], doc_type: str) -> bool:
    """First-write-wins setter with scale + strict doc gating
    (/root/reference/data_def.go:185-248). Returns True where the reference
    returns nil (success OR already-set OR strict-gated skip)."""
    strict = STRICT_DATA_TO_DOC.get(fin_type)
    if strict is not None and doc_type != strict:
        return True
    field = FACT_BY_TAG.get(fin_type)
    if field is None:
        return False
    sub = fr[field.struct]
    if sub[field.name] == 0:
        try:
            num = normalize_number(val)
        except ValueError:
            return False
        factor = scales.get(field.entity)
        if factor is not None:
            num *= float(factor)
        sub[field.name] = num
        sub["CollectedData"] |= 1 << field.bit
    return True


def generate_data(fr: dict, name: str) -> float:
    """Derived facts when missing (/root/reference/data_def.go:95-121)."""
    if name == "GrossMargin":
        if is_collected(fr, "ops", "Revenue") and is_collected(fr, "ops", "CostOfSales"):
            return fr["ops"]["Revenue"] - fr["ops"]["CostOfSales"]
    elif name == "Dps":
        if is_collected(fr, "cf", "Dividends"):
            if is_collected(fr, "ops", "WAShares"):
                return go_round(go_div(fr["cf"]["Dividends"] * -1, fr["ops"]["WAShares"]))
            if is_collected(fr, "entity", "ShareCount"):
                return go_round(go_div(fr["cf"]["Dividends"] * -1, fr["entity"]["ShareCount"]))
    elif name == "OpExpense":
        if (
            is_collected(fr, "ops", "Revenue")
            and is_collected(fr, "ops", "CostOfSales")
            and is_collected(fr, "ops", "OpIncome")
        ):
            return go_round(fr["ops"]["Revenue"] - fr["ops"]["CostOfSales"] - fr["ops"]["OpIncome"])
    return 0.0


def _validate_struct(fr: dict, struct: str) -> str:
    err = ""
    sub = fr[struct]
    for f in STRUCT_FIELDS[struct]:
        if not is_collected(fr, struct, f.name) and f.required:
            if f.generate:
                num = generate_data(fr, f.name)
                if num == 0:
                    err += f.name + ","
                else:
                    sub[f.name] = num
                    sub["CollectedData"] |= 1 << f.bit
            else:
                err += f.name + ","
    if err:
        return "[" + err + "]"
    return ""


def validate_financial_report(fr: dict) -> str:
    """Generation + required-field validation + the WAShares/ShareCount scale
    sanity override (/root/reference/data_def.go:123-183). Returns the error
    string ('' when valid); the report is mutated in place."""
    if not is_same_scale(fr["entity"]["ShareCount"], fr["ops"]["WAShares"]):
        # Scale mismatch: override with share count — sets the value WITHOUT
        # marking it collected, exactly like the reference
        # (/root/reference/data_def.go:160-163).
        fr["ops"]["WAShares"] = fr["entity"]["ShareCount"]

    ret = ""
    for struct, doc in (("bs", DOC_BS), ("entity", DOC_EN), ("cf", DOC_CF), ("ops", DOC_OPS)):
        err = _validate_struct(fr, struct)
        if err:
            ret += "Missing fields in " + doc + err + "\n"
    return ret


def _go_round_vec(v: np.ndarray) -> np.ndarray:
    """Vector twin of go_round: floor(x*100)/100; np.floor already passes
    Inf/NaN through, matching the scalar's isfinite guard."""
    return np.floor(v * 100.0) / 100.0


def validate_reports_batch(
    vals: dict[str, np.ndarray], bits: dict[str, np.ndarray]
) -> np.ndarray:
    """Vectorized twin of ``validate_financial_report`` over columnar
    reports: ``vals[fact_col]`` float64 arrays and ``bits[struct]`` uint64
    presence masks (both mutated in place, like the scalar's in-place
    report mutation). Returns an object array of validation-error strings.

    Equivalence argument (parity-tested in tests/test_properties.py::
    test_validate_reports_batch_matches_scalar): numpy float64 division IS
    ``go_div`` (IEEE-754:
    x/0 = ±Inf with the copysign rule, 0/0 = NaN), so the WAShares
    same-scale check and the Dps division reproduce the Go semantics
    bitwise; the three generated fields (GrossMargin, OpExpense, Dps) read
    only never-generated inputs, so computing them up front equals the
    scalar's in-order generation; error strings concatenate per-field
    flags in the same struct/field declaration order.
    """
    n = next(iter(vals.values())).shape[0]
    one = vals[fact_col(FACT_BY_TAG["Shares Outstanding"])]
    two = vals[fact_col(FACT_BY_TAG["Weighted Average Share Count"])]
    with np.errstate(divide="ignore", invalid="ignore"):
        val = np.where(one < two, (two - one) / one, (one - two) / two)
        same = val <= 1.0  # NaN compares False, matching the scalar
        vals[fact_col(FACT_BY_TAG["Weighted Average Share Count"])] = \
            np.where(same, two, one)

        def col(tag: str) -> np.ndarray:
            f = FACT_BY_TAG[tag]
            return vals[fact_col(f)]

        def got(tag: str) -> np.ndarray:
            f = FACT_BY_TAG[tag]
            return (bits[f.struct] & np.uint64(1 << f.bit)) != 0

        gm = np.where(
            got("Revenue") & got("Cost Of Revenue"),
            col("Revenue") - col("Cost Of Revenue"), 0.0)
        was = vals[fact_col(FACT_BY_TAG["Weighted Average Share Count"])]
        neg_div = col("Dividends paid") * -1.0
        dps = np.where(
            got("Dividends paid") & got("Weighted Average Share Count"),
            _go_round_vec(neg_div / was),
            np.where(
                got("Dividends paid") & got("Shares Outstanding"),
                _go_round_vec(neg_div / col("Shares Outstanding")), 0.0))
        opex = np.where(
            got("Revenue") & got("Cost Of Revenue")
            & got("Operational Income"),
            _go_round_vec(col("Revenue") - col("Cost Of Revenue")
                          - col("Operational Income")), 0.0)
    gen_vals = {"GrossMargin": gm, "Dps": dps, "OpExpense": opex}

    errs = np.full(n, "", dtype=object)
    for struct, doc in (("bs", DOC_BS), ("entity", DOC_EN),
                        ("cf", DOC_CF), ("ops", DOC_OPS)):
        part = np.full(n, "", dtype=object)
        b = bits[struct]
        any_part = False
        for f in STRUCT_FIELDS[struct]:
            if not f.required:
                continue
            missing = (b & np.uint64(1 << f.bit)) == 0
            if f.generate:
                num = gen_vals[f.name]
                hit = missing & (num != 0)  # NaN/Inf count as hits (scalar:
                c = fact_col(f)             # `num == 0` is False for them)
                vals[c] = np.where(hit, num, vals[c])
                b = np.where(hit, b | np.uint64(1 << f.bit), b)
                flag = missing & ~hit
            else:
                flag = missing
            if flag.any():
                part = np.where(flag, part + (f.name + ","), part)
                any_part = True
        bits[struct] = b
        if any_part:
            has = part != ""
            errs = np.where(
                has,
                errs + ("Missing fields in " + doc + "[") + part + "]\n",
                errs)
    return errs


def fin_report_parser(page: str | bytes, fr: dict, doc_type: str) -> dict:
    """Single-document parse into a report (/root/reference/parser.go:326-347):
    heading -> scales, then per row: first cell -> XBRL tag -> fact; first
    non-empty value cell that sets successfully wins."""
    w = TokenWalker(page)
    scales = parse_filing_scale(w, doc_type)
    data = parse_table_row(w, True)
    while data is not None:
        if data:
            fin_type = fin_data_type_from_xbrl_tag(data[0])
            if fin_type != UNKNOWN:
                for s in data[1:]:
                    if s and set_data(fr, fin_type, s, scales, doc_type):
                        break
        data = parse_table_row(w, True)
    return fr


def apply_doc_rows(
    fr: dict,
    doc_type: str,
    headings: list[str],
    rows: list[tuple[int, list[str]]],
) -> None:
    """Replay one document's raw rows into a report — the merge half of
    fin_report_parser, used by the distributed pipeline on fin_report_raw
    output. Rows must be in document order (row_idx ascending)."""
    scales = filing_scale(headings, doc_type) if headings else {}
    for _idx, cells in rows:
        if not cells:
            continue
        fin_type = fin_data_type_from_xbrl_tag(cells[0])
        if fin_type != UNKNOWN:
            for s in cells[1:]:
                if s and set_data(fr, fin_type, s, scales, doc_type):
                    break


def merge_docs(
    filing_type: str,
    docs: dict[str, tuple[list[str], list[tuple[int, list[str]]]]],
) -> tuple[dict, str]:
    """Deterministic multi-document merge: documents applied in fixed
    DOC_MERGE_PRIORITY order (replacing the reference's unsynchronized
    concurrent merge, /root/reference/parser.go:373-388), then validated.

    docs: {doc_type: (headings, rows)}. Returns (report, validation_error).
    """
    fr = new_financial_report(filing_type)
    for doc_type in sorted(docs, key=lambda d: DOC_MERGE_PRIORITY.get(d, 99)):
        headings, rows = docs[doc_type]
        apply_doc_rows(fr, doc_type, headings, rows)
    err = validate_financial_report(fr)
    return fr, err


def parse_filing(
    filing_type: str, doc_pages: dict[str, str | bytes]
) -> tuple[dict, str]:
    """End-to-end single-process filing parse: {doc_type: page html} ->
    merged + validated report. Conformance twin of
    /root/reference/parser.go:373-388."""
    docs = {t: fin_report_raw(page) for t, page in doc_pages.items()}
    return merge_docs(filing_type, docs)


def collected_fact_names(fr: dict) -> list[str]:
    """Names of all set facts, in Entity, Bs, Cf, Ops struct-field order
    (/root/reference/filing.go:279-302)."""
    out: list[str] = []
    for struct in ("entity", "bs", "cf", "ops"):
        for f in STRUCT_FIELDS[struct]:
            if is_collected(fr, struct, f.name):
                out.append(f.name)
    return out
