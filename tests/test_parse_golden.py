"""Golden conformance tests: our parse layer vs the reference's own test
corpus (/root/reference/samples/*, expected values lifted from
/root/reference/parser_test.go). These lock the byte-parity invariant of
BASELINE.json input_hint."""

import re

import pytest

from conftest import sample
from edgar_ray.functions.parse import (
    cik_page_parser,
    extracted_text,
    filing_page_parser,
    get_fin_data_xbrl_tag,
    get_year,
    go_round,
    is_same_scale,
    normalize_number,
    parse_table_row,
    query_page_parser,
)
from edgar_ray.functions.report import (
    collected_fact_names,
    fin_report_parser,
    new_financial_report,
    parse_filing,
)
from edgar_ray.functions.tokenizer import TokenWalker
from edgar_ray.functions.xbrl import XBRL_TAGS, fin_data_type_from_xbrl_tag
from edgar_ray.schema import DOC_BS, DOC_CF, DOC_EN, DOC_INC, DOC_OPS, FILING_10K, FILING_10Q

# Inline snippets from /root/reference/parser_test.go:14-25 (test inputs, not code).
SAMPLE_TABLE_ROW = '<tr><td nowrap="nowrap">10-Q</td><td nowrap="nowrap"><a href="/Archives/edgar/data/320193/000032019318000100/0000320193-18-000100-index.htm" id="documentsbutton">&nbsp;Documents</a>&nbsp; <a href="/cgi-bin/viewer?action=view&amp;cik=320193&amp;accession_number=0000320193-18-000100&amp;xbrl_type=v" id="interactiveDataBtn">&nbsp;Interactive Data</a></td><td class="small" >Quarterly report [Sections 13 or 15(d)]<br />Acc-no: 0000320193-18-000100&nbsp;(34 Act)&nbsp; Size: 9 MB            </td><td>2018-08-01</td><td nowrap="nowrap"><a href="/cgi-bin/browse-edgar?action=getcompany&amp;filenum=001-36743&amp;owner=exclude&amp;count=10">001-36743</a><br>18985212         </td></tr><tr class="blueRow">'

SAMPLE_ROW_XBRL = """<tr class="reu"><td class="pl " style="border-bottom: 0px;" valign="top"><a class="a" href="javascript:void(0);" onclick="top.Show.showAR( this, 'defref_us-gaap_StockholdersEquity', window );">Total shareholders&#8217; equity</a></td><td class="nump">134,047<span></span>
</td><td class="nump">128,249<span></span></td></tr>"""

SAMPLE_ROW_NUM_IN_LINK = """<tr class="re">
        <td class="pl " style="border-bottom: 0px;" valign="top"><a class="a" href="javascript:void(0);" onclick="top.Show.showAR( this, 'defref_dei_EntityCommonStockSharesOutstanding', window );">Entity Common Stock, Shares Outstanding</a></td>
        <td class="text">&#xA0;<span></span></td>
        <td class="nump"><a title="dei_EntityCommonStockSharesOutstanding" onclick="toggleNextSibling(this);">266,252,295</a><span style="display:none;white-space:normal;text-align:left;">dei_EntityCommonStockSharesOutstanding</span><span></span></td>
        <td class="text">&#xA0;<span></span></td>
      </tr>
"""


class TestTableRow:
    def test_query_row(self):
        w = TokenWalker(SAMPLE_TABLE_ROW)
        data = parse_table_row(w, True)
        assert data is not None
        assert len(data) == 5
        assert data[0] == "10-Q"
        assert (
            data[1]
            == "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000100&xbrl_type=v"
        )
        assert data[3] == "2018-08-01"

    def test_xbrl_row(self):
        w = TokenWalker(SAMPLE_ROW_XBRL)
        data = parse_table_row(w, True)
        assert data == ["defref_us-gaap_StockholdersEquity", "134,047", "128,249"]

    def test_num_in_link(self):
        w = TokenWalker(SAMPLE_ROW_NUM_IN_LINK)
        data = parse_table_row(w, True)
        assert data == ["defref_dei_EntityCommonStockSharesOutstanding", "266,252,295"]


class TestQueryPage:
    def test_filing_query(self):
        valid = {
            "2018-08-01": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000100&xbrl_type=v",
            "2018-05-02": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000070&xbrl_type=v",
            "2018-02-02": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-18-000007&xbrl_type=v",
            "2017-08-02": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0000320193-17-000009&xbrl_type=v",
            "2017-05-03": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001628280-17-004790&xbrl_type=v",
            "2017-02-01": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001628280-17-000717&xbrl_type=v",
            "2016-07-27": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001628280-16-017809&xbrl_type=v",
            "2016-04-27": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001193125-16-559625&xbrl_type=v",
            "2016-01-27": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001193125-16-439878&xbrl_type=v",
            "2015-07-22": "/cgi-bin/viewer?action=view&cik=320193&accession_number=0001193125-15-259935&xbrl_type=v",
        }
        links = query_page_parser(sample("sample_query.html"), FILING_10Q)
        assert links == valid


class TestFilingIndex:
    def test_10q(self):
        base = "/Archives/edgar/data/320193/000032019318000100/"
        docs = filing_page_parser(sample("sample_10Q.html"), FILING_10Q)
        assert docs[DOC_CF] == base + "R7.htm"
        assert docs[DOC_INC] == base + "R3.htm"
        assert docs[DOC_EN] == base + "R1.htm"
        assert docs[DOC_OPS] == base + "R2.htm"
        assert docs[DOC_BS] == base + "R5.htm"

    def test_10k(self):
        base = "/Archives/edgar/data/320193/000119312515356351/"
        docs = filing_page_parser(sample("sample_10K.html"), FILING_10K)
        assert docs[DOC_CF] == base + "R8.htm"
        assert docs[DOC_INC] == base + "R3.htm"
        assert docs[DOC_EN] == base + "R1.htm"
        assert docs[DOC_OPS] == base + "R2.htm"
        assert docs[DOC_BS] == base + "R5.htm"

    def test_10k_1(self):
        base = "/Archives/edgar/data/320193/000119312511282113/"
        docs = filing_page_parser(sample("sample_10K_1.html"), FILING_10K)
        assert docs[DOC_CF] == base + "R6.htm"
        assert docs[DOC_EN] == base + "R1.htm"
        assert docs[DOC_OPS] == base + "R2.htm"
        assert docs[DOC_BS] == base + "R3.htm"


class TestReportParsers:
    def test_entity(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_entity.html"), fr, DOC_EN)
        assert fr["entity"]["ShareCount"] == 4829926000

    def test_entity1(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_entity1.html"), fr, DOC_EN)
        assert fr["entity"]["ShareCount"] == 266252295

    def test_10k_entity(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_10K_entity.html"), fr, DOC_EN)
        assert fr["entity"]["ShareCount"] == 5575331000

    def test_ops(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_ops.html"), fr, DOC_OPS)
        ops = fr["ops"]
        assert ops["Revenue"] == 53265000000
        assert ops["CostOfSales"] == 32844000000
        assert ops["GrossMargin"] == 20421000000
        assert ops["OpExpense"] == 7809000000
        assert ops["OpIncome"] == 12612000000
        assert ops["NetIncome"] == 11519000000

    def test_10k_ops(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_10K_ops.html"), fr, DOC_OPS)
        ops = fr["ops"]
        assert ops["Revenue"] == 233715000000
        assert ops["CostOfSales"] == 140089000000
        assert ops["GrossMargin"] == 93626000000
        assert ops["OpExpense"] == 22396000000
        assert ops["OpIncome"] == 71230000000
        assert ops["NetIncome"] == 53394000000

    def test_cf(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_cf.html"), fr, DOC_CF)
        assert fr["cf"]["OpCashFlow"] == 57911000000
        assert fr["cf"]["CapEx"] == -10272000000

    def test_10k_cf(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_10K_cf.html"), fr, DOC_CF)
        assert fr["cf"]["OpCashFlow"] == 81266000000
        assert fr["cf"]["CapEx"] == -11247000000

    def test_bs(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_bs.html"), fr, DOC_BS)
        bs = fr["bs"]
        assert bs["CLiab"] == 88548000000
        assert bs["LDebt"] == 97128000000
        assert bs["Retained"] == 79436000000
        assert bs["Cash"] == 31971000000
        assert bs["Liab"] == 234248000000
        assert bs["Assets"] == 349197000000

    def test_bs1(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_bs1.html"), fr, DOC_BS)
        bs = fr["bs"]
        assert bs["CLiab"] == 5018600000
        assert bs["LDebt"] == 14846300000
        assert bs["Deferred"] == 27000000
        assert bs["Equity"] == 28331100000
        assert bs["Retained"] == -198200000
        assert bs["Goodwill"] == 24521500000
        assert bs["Intangibles"] == 19188400000
        assert bs["Cash"] == 250000000
        assert bs["Liab"] == 24193600000
        assert bs["Assets"] == 52529100000

    def test_10k_bs(self):
        fr = new_financial_report(FILING_10K)
        fin_report_parser(sample("sample_10K_bs.html"), fr, DOC_BS)
        bs = fr["bs"]
        assert bs["CLiab"] == 80610000000
        assert bs["LDebt"] == 53463000000
        assert bs["Retained"] == 92284000000
        assert bs["Liab"] == 171124000000
        assert bs["Assets"] == 290479000000


class TestFullFiling:
    def test_merged_10k(self):
        """Merge the per-statement sample docs into one report (deterministic
        replacement for the reference's concurrent merge)."""
        fr, err = parse_filing(
            FILING_10K,
            {
                DOC_EN: sample("sample_10K_entity.html"),
                DOC_OPS: sample("sample_10K_ops.html"),
                DOC_CF: sample("sample_10K_cf.html"),
                DOC_BS: sample("sample_10K_bs.html"),
            },
        )
        assert fr["ops"]["Revenue"] == 233715000000
        assert fr["cf"]["OpCashFlow"] == 81266000000
        assert fr["bs"]["Assets"] == 290479000000
        assert fr["entity"]["ShareCount"] == 5575331000
        names = collected_fact_names(fr)
        assert "Revenue" in names and "Assets" in names


class TestScalars:
    def test_normalize_number(self):
        assert normalize_number("$ (1,234.5)") == -1234.5
        assert normalize_number("134,047") == 134047
        assert normalize_number("(4,257)") == -4257
        assert normalize_number("$ 31,971") == 31971
        assert normalize_number("0.64") == 0.64
        with pytest.raises(ValueError):
            normalize_number("—")  # em-dash placeholder
        with pytest.raises(ValueError):
            normalize_number("")

    def test_round_truncates(self):
        assert go_round(1.239) == 1.23
        assert go_round(-1.231) == -1.24  # floor, not trunc

    def test_is_same_scale(self):
        assert is_same_scale(100, 60)
        assert not is_same_scale(1000, 10)
        assert not is_same_scale(100, 0)

    def test_xbrl_fallback(self):
        assert (
            fin_data_type_from_xbrl_tag("defref_msft_NetIncomeLoss") == "Net Income"
        )
        assert fin_data_type_from_xbrl_tag("defref_us-gaap_Nope") == "Unknown"
        assert fin_data_type_from_xbrl_tag("defref_us-gaap_Assets") == "Total Assets"

    def test_onclick_tag(self):
        assert (
            get_fin_data_xbrl_tag(
                "top.Show.showAR( this, 'defref_us-gaap_StockholdersEquity', window );"
            )
            == "defref_us-gaap_StockholdersEquity"
        )
        assert get_fin_data_xbrl_tag("javascript:void(0)") is None

    def test_get_year(self):
        assert get_year("2018-08-01") == 2018
        assert get_year("bogus") == 0


def test_xbrl_map_parity_with_reference():
    """Data parity: every tag entry in /root/reference/xbrltags.go:11-116 maps
    to the same fact name here (the Go source is read as DATA, not code)."""
    src = open("/root/reference/xbrltags.go").read()
    go_fact_names = {
        "finDataTotalEquity": "Total Shareholder Equity",
        "finDataRetained": "Retained Earnings",
        "finDataCLiab": "Current Liabilities",
        "finDataCAssets": "Current Assets",
        "finDataAssets": "Total Assets",
        "finDataLiab": "Total Liabilities",
        "finDataCash": "Cash",
        "finDataGoodwill": "Goodwill",
        "finDataIntangible": "Intangibles",
        "finDataLDebt": "Long-Term debt",
        "finDataSDebt": "Short-Term debt",
        "finDataDeferred": "Deferred revenue",
        "finDataRevenue": "Revenue",
        "finDataCostOfRevenue": "Cost Of Revenue",
        "finDataGrossMargin": "Gross Margin",
        "finDataOpsExpense": "Operational Expense",
        "finDataOpsIncome": "Operational Income",
        "finDataNetIncome": "Net Income",
        "finDataWAShares": "Weighted Average Share Count",
        "finDataDps": "Dividend Per Share",
        "finDataOpCashFlow": "Operating Cash Flow",
        "finDataCapEx": "Capital Expenditure",
        "finDataDividend": "Dividends paid",
        "finDataInterest": "Interest paid",
        "finDataSharesOutstanding": "Shares Outstanding",
    }
    entries = re.findall(r'"([^"]+)":\s*(finData\w+),', src)
    assert len(entries) >= 60
    for tag, go_name in entries:
        assert XBRL_TAGS.get(tag) == go_fact_names[go_name], tag
    # And nothing extra on our side.
    assert len(XBRL_TAGS) == len({t for t, _ in entries})


def test_extracted_text_deterministic():
    for name in ("sample_query.html", "sample_bs.html", "sample_10K.html"):
        page = sample(name)
        t1 = extracted_text("u", page)
        t2 = extracted_text("u", page)
        assert t1 == t2 and len(t1) > 0


def test_cik_page_parser():
    xml = "<company-info><cik>\n 0000789019 </cik></company-info>"
    assert cik_page_parser(xml) == "0000789019"
    assert cik_page_parser("<nope></nope>") is None
