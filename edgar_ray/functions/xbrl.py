"""XBRL tag -> financial-fact-name map.

Data parity with /root/reference/xbrltags.go:11-116 (60 entries: each GAAP
defref tag plus its bare suffix for company-specific non-GAAP refilings) and
the fallback lookup of /root/reference/xbrltags.go:119-137.
"""

from __future__ import annotations

UNKNOWN = "Unknown"

# fact display names (finDataType strings, /root/reference/data_def.go:52-78)
_TOTAL_EQUITY = "Total Shareholder Equity"
_RETAINED = "Retained Earnings"
_CLIAB = "Current Liabilities"
_CASSETS = "Current Assets"
_ASSETS = "Total Assets"
_LIAB = "Total Liabilities"
_CASH = "Cash"
_GOODWILL = "Goodwill"
_INTANGIBLE = "Intangibles"
_LDEBT = "Long-Term debt"
_SDEBT = "Short-Term debt"
_DEFERRED = "Deferred revenue"
_REVENUE = "Revenue"
_COST_OF_REVENUE = "Cost Of Revenue"
_GROSS_MARGIN = "Gross Margin"
_OPS_EXPENSE = "Operational Expense"
_OPS_INCOME = "Operational Income"
_NET_INCOME = "Net Income"
_WASHARES = "Weighted Average Share Count"
_DPS = "Dividend Per Share"
_OP_CASH_FLOW = "Operating Cash Flow"
_CAPEX = "Capital Expenditure"
_DIVIDEND = "Dividends paid"
_INTEREST = "Interest paid"
_SHARES_OUT = "Shares Outstanding"

_GAAP_SUFFIX_MAP = {
    # Balance sheet
    "StockholdersEquity": _TOTAL_EQUITY,
    "RetainedEarningsAccumulatedDeficit": _RETAINED,
    "LiabilitiesCurrent": _CLIAB,
    "AssetsCurrent": _CASSETS,
    "Assets": _ASSETS,
    "Liabilities": _LIAB,
    "CashAndCashEquivalentsAtCarryingValue": _CASH,
    "Goodwill": _GOODWILL,
    "IntangibleAssetsNetExcludingGoodwill": _INTANGIBLE,
    "LongTermDebtNoncurrent": _LDEBT,
    "LongTermDebtAndCapitalLeaseObligations": _LDEBT,
    "ShortTermBorrowings": _SDEBT,
    "DebtCurrent": _SDEBT,
    "LongTermDebtAndCapitalLeaseObligationsCurrent": _SDEBT,
    "DeferredRevenueCurrent": _DEFERRED,
    "RetainedEarningsAccumulatedDeficitAndAccumulatedOtherComprehensiveIncomeLossNetOfTax": _RETAINED,
    # Operations
    "SalesRevenueNet": _REVENUE,
    "Revenues": _REVENUE,
    "RevenueFromContractWithCustomerExcludingAssessedTax": _REVENUE,
    "CostOfGoodsAndServicesSold": _COST_OF_REVENUE,
    "CostOfPurchasedOilAndGas": _COST_OF_REVENUE,
    "CostOfGoodsSold": _COST_OF_REVENUE,
    "CostOfGoodsSoldExcludingAmortizationOfAcquiredIntangibleAssets": _COST_OF_REVENUE,
    "GrossProfit": _GROSS_MARGIN,
    "OperatingExpenses": _OPS_EXPENSE,
    "CostsAndExpenses": _OPS_EXPENSE,
    "OtherCostAndExpenseOperating": _OPS_EXPENSE,
    "OperatingIncomeLoss": _OPS_INCOME,
    "IncomeLossFromContinuingOperationsIncludingPortionAttributableToNoncontrollingInterest": _OPS_INCOME,
    "IncomeLossIncludingPortionAttributableToNoncontrollingInterest": _OPS_INCOME,
    "IncomeLossFromContinuingOperationsBeforeIncomeTaxesMinorityInterestAndIncomeLossFromEquityMethodInvestments": _OPS_INCOME,
    "IncomeLossFromContinuingOperationsBeforeIncomeTaxesExtraordinaryItemsNoncontrollingInterest": _OPS_INCOME,
    "NetIncomeLoss": _NET_INCOME,
    "ProfitLoss": _NET_INCOME,
    "NetIncomeLossAvailableToCommonStockholdersBasic": _NET_INCOME,
    "WeightedAverageNumberOfDilutedSharesOutstanding": _WASHARES,
    "CommonStockDividendsPerShareDeclared": _DPS,
    # Cash flow
    "NetCashProvidedByUsedInOperatingActivities": _OP_CASH_FLOW,
    "NetCashProvidedByUsedInOperatingActivitiesContinuingOperations": _OP_CASH_FLOW,
    "PaymentsToAcquirePropertyPlantAndEquipment": _CAPEX,
    "PaymentsToAcquireProductiveAssets": _CAPEX,
    "CapitalExpendituresAndInvestments": _CAPEX,
    "PaymentsOfDividends": _DIVIDEND,
    "PaymentsOfDividendsCommonStock": _DIVIDEND,
    "InterestPaidNet": _INTEREST,
    "InterestAndDebtExpense": _INTEREST,
    "InterestIncomeExpenseNet": _INTEREST,
}

XBRL_TAGS: dict[str, str] = {}
for _suffix, _fact in _GAAP_SUFFIX_MAP.items():
    XBRL_TAGS[f"defref_us-gaap_{_suffix}"] = _fact
    XBRL_TAGS[_suffix] = _fact
# The reference maps the full defref for CostOfRevenue but not its bare suffix
# (/root/reference/xbrltags.go:53) — keep that asymmetry for parity.
XBRL_TAGS["defref_us-gaap_CostOfRevenue"] = _COST_OF_REVENUE
# Entity info (dei namespace)
XBRL_TAGS["defref_dei_EntityCommonStockSharesOutstanding"] = _SHARES_OUT
XBRL_TAGS["EntityCommonStockSharesOutstanding"] = _SHARES_OUT


def fin_data_type_from_xbrl_tag(key: str) -> str:
    """Exact-map lookup with the company-specific fallback: split on '_' and
    retry the 3rd segment (handles e.g. defref_msft_NetIncomeLoss)
    (/root/reference/xbrltags.go:119-137)."""
    data = XBRL_TAGS.get(key)
    if data is None:
        splits = key.split("_")
        if len(splits) == 3:
            data = XBRL_TAGS.get(splits[2])
            if data is not None:
                return data
        return UNKNOWN
    return data
