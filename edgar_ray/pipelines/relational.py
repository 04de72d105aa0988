"""Relational operators from SURVEY.md §2, re-expressed Ray-Data-first over
the driver's TPC-H-ish testdata tables.

Each function maps a reference operator pattern (cited) onto an idiomatic
Ray Data plan: column-pruned reads, vectorized pyarrow/pandas batch kernels,
pre-aggregation before shuffles, broadcast small-side joins, and
groupby/map_groups for per-key ordered logic. Every function here has a
matching DuckDB oracle in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Aggregations (A-family: /root/reference/data_def.go:95-248 analogues)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """Grouped aggregate with derived columns (A2 vectorized arithmetic +
    the groupby/aggregate merge pattern of A1/A4). Ray Data's hash aggregate
    does per-block partial aggregation before the shuffle.

    Money columns are exact 2-decimal values, so all sums run in integer
    cents (summation-order-independent -> bit-identical to the DuckDB oracle)
    and convert to dollars once at the end."""
    import numpy as np

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"],
                                   pa.scalar(pd.Timestamp("1998-09-02"))))
        price_c = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        tax_c = np.round(t["l_tax"].to_numpy() * 100).astype(np.int64)
        disc_price = price_c * (100 - disc_c)          # 1e-4 dollars
        charge = disc_price * (100 + tax_c)            # 1e-6 dollars
        return pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "qty": pc.cast(t["l_quantity"], pa.int64()),
            "price_c": pa.array(price_c), "disc_c": pa.array(disc_c),
            "disc_price": pa.array(disc_price), "charge": pa.array(charge),
        })

    agg = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty_i"),
            Sum("price_c", alias_name="sum_base_c"),
            Sum("disc_price", alias_name="sum_disc_c"),
            Sum("charge", alias_name="sum_charge_c"),
            Sum("disc_c", alias_name="sum_disc_hund"),
            Count(alias_name="count_order"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["count_order"].to_numpy().astype(np.float64)
        return pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "sum_qty": pa.array(t["sum_qty_i"].to_numpy().astype(np.float64)),
            "sum_base_price": pa.array(t["sum_base_c"].to_numpy() / 100.0),
            "sum_disc_price": pa.array(t["sum_disc_c"].to_numpy() / 10000.0),
            "sum_charge": pa.array(t["sum_charge_c"].to_numpy() / 1000000.0),
            "avg_qty": pa.array(t["sum_qty_i"].to_numpy() / n),
            "avg_disc": pa.array(t["sum_disc_hund"].to_numpy() / 100.0 / n),
            "count_order": t["count_order"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_filter_project(sf_dir: str):
    """Vectorized predicate + projection (P1's threshold/type filter,
    /root/reference/parser.go:34-53)."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(pd.Timestamp("1999-01-01"))),
            pc.equal(t["o_orderstatus"], pa.scalar("F")),
        )
        return t.filter(m).select(["o_orderkey", "o_custkey", "o_totalprice"])

    return ds.map_batches(keep, batch_format="pyarrow")


def q_derived_fields(sf_dir: str):
    """Derived-fact generation (A2, /root/reference/data_def.go:95-121):
    compute revenue/tax columns then aggregate per flag."""
    import numpy as np

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_discount", "l_tax"])

    def derive(t: pa.Table) -> pa.Table:
        price_c = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        tax_c = np.round(t["l_tax"].to_numpy() * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)       # 1e-4 dollars, exact
        tax_amt = rev * tax_c                # 1e-6 dollars, exact
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "rev_c": pa.array(rev), "tax_c": pa.array(tax_amt)})

    agg = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("rev_c", alias_name="rev_sum"),
                   Sum("tax_c", alias_name="tax_sum"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "sum_revenue": pa.array(t["rev_sum"].to_numpy() / 10000.0),
            "sum_tax": pa.array(t["tax_sum"].to_numpy() / 1000000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_window_hourly(sf_dir: str):
    """Tumbling-window aggregate over the events log (the streaming-shaped
    pattern; SURVEY.md §2.9): per (user_id, hour) counts + sums via a
    vectorized bucket column then hash aggregate."""
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        # keep microsecond precision: floor_temporal narrows to [s], which
        # the oracle (date_trunc -> timestamp[us]) would dtype-mismatch
        hour = pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                       pa.timestamp("us"))
        value_c = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        return pa.table({"user_id": t["user_id"], "hour": hour,
                         "value_c": pa.array(value_c)})

    agg = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_sum"))
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's hash aggregate narrows timestamp[us] group keys to [s];
        # restore microseconds so the dtype matches the oracle's date_trunc
        return pa.table({"user_id": t["user_id"],
                         "hour": pc.cast(t["hour"], pa.timestamp("us")),
                         "n_events": t["n_events"],
                         "sum_value": pa.array(t["value_sum"].to_numpy() / 100.0)})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_collected_counts(sf_dir: str):
    """Presence counting (A6 CollectedData, /root/reference/filing.go:279-302):
    per source, how many docs are 'complete' (non-null text, known lang)."""
    ds = _read(sf_dir, "documents", ["source", "text", "lang"])

    def flags(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t["text"]), pc.not_equal(t["lang"], pa.scalar("")))
        return pa.table({"source": t["source"],
                         "complete": pc.cast(ok, pa.int64())})

    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("complete", alias_name="n_complete"), Count(alias_name="n_docs"))
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O-family: /root/reference/folder.go:120-132)
# ---------------------------------------------------------------------------


def q_sort_desc(sf_dir: str):
    """AvailableFilings: newest-first ordering (O1,
    /root/reference/folder.go:128-131) — one customer's orders, date desc."""
    import numpy as np

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def keep(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy()
        return t.filter(pa.array(np.equal(keys % 100, 0)))

    return ds.map_batches(keep, batch_format="pyarrow").sort(
        ["o_orderdate", "o_orderkey"], descending=[True, True]
    )


def q_top25_global(sf_dir: str):
    """Global top-k (O3's count=10 limit, /root/reference/page.go:13):
    distributed sort + limit."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(25)


def q_topk_per_group(sf_dir: str):
    """Per-group top-k (the per-(ticker,type) 10-filing frontier breadth,
    O3): 3 newest orders per customer — hash-bucketed, one vectorized pass
    per bucket (a Python call per customer would be millions of calls at
    scale; see stages/bucketing.py)."""
    from ..stages.bucketing import bucketed_group_head

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    return bucketed_group_head(ds, ["o_custkey"],
                               ["o_orderdate", "o_orderkey"], [True, True], 3)


# ---------------------------------------------------------------------------
# Dedup set-ops (D-family: /root/reference/parser.go:43,47; reportmap.go:139)
# ---------------------------------------------------------------------------


def q_last_wins(sf_dir: str):
    """Date-keyed last-wins dedup (D2, /root/reference/parser.go:47): latest
    event per (user_id, event_type)."""
    from ..stages.bucketing import bucketed_group_head

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    return bucketed_group_head(ds, ["user_id", "event_type"],
                               ["ts", "event_id"], [True, True], 1)


def q_first_wins(sf_dir: str):
    """Order-preserving first-wins (D3/D4, /root/reference/reportmap.go:139-142,
    data_def.go:205): first lineitem per order by linenumber."""
    from ..stages.bucketing import bucketed_group_head

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"])
    # linenumber is NOT unique per order in this data; full-column tie-break
    # keeps the winner deterministic (the reference's first-wins is
    # deterministic only via document order, D4)
    return bucketed_group_head(ds, ["l_orderkey"],
                               ["l_linenumber", "l_partkey", "l_quantity"],
                               [False, False, False], 1)


def q_distinct_union(sf_dir: str):
    """Set op: union of two filtered slices, then distinct keys
    (D1 + frontier set semantics)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"])
    a = ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        .select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    b = ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT")))
        .select(["o_orderkey"]),
        batch_format="pyarrow",
    )

    import numpy as np

    from ..stages.bucketing import grouped_apply

    def distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64())})
        keys = np.unique(t["o_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": pa.array(keys, pa.int64())})

    return grouped_apply(a.union(b), ["o_orderkey"], distinct)


# ---------------------------------------------------------------------------
# Joins (J-family: /root/reference/page.go:30-39; fetcher.go:55-58)
# ---------------------------------------------------------------------------


def q_broadcast_join(sf_dir: str):
    """Broadcast small-side hash join (J1 ticker->CIK,
    /root/reference/page.go:30-39): customer x nation x region rollup. The
    dimension tables ship once via ray.put; the fact side streams."""
    import numpy as np

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim.sort_values("n_nationkey")
    # zero-copy broadcast: sorted key array + aligned name dictionary-coded
    # Arrow column (a python dict would re-pickle per task)
    dim_keys = dim["n_nationkey"].to_numpy().astype(np.int64)
    dim_names = pa.array(dim["r_name"], pa.string())
    lookup_ref = ray.put((dim_keys, dim_names))

    def attach_region(t: pa.Table) -> pa.Table:
        keys_s, names = (ray.get(lookup_ref)
                         if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref)
        keys = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(keys_s, keys), 0, len(keys_s) - 1)
        bal_c = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        return pa.table({"r_name": names.take(pa.array(pos, pa.int64())),
                         "bal_c": pa.array(bal_c)})

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    agg = (
        cust.map_batches(attach_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"),
                   Sum("bal_c", alias_name="bal_sum"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"r_name": t["r_name"], "n_customers": t["n_customers"],
                         "sum_acctbal": pa.array(t["bal_sum"].to_numpy() / 100.0)})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_hash_join(sf_dir: str):
    """Large-large hash-partitioned join (Dataset.join): orders x customer,
    revenue per market segment."""
    import numpy as np

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        price_c = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"], "price_c": pa.array(price_c)})

    from ..stages.bucketing import size_partitions

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = orders.map_batches(cents, batch_format="pyarrow").join(
        cust, join_type="inner", on=("o_custkey",),
        right_on=("c_custkey",),
        num_partitions=size_partitions(
            os.path.join(sf_dir, "orders.parquet"),
            os.path.join(sf_dir, "customer.parquet")))
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="price_sum")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": t["c_mktsegment"], "n_orders": t["n_orders"],
                         "sum_price": pa.array(t["price_sum"].to_numpy() / 100.0)})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_anti_join(sf_dir: str):
    """Resume anti-join (J4, /root/reference/fetcher.go:55-58): customers with
    no completed ('F') order, via a broadcast key-set semi-filter (the
    crawl's seen-set-dedup pattern at queryable scale)."""
    f_orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    )
    import numpy as np

    order_keys = np.unique(np.asarray(f_orders.unique("o_custkey"), dtype=np.int64))
    keys_ref = ray.put(order_keys)  # sorted uint key array: zero-copy broadcast

    def drop_seen(t: pa.Table) -> pa.Table:
        seen = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(seen, keys), 0, max(len(seen) - 1, 0))
        hit = seen[pos] == keys if len(seen) else np.zeros(len(keys), bool)
        return t.filter(pa.array(~hit))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    return cust.map_batches(drop_seen, batch_format="pyarrow")


def q_percentiles(sf_dir: str):
    """Distribution aggregates (median / p95 of order value per status):
    exact-cents percentiles computed vectorized per group after a bucketed
    shuffle; both sides round to cents so linear-interpolation results
    hash-match the DuckDB quantile_cont oracle."""
    import numpy as np

    from ..stages.bucketing import grouped_apply

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "price_c": pa.array(c)})

    def bucket_pct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderstatus": pa.array([], pa.string()),
                             "median_price": pa.array([], pa.float64()),
                             "p95_price": pa.array([], pa.float64()),
                             "n_orders": pa.array([], pa.int64())})
        status = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        price = t["price_c"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(status, return_inverse=True)

        def _half_away(x: float) -> float:
            # DuckDB round() is half-away-from-zero; Python round() is
            # banker's — medians of even groups land exactly on half-cents
            return np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5)

        med, p95, cnt = [], [], []
        for g in range(len(uniq)):
            v = price[inv == g]
            med.append(_half_away(float(np.percentile(v, 50))) / 100.0)
            p95.append(_half_away(float(np.percentile(v, 95))) / 100.0)
            cnt.append(len(v))
        return pa.table({"o_orderstatus": pa.array(uniq.tolist(), pa.string()),
                         "median_price": pa.array(med, pa.float64()),
                         "p95_price": pa.array(p95, pa.float64()),
                         "n_orders": pa.array(cnt, pa.int64())})

    return grouped_apply(ds.map_batches(cents, batch_format="pyarrow"),
                         ["o_orderstatus"], bucket_pct, num_buckets=8)


def q_string_classify(sf_dir: str):
    """Contains-classifier over strings (getMenuCategory / lookupDocType
    analog, /root/reference/reportmap.go:21-78): vectorized
    pyarrow.compute match_substring + case dispatch, then counts per class."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_type"])

    def classify(t: pa.Table) -> pa.Table:
        name_u = pc.utf8_upper(t["p_name"])
        is_steel = pc.match_substring(name_u, "STEEL")
        is_brass = pc.match_substring(name_u, "BRASS")
        is_econ = pc.equal(t["p_type"], pa.scalar("ECONOMY"))
        cls = pc.if_else(is_steel, pa.scalar("steel"),
                         pc.if_else(is_brass, pa.scalar("brass"),
                                    pc.if_else(is_econ, pa.scalar("economy"),
                                               pa.scalar("other"))))
        return pa.table({"material": cls})

    return (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby("material")
        .aggregate(Count(alias_name="n_parts"))
    )


def q_left_join(sf_dir: str):
    """Left-outer hash join (customer LEFT JOIN orders): join cardinality
    and no-match row count per market segment — exercises Ray Data's native
    left_outer join with null-preserving aggregation."""
    import numpy as np

    from ..stages.bucketing import size_partitions

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    joined = cust.join(
        orders, join_type="left_outer", on=("c_custkey",),
        right_on=("o_custkey",),
        num_partitions=size_partitions(
            os.path.join(sf_dir, "customer.parquet"),
            os.path.join(sf_dir, "orders.parquet")))

    def partial(t: pa.Table) -> pa.Table:
        nulls = pc.is_null(t["o_orderkey"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "no_match": pa.array(nulls.astype(np.int64)),
        })

    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("one", alias_name="n_rows"),
                      Sum("no_match", alias_name="n_no_order_rows")))
    return agg.map_batches(
        lambda t: t.select(["c_mktsegment", "n_rows", "n_no_order_rows"]),
        batch_format="pyarrow")


def q_semi_join(sf_dir: str):
    """Left-semi hash join (EXISTS): customers with at least one completed
    ('F') order, counted per market segment — the native semi-join
    counterpart of q_anti_join's broadcast key-set filter."""
    import numpy as np

    from ..stages.bucketing import size_partitions

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    f_orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
            .select(["o_custkey"]),
            batch_format="pyarrow")
    hits = cust.join(
        f_orders, join_type="left_semi", on=("c_custkey",),
        right_on=("o_custkey",),
        num_partitions=size_partitions(
            os.path.join(sf_dir, "customer.parquet"),
            os.path.join(sf_dir, "orders.parquet")))
    agg = hits.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers"))
    return agg.map_batches(
        lambda t: t.select(["c_mktsegment", "n_customers"]),
        batch_format="pyarrow")


def q_distinct_count(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): distinct order dates per customer
    bucket (o_custkey % 100) — two-stage distinct: dedupe on the full
    (group, value) pair, then a small count per group (each stage a hash
    shuffle with bounded keys; no per-group Python)."""
    import numpy as np

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def keyed(t: pa.Table) -> pa.Table:
        g = (t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
             % 100)
        return pa.table({"g": pa.array(g), "o_orderdate": t["o_orderdate"]})

    distinct = (ds.map_batches(keyed, batch_format="pyarrow")
                .groupby(["g", "o_orderdate"]).count())
    agg = distinct.groupby("g").aggregate(Count(alias_name="n_dates"))
    return agg.map_batches(lambda t: t.select(["g", "n_dates"]),
                           batch_format="pyarrow")
