"""Driver-style oracle check: run every ``queries()`` entry and its
``oracle_sql()`` twin over the same parquet dir; compare row count, column
names, and order-insensitive values (after the same rounding both sides)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _entry_module():
    import __ray_entry__ as e
    return e


def _all_queries():
    e = _entry_module()
    return e.queries() | e.extra_queries()


def _all_sql():
    e = _entry_module()
    return e.oracle_sql() | e.extra_oracle_sql()


def _oracle_pairs():
    return sorted(_all_sql().keys())


@pytest.mark.parametrize("name", _oracle_pairs())
def test_query_matches_oracle(name, sf_dir, oracle_con, ray_session):
    got = _normalize(_to_pandas(_all_queries()[name](sf_dir)))
    want = _normalize(oracle_con.execute(_all_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_rows_only_queries_run(sf_dir, ray_session):
    """Non-SQL-expressible entries must still run and return >= 0 rows."""
    qs, sql = _all_queries(), _all_sql()
    for name in sorted(set(qs) - set(sql)):
        df = _to_pandas(qs[name](sf_dir))
        assert df is not None, name


def test_driver_registry_shape():
    """Exactly 50 driver-facing queries (the driver's observed row cap);
    every oracle key has a query twin in the SAME registry, and the two
    registries are disjoint."""
    e = _entry_module()
    qs, extra = e.queries(), e.extra_queries()
    assert len(qs) == 50
    assert not set(qs) & set(extra)
    assert set(e.oracle_sql()) <= set(qs)
    assert set(e.extra_oracle_sql()) <= set(extra)
