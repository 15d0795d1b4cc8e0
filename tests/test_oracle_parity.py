"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB — row count, column names, and order-insensitive values."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(ray_session, con, name):
    got = _canon(_to_pandas(ALL_QUERIES[name](SF_DIR)))
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype != w.dtype:
            # The driver's value-hash is typed: int64 vs float64 hashes
            # differently even when values agree (round-1 asof failure).
            # Tolerate only same-kind variants (int64 vs Int64, etc.).
            assert pd.api.types.is_integer_dtype(g) == pd.api.types.is_integer_dtype(w), (
                f"{name}.{col}: dtype {g.dtype} vs {w.dtype}"
            )
            assert pd.api.types.is_float_dtype(g) == pd.api.types.is_float_dtype(w), (
                f"{name}.{col}: dtype {g.dtype} vs {w.dtype}"
            )
        if pd.api.types.is_float_dtype(w):
            pd.testing.assert_series_equal(
                g.astype(float), w.astype(float), check_names=False, check_exact=True,
                obj=f"{name}.{col}",
            )
        else:
            assert g.tolist() == w.tolist(), f"{name}.{col} values differ"


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(ray_session, name):
    got = _to_pandas(ALL_QUERIES[name](SF_DIR))
    assert len(got) > 0, f"{name} returned no rows"


def test_entry_smoke(ray_session):
    df = _to_pandas(entrymod.entry())
    assert len(df) >= 0
    assert set(df.columns) == {"query_id", "query", "rank", "doc_id", "score"}
