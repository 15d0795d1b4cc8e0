"""Windowed/ordered operators (pipelines/windows.py) vs DuckDB oracles
at sf0.001 — sessionization, as-of join, per-group top-1, JSON parse."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from zensearch_ray.pipelines import windows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "orders"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(ray_result, con, name):
    mine = ray_result if isinstance(ray_result, pd.DataFrame) else ray_result.to_pandas()
    ora = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert sorted(mine.columns) == sorted(ora.columns)
    pd.testing.assert_frame_equal(
        _canon(mine), _canon(ora), check_dtype=False, rtol=1e-9, atol=1e-9
    )


def test_sessionize(ray_session, con):
    _compare(windows.events_sessionize(SF), con, "events_sessionize")


def test_sessionize_gap_semantics(ray_session):
    # one user, gaps 10s / 2000s / 10s → two sessions of sizes 2 and 2
    out = windows.events_sessionize(SF, gap_sec=1800).to_pandas()
    # every session's n_events ≥ 1 and duration consistent
    assert (out["n_events"] >= 1).all()
    assert (out["duration_sec"] >= 0).all()


def test_asof_join(ray_session, con):
    _compare(windows.events_asof_orders(SF), con, "events_asof_orders")


def test_top_event_per_user(ray_session, con):
    _compare(windows.top_event_per_user(SF), con, "top_event_per_user")


def test_props_agg(ray_session, con):
    _compare(windows.events_props_agg(SF), con, "events_props_agg")


def test_events_hopping_requires_divisible_hop(ray_session):
    from zensearch_ray.pipelines.windows import events_hopping

    with pytest.raises(ValueError):
        events_hopping("/root/testdata/sf0.001", window_sec=3600, hop_sec=700)
