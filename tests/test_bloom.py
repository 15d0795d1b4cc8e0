"""Bloom filter: no false negatives, fpp near target, merge identity;
bloom semi/anti joins exactly match DuckDB on the TPC-H tables."""

import numpy as np
import pytest

from zensearch_ray.stages.bloom import (
    bloom_contains,
    bloom_params,
    bloom_partial,
    bloom_semi_join,
    parts_ordered_heavy,
)

SF = "/root/testdata/sf0.01"


def test_params_and_fpp():
    m, k = bloom_params(10_000, 0.01)
    assert m % 64 == 0 and k >= 1
    keys = np.arange(10_000, dtype=np.int64)
    w = bloom_partial(keys, m, k)
    # zero false negatives, by construction
    assert bloom_contains(w, keys, k).all()
    # false-positive rate near target (within 2x)
    miss = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    assert bloom_contains(w, miss, k).mean() < 0.02


def test_partials_or_merge_equals_whole():
    m, k = bloom_params(5_000, 0.01)
    vals = np.random.default_rng(5).integers(0, 1 << 60, 5_000, dtype=np.int64)
    whole = bloom_partial(vals, m, k)
    parts = [bloom_partial(c, m, k) for c in np.array_split(vals, 9)]
    assert np.array_equal(np.bitwise_or.reduce(parts), whole)


def test_empty_build_side():
    m, k = bloom_params(0, 0.01)
    w = bloom_partial(np.array([], dtype=np.int64), m, k)
    assert not bloom_contains(w, np.arange(100, dtype=np.int64), k).any()


@pytest.mark.parametrize("anti", [False, True])
def test_join_matches_duckdb(ray_session, anti):
    import duckdb

    got = (
        parts_ordered_heavy(SF, anti=anti)
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    op = "NOT IN" if anti else "IN"
    exact = duckdb.sql(
        f"""SELECT p_partkey, p_name, p_retailprice
            FROM read_parquet('{SF}/part.parquet')
            WHERE p_partkey {op} (
                SELECT l_partkey FROM read_parquet('{SF}/lineitem.parquet')
                WHERE l_quantity > 45)
            ORDER BY p_partkey"""
    ).df()
    assert got.equals(exact)
    assert len(got) > 0  # both modes nontrivial at sf0.01


def test_duplicate_build_keys_dont_duplicate_output(ray_session):
    import pandas as pd
    import ray.data as rd

    probe = rd.from_pandas(pd.DataFrame({"key": [1, 2, 3, 4], "v": list("abcd")}))
    build = rd.from_pandas(pd.DataFrame({"key": [2, 2, 2, 4, 4]}))
    semi = bloom_semi_join(probe, "key", build).to_pandas().sort_values("key")
    assert list(semi["key"]) == [2, 4] and list(semi["v"]) == ["b", "d"]
    anti = bloom_semi_join(probe, "key", build, anti=True).to_pandas().sort_values("key")
    assert list(anti["key"]) == [1, 3]


def test_anti_with_empty_build_keeps_everything(ray_session):
    import pandas as pd
    import ray.data as rd

    probe = rd.from_pandas(pd.DataFrame({"key": [7, 8], "v": [1.0, 2.0]}))
    build = rd.from_pandas(pd.DataFrame({"key": pd.array([], dtype="int64")}))
    out = bloom_semi_join(probe, "key", build, anti=True, n_hint=0).to_pandas()
    assert sorted(out["key"]) == [7, 8]
    assert bloom_semi_join(probe, "key", build, n_hint=0).to_pandas().empty
