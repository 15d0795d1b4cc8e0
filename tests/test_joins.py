"""Co-partitioned hash join semantics vs a DuckDB referee: inner and
left joins (unmatched rows → typed nulls, int columns stay int64),
string keys, and the explicit column-collision / key-type guards."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from zensearch_ray.pipelines.joins import hash_join

LEFT = pd.DataFrame(
    {
        "k": [1, 2, 2, 3, 5, 7, 7, 7],
        "lval": [10, 20, 21, 30, 50, 70, 71, 72],
        "ltag": list("abcdefgh"),
    }
)
RIGHT = pd.DataFrame(
    {
        "k": [2, 2, 3, 4, 7, 9],
        "rval": [200, 201, 300, 400, 700, 900],
    }
)


def _ray_ds(df):
    import ray.data as rd

    # several small blocks so buckets genuinely co-locate across blocks
    return rd.from_pandas([df.iloc[i : i + 2] for i in range(0, len(df), 2)])


def _norm(df):
    df = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    return df


def _duck(how):
    join = {"inner": "JOIN", "left": "LEFT JOIN"}[how]
    return duckdb.sql(
        f"SELECT l.k, l.lval, l.ltag, r.rval FROM LEFT_T l {join} RIGHT_T r USING (k)"
    ).df()


@pytest.fixture(scope="module")
def duck_tables():
    duckdb.register("LEFT_T", LEFT)
    duckdb.register("RIGHT_T", RIGHT)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_matches_duckdb(ray_session, duck_tables, how):
    ds = hash_join(_ray_ds(LEFT), _ray_ds(RIGHT), on="k", how=how, n_buckets=4)
    if how == "left":
        # unmatched right ints are int64+nulls at the ARROW level (they
        # only float-ify in the final to_pandas conversion)
        sch = ds.schema()
        assert dict(zip(sch.names, sch.types))["rval"] == pa.int64()
    got = ds.to_pandas()
    want = _duck(how)
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    assert got["k"].dtype == np.int64 and got["lval"].dtype == np.int64


def test_string_keys(ray_session):
    l = pd.DataFrame({"name": ["ann", "bob", "cid", "bob"], "x": [1, 2, 3, 4]})
    r = pd.DataFrame({"name": ["bob", "dee"], "y": [20, 40]})
    got = hash_join(_ray_ds(l), _ray_ds(r), on="name", n_buckets=3).to_pandas()
    assert sorted(zip(got["name"], got["x"], got["y"])) == [
        ("bob", 2, 20),
        ("bob", 4, 20),
    ]


def test_right_on_and_guards(ray_session):
    l = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    r = pd.DataFrame({"rk": [2, 3], "w": [20, 30]})
    got = hash_join(_ray_ds(l), _ray_ds(r), on="k", right_on="rk").to_pandas()
    assert got.to_dict("records") == [{"k": 2, "v": 2.0, "w": 20}]

    with pytest.raises(ValueError, match="collision"):
        hash_join(_ray_ds(l), _ray_ds(l), on="k")
    rf = pd.DataFrame({"k": np.array([1, 2], dtype=np.int32), "w": [1, 2]})
    with pytest.raises(ValueError, match="key types differ"):
        hash_join(_ray_ds(l), _ray_ds(rf), on="k")
    with pytest.raises(ValueError, match="how"):
        hash_join(_ray_ds(l), _ray_ds(r), on="k", right_on="rk", how="outer")


def test_empty_result_keeps_schema(ray_session):
    l = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    r = pd.DataFrame({"rk": [8, 9], "w": [80, 90]})
    t = hash_join(_ray_ds(l), _ray_ds(r), on="k", right_on="rk").to_pandas()
    # Ray drops all-empty blocks, so the frame may surface schema-less;
    # what matters is zero rows, not an error
    assert len(t) == 0
    assert list(t.columns) in ([], ["k", "v", "w"])


def test_salted_join_identity_under_skew(ray_session):
    # one key carries 60% of the left side: salted output must equal
    # the unsalted join exactly, for inner AND left
    rng = np.random.default_rng(31)
    n = 5000
    keys = np.where(rng.random(n) < 0.6, 42, rng.integers(0, 500, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lval": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame(
        {"k": np.arange(0, 500, dtype=np.int64),
         "rval": np.arange(0, 500, dtype=np.int64) * 10}
    )
    right = pd.concat(
        [right, pd.DataFrame({"k": [42, 42], "rval": [4200, 4201]})],
        ignore_index=True,
    )
    import ray.data as rd

    def big_ds(df):
        return rd.from_pandas(df).repartition(8)

    for how in ("inner", "left"):
        plain = hash_join(
            big_ds(left), big_ds(right), on="k", how=how
        ).to_pandas()
        salted = hash_join(
            big_ds(left), big_ds(right), on="k", how=how,
            salt_heavy=True, salt_subs=4, heavy_frac=0.05,
        ).to_pandas()
        pd.testing.assert_frame_equal(_norm(plain), _norm(salted))
        # every (l, r) pair of the hot key appears exactly once: the
        # hot key matches 3 right rows (42 appears at 42, plus 2 extra)
        hot = salted[salted["k"] == 42]
        n_hot_left = int((keys == 42).sum())
        assert len(hot) == n_hot_left * 3


def test_heavy_key_detection(ray_session):
    from zensearch_ray.pipelines.joins import _detect_heavy_keys

    rng = np.random.default_rng(5)
    import ray.data as rd

    keys = np.where(rng.random(10_000) < 0.3, 7, rng.integers(100, 10_000, 10_000))
    ds = rd.from_pandas(pd.DataFrame({"k": keys.astype(np.int64)})).repartition(8)
    heavy = _detect_heavy_keys(ds, "k", frac=0.05)
    assert 7 in heavy
    assert len(heavy) < 50  # uniform keys must not flood the set
