"""HLL sketch: merge identities are exact, estimates hit the
published error bound against exact distinct counts."""

import numpy as np
import pytest

from zensearch_ray.stages.sketch import (
    events_daily_active_hll,
    hll_count_distinct,
    hll_estimate,
    hll_partial,
)

P = 12
M = 1 << P


def test_partial_shape_and_determinism():
    v = np.arange(1000, dtype=np.int64)
    r1, r2 = hll_partial(v, P), hll_partial(np.flip(v), P)
    assert r1.shape == (M,) and r1.dtype == np.uint8
    # order-insensitive (max is commutative) and deterministic
    assert np.array_equal(r1, r2)
    assert np.array_equal(hll_partial(np.array([], dtype=np.int64), P), np.zeros(M))


def test_merge_of_parts_equals_whole():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, size=50_000, dtype=np.int64)
    whole = hll_partial(vals, P)
    parts = [hll_partial(c, P) for c in np.array_split(vals, 7)]
    assert np.array_equal(np.maximum.reduce(parts), whole)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_estimate_error_bound(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 1 << 62, size=n * 3, dtype=np.int64) % (n * 10)
    exact = len(np.unique(vals))
    est = hll_estimate(hll_partial(vals, P))
    # std err ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 4 sigma
    assert abs(est - exact) / exact < 0.065, (est, exact)


def test_grouped_vs_exact(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.01"
    got = (
        events_daily_active_hll(sf)
        .to_pandas()
        .sort_values("day_epoch")
        .reset_index(drop=True)
    )
    exact = duckdb.sql(
        f"""SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
                   count(DISTINCT user_id)::BIGINT AS n
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1 ORDER BY 1"""
    ).df()
    assert list(got["day_epoch"]) == list(exact["day_epoch"])
    rel = np.abs(got["n_active_approx"].to_numpy() - exact["n"].to_numpy()) / np.maximum(
        exact["n"].to_numpy(), 1
    )
    assert rel.max() < 0.065, rel.max()


def test_generic_grouped_api(ray_session):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 4, size=20_000),
            "v": rng.integers(0, 3_000, size=20_000),
        }
    )
    got = (
        hll_count_distinct(rd.from_pandas(df), "g", "v", p=P)
        .to_pandas()
        .sort_values("g")
    )
    exact = df.groupby("g")["v"].nunique()
    for _, row in got.iterrows():
        assert abs(row["n_approx"] - exact[row["g"]]) / exact[row["g"]] < 0.065


def test_heavy_hitters_exact_vs_counter(ray_session):
    """Candidate superset + exact verify must equal brute-force counts,
    including with a skew item split across many blocks."""
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from zensearch_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    # zipf-ish stream: a few heavy values + a long uniform tail
    vals = np.concatenate(
        [np.repeat([1, 2, 3], [4000, 2500, 900]), rng.integers(100, 5000, 30_000)]
    )
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    k = 50

    def values_of(batch):
        return [str(x) for x in batch["v"].to_pylist()]

    got = (
        heavy_hitters(rd.from_pandas(df).repartition(8), values_of, k=k)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    c = Counter(str(x) for x in vals)
    n = len(vals)
    want = sorted((t, v) for t, v in c.items() if v * k > n)
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert len(want) >= 3  # the planted heavies survived


def test_heavy_hitters_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from zensearch_ray.stages.sketch import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"v": pd.array([], dtype="int64")}))
    out = heavy_hitters(ds, lambda b: [str(x) for x in b["v"].to_pylist()], 10)
    assert out.count() == 0


def test_heavy_hitters_512_blocks_bounded_driver(ray_session):
    # round-2 VERDICT item 7: the candidate union is k x n_blocks rows
    # at scale — with 512 blocks of DISJOINT per-block skew the driver
    # must hold the bloom bitmap, never the candidate rows
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zensearch_ray.stages.sketch import heavy_hitters

    blocks = []
    for i in range(512):
        vals = ["HEAVY"] * 150 + [f"only_in_block_{i}"] * 50
        blocks.append(pa.table({"v": pa.array(vals)}))
    ds = rd.from_arrow(blocks)
    assert ds.num_blocks() == 512

    diag = {}
    out = (
        heavy_hitters(ds, lambda b: b["v"].to_pylist(), k=100, _diag=diag)
        .to_pandas()
    )
    # exact result: only the global heavy value survives the n/k cut
    n = 512 * 200
    assert list(out["term"]) == ["HEAVY"]
    assert int(out["cnt"].iloc[0]) == 512 * 150
    assert 512 * 150 * 100 > n
    # every per-block value was a candidate somewhere...
    assert diag["n_candidates"] >= 512
    # ...but the driver held only the bitmap: ~10 bits per candidate,
    # not k x 512 rows
    assert diag["driver_bloom_bytes"] < 64 * 1024
