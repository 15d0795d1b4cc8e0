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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _zipf_keys(n: int, seed: int) -> list[str]:
    import numpy as np

    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    return [f"k{r}" for r in np.minimum(ranks, 5000)]


def test_cms_overestimates_and_bounds():
    from collections import Counter

    import numpy as np

    from zensearch_ray.stages.sketch import cms_estimate, cms_partial

    keys = _zipf_keys(50_000, seed=3)
    true = Counter(keys)
    width, depth, seed = 2048, 4, 7
    m = cms_partial(true, depth, width, seed)
    sk = {"m": m, "n": len(keys), "width": width, "depth": depth,
          "seed": seed}
    probes = sorted(true)[:500] + ["never_seen_a", "never_seen_b"]
    est = cms_estimate(sk, probes)
    bound = np.e / width * len(keys)
    for k, e in zip(probes, est):
        assert e >= true.get(k, 0), k  # one-sided error, always
        assert e - true.get(k, 0) <= bound, (k, int(e), true.get(k, 0))


def test_cms_partials_merge_additively():
    from collections import Counter

    import numpy as np

    from zensearch_ray.stages.sketch import cms_partial

    a = Counter(_zipf_keys(5_000, seed=1))
    b = Counter(_zipf_keys(5_000, seed=2))
    one = cms_partial(a + b, 3, 512, 11)
    two = cms_partial(a, 3, 512, 11) + cms_partial(b, 3, 512, 11)
    assert (one == two).all()
    # empty partial is the additive identity
    assert (cms_partial(Counter(), 3, 512, 11) == 0).all()


def test_cms_build_matches_local_partial(ray_session):
    """Distributed build (per-batch partials summed on the driver)
    must equal ONE local partial over the concatenated stream — the
    additive-merge identity through Ray Data."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from zensearch_ray.stages.sketch import cms_build, cms_partial

    keys = _zipf_keys(20_000, seed=5)
    docs = [" ".join(keys[i::40]) for i in range(40)]
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(8)

    def toks_of(batch):
        for t in batch["text"].to_pylist():
            yield from t.split()

    sk = cms_build(ds, toks_of, width=1024, depth=4, seed=7)
    want = cms_partial(Counter(keys), 4, 1024, 7)
    assert (sk["m"] == want).all()
    assert sk["n"] == len(keys)


def test_term_counts_cms_entry(ray_session):
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.stages.sketch import term_counts_cms

    sf = "/root/testdata/sf0.001"
    got = term_counts_cms(sf).set_index("term")["est_count"]
    true = Counter()
    for tx in pq.read_table(f"{sf}/documents.parquet",
                            columns=["text"])["text"].to_pylist():
        true.update(tokenize(tx))
    n = sum(true.values())
    bound = np.e / 4096 * n
    for term, est in got.items():
        assert est >= true.get(term, 0), term
        assert est - true.get(term, 0) <= bound, term
    assert got["nosuchtermxyz"] <= bound
