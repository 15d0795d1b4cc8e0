"""exact_quantiles: percentile_disc identity vs a numpy referee across
shapes the bracket/sliver machinery must survive — heavy duplicate
skew (ranks landing inside a pivot's mass), forced refinement rounds
(max_sliver smaller than the data), grouped input, nulls, q edges."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zensearch_ray.stages.quantiles import exact_quantiles


def _disc(sorted_vals: np.ndarray, q: float) -> float:
    return float(sorted_vals[max(math.ceil(q * len(sorted_vals)), 1) - 1])


QS = [0.0, 0.01, 0.1, 0.5, 0.9, 0.99, 1.0]


def _check(ds, vals, qs=QS, **kw):
    got = exact_quantiles(ds, "x", qs, **kw)
    ref = np.sort(vals)
    want = [_disc(ref, q) for q in qs]
    assert list(got["q"]) == [float(q) for q in qs]
    assert list(got["value"]) == want


def test_uniform_and_edges(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=20_000)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(8)
    _check(ds, vals)


def test_heavy_duplicates_resolve_on_pivot(ray_session):
    # 95% of mass is one value: the median/p90 ranks land inside the
    # duplicated pivot's mass and must resolve with NO sliver fetch
    vals = np.concatenate([np.full(19_000, 3.25), np.arange(1_000) * 1.0])
    rng = np.random.default_rng(0)
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(8)
    _check(ds, vals, pivot_target=32)


def test_forced_refinement_rounds(ray_session):
    # pivot_target=4 and max_sliver=50 over 20k distinct values: the
    # first bracket pass cannot isolate any rank, so the interval
    # refinement loop must converge
    vals = np.random.default_rng(3).permutation(20_000).astype(np.float64)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(8)
    _check(ds, vals, pivot_target=4, max_sliver=50)


def test_grouped_matches_referee(ray_session):
    rng = np.random.default_rng(11)
    g = rng.choice(["a", "b", "c"], size=9_000)
    vals = rng.exponential(size=9_000) + (g == "b") * 10.0
    ds = rd.from_arrow(pa.table({"g": g, "x": vals})).repartition(6)
    got = exact_quantiles(ds, "x", QS, by="g")
    for grp in ["a", "b", "c"]:
        ref = np.sort(vals[g == grp])
        sub = got[got["g"] == grp]
        assert list(sub["value"]) == [_disc(ref, q) for q in QS], grp


def test_nulls_dropped(ray_session):
    vals = np.arange(100, dtype=np.float64)
    col = pa.array(
        [v if i % 3 else None for i, v in enumerate(vals)], pa.float64()
    )
    ds = rd.from_arrow(pa.table({"x": col}))
    kept = vals[np.arange(100) % 3 != 0]
    got = exact_quantiles(ds, "x", [0.5])
    assert got["value"].iloc[0] == _disc(np.sort(kept), 0.5)


def test_empty_input(ray_session):
    ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    got = exact_quantiles(ds, "x", [0.5])
    assert len(got) == 0


def test_single_row(ray_session):
    ds = rd.from_arrow(pa.table({"x": pa.array([5.0])}))
    got = exact_quantiles(ds, "x", QS)
    assert set(got["value"]) == {5.0}


def test_approx_quantiles_rank_error_bound(ray_session):
    from zensearch_ray.stages.quantiles import approx_quantiles

    rng = np.random.default_rng(13)
    for vals in (
        rng.normal(0, 1, 50_000),
        np.concatenate([np.full(30_000, 7.0), rng.uniform(0, 100, 20_000)]),
    ):
        ds = rd.from_arrow(pa.table({"x": vals})).repartition(8)
        got = approx_quantiles(ds, "x", QS, k_per_block=1024)
        ref = np.sort(vals)
        n = len(ref)
        # rank error bound: sum n_b/(2k) with 8 blocks of n/8 rows
        bound = int(np.ceil(n / (2 * 1024))) * 8 + 8
        for q, v in zip(got["q"], got["value"]):
            true_rank = max(math.ceil(q * n), 1) - 1
            got_rank = int(np.searchsorted(ref, v, side="left"))
            got_rank_hi = int(np.searchsorted(ref, v, side="right")) - 1
            if got_rank <= true_rank <= got_rank_hi:
                err = 0  # the estimate's value run covers the true rank
            else:
                err = min(abs(got_rank - true_rank),
                          abs(got_rank_hi - true_rank))
            assert err <= bound, (q, v, err, bound)


def test_approx_quantiles_exact_when_blocks_small(ray_session):
    from zensearch_ray.stages.quantiles import approx_quantiles
    from zensearch_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(19)
    vals = rng.integers(0, 1000, 500).astype(np.float64)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(2)
    # k >= block size → every value kept → must equal the exact path
    got = approx_quantiles(ds, "x", QS, k_per_block=100_000)
    want = exact_quantiles(ds, "x", QS)
    assert list(got["value"]) == list(want["value"])


def test_approx_quantiles_grouped(ray_session):
    import pandas as pd

    from zensearch_ray.stages.quantiles import approx_quantiles
    from zensearch_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(29)
    g = rng.choice(list("abc"), 3_000)
    vals = rng.normal(0, 100, 3_000)
    ds = rd.from_arrow(pa.table({"g": g, "x": vals})).repartition(4)
    # k >= per-group block size → every value kept → equals exact
    got = approx_quantiles(ds, "x", QS, by="g", k_per_block=100_000)
    want = exact_quantiles(ds, "x", QS, by="g")
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # bounded error at small k: every estimate within the rank bound
    approx = approx_quantiles(ds, "x", QS, by="g", k_per_block=64)
    for grp in "abc":
        ref = np.sort(vals[g == grp])
        n = len(ref)
        bound = int(np.ceil(n / (2 * 64))) * 4 + 8
        for q, v in zip(approx[approx["g"] == grp]["q"],
                        approx[approx["g"] == grp]["value"]):
            true_rank = max(math.ceil(q * n), 1) - 1
            lo = int(np.searchsorted(ref, v, side="left"))
            hi = int(np.searchsorted(ref, v, side="right")) - 1
            err = 0 if lo <= true_rank <= hi else min(abs(lo - true_rank),
                                                      abs(hi - true_rank))
            assert err <= bound, (grp, q, err, bound)


def test_approx_quantiles_q1_weight_drift(ray_session):
    # ADVICE r2: per-block weights n/len(idx) need not sum to exactly n
    # in float64 (n=5000, k=3900 → total=5000.0000000002765), so the
    # q=1.0 rank exceeded cum[-1] and indexed past the end
    from zensearch_ray.stages.quantiles import approx_quantiles

    rng = np.random.default_rng(61)
    vals = rng.normal(size=5_000)
    ds = rd.from_arrow(pa.table({"x": vals}))  # one block
    got = approx_quantiles(ds, "x", [0.5, 1.0], k_per_block=3900)
    assert got["value"].iloc[-1] == np.sort(vals)[-1]


def test_grouped_null_keys_excluded(ray_session):
    # null group keys are dropped (SQL aggregate semantics); the other
    # groups in the same batch must still resolve correctly (ADVICE r2:
    # null dictionary codes turned into INT64_MIN garbage)
    rng = np.random.default_rng(67)
    g = rng.choice(["a", "b"], size=4_000).astype(object)
    g[::5] = None
    vals = rng.normal(size=4_000)
    ds = rd.from_arrow(
        pa.table({"g": pa.array(g, pa.string()), "x": vals})
    ).repartition(4)
    got = exact_quantiles(ds, "x", QS, by="g", pivot_target=8, max_sliver=200)
    assert set(got["g"]) == {"a", "b"}
    for grp in ["a", "b"]:
        mask = np.array([x == grp for x in g])
        ref = np.sort(vals[mask])
        sub = got[got["g"] == grp]
        assert list(sub["value"]) == [_disc(ref, q) for q in QS], grp
