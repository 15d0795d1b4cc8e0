"""Distributed Lloyd's k-means: exact recovery on separated blobs,
objective monotonicity, empty-cluster survival, assignment parity with
a local referee."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zensearch_ray.stages.ann import (
    kmeans_assign,
    kmeans_fit,
    kmeans_inertia,
    kmeans_init,
)


def _blobs(rng, centers, n_per, spread=0.05):
    pts, labels = [], []
    for i, c in enumerate(centers):
        pts.append(c + rng.normal(0, spread, size=(n_per, len(c))))
        labels.append(np.full(n_per, i))
    m = np.vstack(pts)
    lab = np.concatenate(labels)
    perm = rng.permutation(len(m))
    return m[perm], lab[perm]


def _ds(m):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
                "embedding": pa.array(list(m)),
            }
        )
    ).repartition(4)


def _local_lloyd(m, centroids, iters):
    k, d = centroids.shape
    c = centroids.copy()
    for _ in range(iters):
        dots = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        assign = np.argmax(dots, axis=1)
        for j in range(k):
            sel = m[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
    return c


def test_recovers_separated_blobs(ray_session):
    rng = np.random.default_rng(3)
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]],
                       dtype=np.float64)
    m, true_lab = _blobs(rng, centers, 300)
    ds = _ds(m)
    cent = kmeans_fit(ds, k=4, iters=8, seed=1)
    got = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    lab = got["cluster"].to_numpy()
    # cluster ids are arbitrary: every true blob must map to exactly
    # one predicted cluster and vice versa
    for t in range(4):
        pred = np.unique(lab[true_lab == t])
        assert len(pred) == 1
    assert len(np.unique(lab)) == 4
    # recovered centroids sit on the true centers
    order = np.argsort(cent[:, 0] + 100 * cent[:, 1] + 10000 * cent[:, 2])
    want = np.argsort(centers[:, 0] + 100 * centers[:, 1] + 10000 * centers[:, 2])
    np.testing.assert_allclose(cent[order], centers[want], atol=0.02)


def test_inertia_decreases_with_iterations(ray_session):
    rng = np.random.default_rng(5)
    m = rng.normal(0, 1, size=(2000, 8))
    ds = _ds(m)
    prev = np.inf
    for iters in (1, 3, 6):
        cent = kmeans_fit(ds, k=5, iters=iters, seed=9)
        inertia = kmeans_inertia(ds, cent)
        assert inertia <= prev + 1e-9
        prev = inertia


def test_matches_local_referee(ray_session):
    rng = np.random.default_rng(17)
    centers = rng.normal(0, 5, size=(3, 4))
    m, _ = _blobs(rng, centers, 200, spread=0.2)
    ds = _ds(m)
    cent = kmeans_fit(ds, k=3, iters=6, seed=2, init_sample=4096)
    # same init as kmeans_fit: first 4096 rows (all of them), same seed
    ref = _local_lloyd(m, kmeans_init(m, 3, seed=2), iters=6)
    order_a = np.argsort(cent[:, 0])
    order_b = np.argsort(ref[:, 0])
    np.testing.assert_allclose(cent[order_a], ref[order_b], atol=1e-6)


def test_empty_cluster_keeps_centroid(ray_session):
    # k=3 over two tight far-apart blobs: one centroid may never win a
    # point; fit must not NaN and must still cover both blobs
    rng = np.random.default_rng(23)
    m, _ = _blobs(rng, np.array([[0.0, 0.0], [50.0, 50.0]]), 100, spread=0.01)
    ds = _ds(m)
    cent = kmeans_fit(ds, k=3, iters=5, seed=4)
    assert np.isfinite(cent).all()
    lab = kmeans_assign(ds, cent).to_pandas()["cluster"].to_numpy()
    assert len(np.unique(lab)) >= 2


def test_requires_k_rows(ray_session):
    m = np.zeros((2, 3))
    with pytest.raises(ValueError):
        kmeans_fit(_ds(m), k=5, iters=1)
