"""Distributed PCA (stages/ann.pca_fit / pca_transform): one exact
sufficient-statistics pass (n, Σx, XᵀX per batch), driver
eigendecomposition, map-only projection — referee'd against a local
numpy PCA computed the same pinned way."""

import numpy as np
import pyarrow as pa
import pytest


def _local_pca(m: np.ndarray, k: int):
    mean = m.mean(axis=0)
    c = m - mean
    cov = (c.T @ c) / (len(m) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    return mean, comps * flip[:, None], evals[order]


def _ds_of(m: np.ndarray, blocks: int = 6):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(range(len(m)), type=pa.int64()),
            "embedding": pa.array([row for row in m.astype(np.float64)]),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_pca_matches_local_referee(ray_session):
    from zensearch_ray.stages.ann import pca_fit, pca_transform

    rng = np.random.default_rng(5)
    # anisotropic cloud: a few dominant directions
    base = rng.normal(size=(400, 8))
    stretch = np.diag([10.0, 5.0, 2.0, 1.0, 0.5, 0.2, 0.1, 0.05])
    rot, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    m = base @ stretch @ rot + rng.normal(size=8) * 3.0
    model = pca_fit(_ds_of(m), n_components=4)
    mean, comps, evals = _local_pca(m, 4)
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["components"], comps, atol=1e-8)
    assert np.allclose(model["explained_variance"], evals, atol=1e-8)
    # variance ordering holds
    ev = model["explained_variance"]
    assert all(a >= b for a, b in zip(ev, ev[1:]))

    got = (
        pca_transform(_ds_of(m), model)
        .to_pandas().set_index("vec_id").sort_index()
    )
    want = (m - mean) @ comps.T
    flat = np.stack(got["projected"].to_numpy())
    assert np.allclose(flat, want, atol=1e-8)


def test_pca_projection_decorrelates(ray_session):
    from zensearch_ray.stages.ann import pca_fit, pca_transform

    rng = np.random.default_rng(11)
    m = rng.normal(size=(300, 6)) @ np.diag([4, 3, 2, 1, 0.5, 0.25])
    model = pca_fit(_ds_of(m), n_components=6)
    proj = np.stack(
        pca_transform(_ds_of(m), model)
        .to_pandas().set_index("vec_id").sort_index()["projected"].to_numpy()
    )
    cov = np.cov(proj, rowvar=False)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-8  # components are uncorrelated
    assert np.allclose(np.diag(cov), model["explained_variance"], atol=1e-8)


def test_pca_needs_two_rows(ray_session):
    from zensearch_ray.stages.ann import pca_fit

    with pytest.raises(ValueError, match="2 rows"):
        pca_fit(_ds_of(np.zeros((1, 4)), blocks=1))


def test_embedding_pca_entry(ray_session):
    from zensearch_ray.stages.ann import embedding_pca

    df = embedding_pca("/root/testdata/sf0.001", n_components=8).to_pandas()
    assert len(df) == 500
    assert len(df["projected"].iloc[0]) == 8
