"""MMR diversified rerank (stages/ann.mmr_topk): greedy selection over
the fetched candidate pool must equal an independent brute-force
referee, reduce to the plain top-k at lam=1, and actually diversify —
a planted clone cluster contributes one representative early instead
of flooding the prefix."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from zensearch_ray.functions.rounding import round6
from zensearch_ray.stages.ann import cosine_topk, mmr_topk


def _norm(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    # ids 0..4: near-clones of the probe direction (tiny jitter)
    probe_dir = base[0] / np.linalg.norm(base[0])
    clones = probe_dir + rng.normal(scale=0.01, size=(5, 16))
    mat = np.vstack([clones, base[5:]])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(t).repartition(4), mat, probe_dir


def _referee(mat, probe, k, fetch_n, lam):
    m = _norm(mat.astype(np.float64))
    q = probe / np.linalg.norm(probe)
    rel_all = round6(m @ q)
    order = np.lexsort((np.arange(len(m)), -rel_all))[:fetch_n]
    ids, rel, sub = order, rel_all[order], m[order]
    pair = sub @ sub.T
    sel, rem = [], list(range(len(ids)))
    for _ in range(min(k, len(ids))):
        best = None
        for i in rem:
            div = max(pair[i][j] for j in sel) if sel else 0.0
            obj = round6(lam * rel[i] - (1 - lam) * div)
            key = (-obj, ids[i])
            if best is None or key < best[0]:
                best = (key, i, obj)
        sel.append(best[1])
        rem.remove(best[1])
    return [int(ids[i]) for i in sel]


def test_mmr_matches_referee(vec_ds):
    ds, mat, probe = vec_ds
    for lam in (0.3, 0.7, 0.9):
        got = mmr_topk(ds, probe, k=10, fetch_n=20, lam=lam)
        assert list(got["vec_id"]) == _referee(mat, probe, 10, 20, lam), lam


def test_mmr_lambda_one_is_plain_topk(vec_ds):
    ds, mat, probe = vec_ds
    got = mmr_topk(ds, probe, k=8, fetch_n=20, lam=1.0)
    plain = cosine_topk(ds, probe, k=8)
    assert list(got["vec_id"]) == list(plain["vec_id"])
    assert list(got["rel"]) == list(plain["sim"])


def test_mmr_diversifies_clone_cluster(vec_ds):
    """Plain top-5 is all clones; MMR keeps one clone then pulls in
    non-clones."""
    ds, mat, probe = vec_ds
    plain = cosine_topk(ds, probe, k=5)
    assert set(plain["vec_id"]) <= set(range(5))
    got = mmr_topk(ds, probe, k=5, fetch_n=20, lam=0.5)
    clone_hits = [v for v in got["vec_id"] if v < 5]
    assert len(clone_hits) < 5
    assert int(got["vec_id"][0]) == int(plain["vec_id"][0])  # top rel first


def test_mmr_rank_and_marginal_shape(vec_ds):
    ds, mat, probe = vec_ds
    got = mmr_topk(ds, probe, k=6, fetch_n=20, lam=0.7)
    assert list(got["rank"]) == list(range(1, 7))
    assert got["marginal"][0] == round6(0.7 * got["rel"][0])
    # marginals are non-increasing? NOT guaranteed by MMR in general;
    # but each step's marginal is <= lam * max remaining rel
    assert (got["marginal"] <= 0.7 * got["rel"].max() + 1e-12).all()
