"""Similarity-search operators: brute-force cosine vs numpy oracle,
IVF recall vs brute force, distributed IVF ≡ driver-side IvfIndex."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.stages.ann import (
    IvfIndex,
    cosine_topk,
    ivf_topk_dist,
    near_dup_pairs,
    normalize_rows,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, vecs


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def _brute(ids, vecs, q, k):
    m = normalize_rows(vecs)
    qn = q / (np.linalg.norm(q) or 1.0)
    sims = np.round(m @ qn, 6)
    order = np.lexsort((ids, -sims))[:k]
    return ids[order].tolist()


def test_cosine_topk_matches_numpy_oracle(emb, emb_ds):
    ids, vecs = emb
    q = vecs[0]
    got = cosine_topk(emb_ds, q, k=10)
    assert got["vec_id"].tolist() == _brute(ids, vecs, q, 10)


def test_ivf_recall_vs_brute(emb):
    """Synthetic embeddings are unclustered, so absolute IVF recall is
    data-limited; assert the properties that must hold regardless:
    recall grows with nprobe, and probing every list is exact."""
    ids, vecs = emb
    ivf = IvfIndex(vecs, ids)

    def mean_recall(nprobe):
        r = []
        for qi in range(10):
            q = vecs[qi]
            truth = set(_brute(ids, vecs, q, 10))
            got, _ = ivf.search(q, k=10, nprobe=nprobe)
            r.append(len(set(got.tolist()) & truth) / 10)
        return float(np.mean(r))

    r4, r8 = mean_recall(4), mean_recall(8)
    assert r4 >= 0.5
    assert r8 >= r4
    # nprobe = n_lists degenerates to exact search
    q = vecs[3]
    got, _ = ivf.search(q, k=10, nprobe=len(ivf.centroids))
    assert got.tolist() == _brute(ids, vecs, q, 10)


def test_ivf_dist_matches_local(emb, emb_ds):
    """Distributed IVF with train_sample >= N must equal the driver-side
    IvfIndex search (same centroid algorithm, same seed)."""
    ids, vecs = emb
    q = vecs[0]
    ivf = IvfIndex(vecs, ids)
    want_ids, want_sims = ivf.search(q, k=10, nprobe=4)
    got = ivf_topk_dist(emb_ds, q, k=10, train_sample=len(ids), nprobe=4)
    assert got["vec_id"].tolist() == want_ids.tolist()
    np.testing.assert_allclose(got["sim"].to_numpy(), want_sims, atol=1e-6)


def test_near_dup_pairs_exact(emb, emb_ds):
    ids, vecs = emb
    m = normalize_rows(vecs)
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    want = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if sims[i, j] >= 0.4
    }
    got_df = near_dup_pairs(emb_ds, 0.4).to_pandas()
    got = set(zip(got_df["a"].tolist(), got_df["b"].tolist()))
    assert got == want


def test_hard_negatives_brute_force_referee(ray_session):
    """hard_negatives == per-probe brute-force cosine top-k restricted
    to rows whose label differs from the probe's (self excluded)."""
    import ray.data as rd

    from zensearch_ray.stages.ann import hard_negatives

    t = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    labels = np.asarray(t["label"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    ids, vecs, labels = ids[order], vecs[order], labels[order]

    probe_sel = ids < 4
    ds = rd.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    out = hard_negatives(
        ds, vecs[probe_sel], ids[probe_sel], labels[probe_sel], k=7
    )

    m = normalize_rows(vecs)
    for qi, qv, ql in zip(ids[probe_sel], vecs[probe_sel], labels[probe_sel]):
        sims = np.round(m @ (qv / (np.linalg.norm(qv) or 1.0)), 6)
        mask = (labels != ql) & (ids != qi)
        cand_ids, cand_sims = ids[mask], sims[mask]
        ref = np.lexsort((cand_ids, -cand_sims))[:7]
        got = out[out["query_id"] == qi]
        assert got["vec_id"].tolist() == cand_ids[ref].tolist()
        assert got["sim"].tolist() == cand_sims[ref].tolist()
        assert got["rank"].tolist() == list(range(1, len(ref) + 1))
        # every returned negative has a different label than the probe
        got_labels = labels[np.searchsorted(ids, got["vec_id"].to_numpy())]
        assert (got_labels != ql).all()


def test_contrastive_triplets_brute_force_referee(ray_session):
    """contrastive_triplets == brute-force per-probe top-k over the
    same-label (pos) and different-label (neg) candidate sets."""
    import ray.data as rd

    from zensearch_ray.stages.ann import contrastive_triplets

    t = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    labels = np.asarray(t["label"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    ids, vecs, labels = ids[order], vecs[order], labels[order]

    probe_sel = ids < 3
    ds = rd.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    out = contrastive_triplets(
        ds, vecs[probe_sel], ids[probe_sel], labels[probe_sel],
        k_pos=4, k_neg=6,
    )

    m = normalize_rows(vecs)
    for qi, qv, ql in zip(ids[probe_sel], vecs[probe_sel], labels[probe_sel]):
        sims = np.round(m @ (qv / (np.linalg.norm(qv) or 1.0)), 6)
        for role, mask, k in (
            ("pos", (labels == ql) & (ids != qi), 4),
            ("neg", labels != ql, 6),
        ):
            cand_ids, cand_sims = ids[mask], sims[mask]
            ref = np.lexsort((cand_ids, -cand_sims))[:k]
            got = out[(out["query_id"] == qi) & (out["role"] == role)]
            assert got["vec_id"].tolist() == cand_ids[ref].tolist(), (qi, role)
            assert got["sim"].tolist() == cand_sims[ref].tolist(), (qi, role)
            assert got["rank"].tolist() == list(range(1, len(ref) + 1))


def test_filtered_topk_entry_matches_filtered_brute(ray_session):
    """embedding_topk_filtered (label-predicate pushdown + cosine
    top-k) ≡ brute force over ONLY the matching rows — pre-filter
    semantics, not post-filtering a larger unfiltered top-k."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    t = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    labels = np.asarray(t["label"].to_pylist(), dtype=np.int64)
    q = vecs[ids.tolist().index(0)]
    keep = labels == 3
    want = _brute(ids[keep], vecs[keep], q, 10)
    got = entry.queries()["embedding_topk_filtered"](SF)
    assert got["vec_id"].tolist() == want
    assert list(got["rank"]) == list(range(1, len(want) + 1))
