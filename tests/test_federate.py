"""Federated doc-sharded search (pipelines/federate.py): per-shard
scoring under broadcast global stats must be BIT-identical to a
one-shot build over the union corpus, for both the in-process engine
and the actor-backed service; global stats must combine exactly;
tombstoned shards are rejected."""

from __future__ import annotations

import numpy as np
import pytest

from zensearch_ray.pipelines.federate import FederatedEngine, FederatedService
from zensearch_ray.pipelines.query import QueryEngine

SF = "/root/testdata/sf0.001"
QUERIES = [
    "spark window merge stream table",
    "hash join",
    "dup stream table",
    "stream nosuchtermxyz",
    "the",          # df == N candidate → idf 0 handling
    "",             # empty query
]


@pytest.fixture(scope="module")
def shards(ray_session):
    from zensearch_ray.pipelines.corpus import federated_shard_dirs

    return federated_shard_dirs(SF, n_shards=2)


@pytest.fixture(scope="module")
def union_engine(ray_session):
    from zensearch_ray.pipelines.corpus import index_dir_for

    return QueryEngine(index_dir_for(SF))


def test_global_stats_exact(shards, union_engine):
    fed = FederatedEngine(shards)
    assert fed.n_docs == union_engine.n_docs
    assert fed.avgdl == union_engine.avgdl  # bit-equal float, not approx
    # global df per term == union index df (disjoint doc subsets)
    for t in ["stream", "table", "dup", "nosuchtermxyz"]:
        df_g = sum(e.df(t) for e in fed.engines)
        assert df_g == union_engine.df(t), t


def test_engine_bit_identical_to_union(shards, union_engine):
    fed = FederatedEngine(shards)
    for q in QUERIES:
        got = fed.topk(q, 10)
        want = union_engine.topk(q, 10)
        assert got == want, q  # exact floats, exact order


def test_shards_are_disjoint_and_partial(shards, union_engine):
    # each shard indexes a strict subset: shard results alone must NOT
    # equal the union ranking for the standing query (guards against a
    # degenerate split where one shard got everything)
    e0, e1 = (QueryEngine(d) for d in shards)
    assert e0.n_docs + e1.n_docs == union_engine.n_docs
    assert 0 < e0.n_docs < union_engine.n_docs
    # doc_id parity split by construction
    ids0, _, _ = e0.lookup("stream").decode_all()
    ids1, _, _ = e1.lookup("stream").decode_all()
    assert (ids0 % 2 == 0).all() and (ids1 % 2 == 1).all()
    assert not np.intersect1d(ids0, ids1).size


def test_service_matches_engine(shards):
    fed = FederatedEngine(shards)
    with FederatedService(shards) as svc:
        assert len(set(svc.shard_pids())) == 2  # really two actors
        for q in QUERIES[:4]:
            assert svc.topk(q, 10) == fed.topk(q, 10), q
        batch = svc.topk_batch(QUERIES[:4], 10)
        assert batch == [fed.topk(q, 10) for q in QUERIES[:4]]


def test_service_replicas_per_shard(shards):
    """An S × R replica grid must stay bit-identical to the engine on
    every path (single queries round-robin replicas; batches split
    across each shard's replicas) — the per-shard THROUGHPUT scaling
    knob the 10M federated soak motivated (BASELINE §8)."""
    fed = FederatedEngine(shards)
    with FederatedService(shards, replicas_per_shard=2) as svc:
        assert len(set(svc.shard_pids())) == 4  # 2 shards × 2 replicas
        for q in QUERIES[:4]:
            assert svc.topk(q, 10) == fed.topk(q, 10), q
            assert svc.topk(q, 10) == fed.topk(q, 10), q  # other replica
        batch = svc.topk_batch(QUERIES, 10)
        assert batch == [fed.topk(q, 10) for q in QUERIES]
        # odd batch against even replica count: every slot still lands
        batch3 = svc.topk_batch(QUERIES[:3], 10)
        assert batch3 == [fed.topk(q, 10) for q in QUERIES[:3]]


def test_local_idf_would_differ(shards, union_engine):
    # the exactness the two-phase protocol buys: scoring shard 0 with
    # its LOCAL stats gives different scores than the union engine —
    # i.e. the global-stats broadcast is load-bearing, not decorative
    e0 = QueryEngine(shards[0])
    local = dict(e0.topk("dup stream table", 50))
    union = dict(union_engine.topk("dup stream table", 50))
    common = set(local) & set(union)
    assert common  # sanity: some shard-0 docs rank in both
    assert any(abs(local[d] - union[d]) > 1e-9 for d in common)


def test_tombstoned_shard_rejected(shards, tmp_path):
    import shutil

    from zensearch_ray.pipelines.delete import delete_docs

    dup = str(tmp_path / "shard0_del")
    shutil.copytree(shards[0], dup)
    eng = QueryEngine(dup)
    ids, _, _ = eng.lookup("stream").decode_all()
    delete_docs(dup, doc_ids=ids[:1])
    with pytest.raises(ValueError, match="tombstones"):
        FederatedEngine([dup, shards[1]])
