"""Ranking-quality metrics (pipelines/evaluate.py): the posting-
intersection relevance set must equal brute-force text containment,
metrics must equal an independent per-query referee computation, and
edge probes (vocabulary miss, n_rel < k ideal truncation) hit their
pinned values."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.evaluate import _relevant_ids, ranking_metrics
from zensearch_ray.pipelines.query import QueryEngine

SF = "/root/testdata/sf0.001"
QUERIES = ["spark window merge stream table", "hash join",
           "dup stream table", "stream nosuchtermxyz"]


@pytest.fixture(scope="module")
def idx(ray_session):
    from zensearch_ray.pipelines.corpus import index_dir_for

    return index_dir_for(SF)


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return {d: set(tokenize(x))
            for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}


def test_relevance_set_equals_text_containment(idx, docs):
    eng = QueryEngine(idx)
    for q in QUERIES:
        terms = sorted(set(tokenize(q)))
        got = set(_relevant_ids(eng, terms).tolist())
        want = {d for d, toks in docs.items() if all(t in toks for t in terms)}
        assert got == want, q


def test_metrics_match_referee(idx, docs):
    eng = QueryEngine(idx)
    out = ranking_metrics(idx, QUERIES, k=10).set_index("query")
    assert list(out.index) == sorted(QUERIES)  # output is query-ordered
    for q in QUERIES:
        terms = sorted(set(tokenize(q)))
        rel = {d for d, toks in docs.items()
               if all(t in toks for t in terms)}
        ranked = [d for d, _ in eng.topk(q, 10)]
        flags = [d in rel for d in ranked]
        hits = sum(flags)
        mrr = next((1.0 / (i + 1) for i, f in enumerate(flags) if f), 0.0)
        dcg = sum(1.0 / math.log2(i + 2) for i, f in enumerate(flags) if f)
        n_ideal = min(len(rel), 10)
        idcg = sum(1.0 / math.log2(i + 2) for i in range(n_ideal))
        ndcg = dcg / idcg if idcg else 0.0
        row = out.loc[q]
        assert row["n_rel"] == len(rel), q
        assert row["hits_at_k"] == hits, q
        assert row["mrr_at_k"] == np.round(mrr, 6), q
        assert abs(row["ndcg_at_k"] - ndcg) < 2e-6, q


def test_edge_probes(idx):
    out = ranking_metrics(idx, QUERIES, k=10).set_index("query")
    miss = out.loc["stream nosuchtermxyz"]
    assert miss["n_rel"] == 0 and miss["hits_at_k"] == 0
    assert miss["mrr_at_k"] == 0.0 and miss["ndcg_at_k"] == 0.0
    rare = out.loc["dup stream table"]
    assert 0 < rare["n_rel"] < 25  # 'dup' df ≈ 5% → small conjunction
    # n_rel > hits here → ndcg strictly below 1 (truncation branch live)
    if rare["hits_at_k"] < min(rare["n_rel"], 10):
        assert rare["ndcg_at_k"] < 1.0
