"""Ranking-quality evaluation over the engine's own rankings — the
search-relevance scorecard (hits@k, MRR@k, nDCG@k) a search team runs
after every index or scoring change. The reference exposes raw
BM25 components per hit (``search-engine/internal/types/types.go:3-13``)
but no aggregate quality metric; this is the batch-scale completion of
that surface.

Relevance labels are derived, not hand-annotated: a document is
relevant to a query iff it contains EVERY query term (the conjunctive
containment oracle — computable exactly both from the index's posting
lists and in SQL, so the whole metric pipeline is value-checkable
against DuckDB). Binary gains; ideal DCG truncates at min(n_rel, k).

Scale shape: each query costs one top-k evaluation plus one posting
intersection — both index-backed, no corpus scan; a 10k-query eval
batch is embarrassingly parallel over the warm ``QueryService``
replicas (see ``service.py``), and the metric rows are k-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from zensearch_ray.functions.rounding import round6
from zensearch_ray.functions.text import tokenize


def _relevant_ids(engine, terms: list[str]) -> np.ndarray:
    """Sorted doc_ids containing EVERY term (posting intersection);
    any vocabulary miss → empty."""
    cur: np.ndarray | None = None
    for t in terms:
        p = engine.lookup(t)
        if p is None:
            return np.empty(0, dtype=np.int64)
        ids = p.decode_all()[0]
        cur = ids if cur is None else cur[np.isin(cur, ids)]
        if cur is not None and len(cur) == 0:
            return np.empty(0, dtype=np.int64)
    return cur if cur is not None else np.empty(0, dtype=np.int64)


def ranking_metrics(index_dir: str, queries: list[str], k: int = 10) -> pd.DataFrame:
    """One row per query: (query, n_rel, hits_at_k, mrr_at_k,
    ndcg_at_k), floats round6'd, ordered by query — the oracle-checked
    evaluation surface."""
    from zensearch_ray.pipelines.query import QueryEngine

    engine = QueryEngine(index_dir)
    rows = []
    for q in sorted(queries):
        terms = sorted(set(tokenize(q)))
        rel = _relevant_ids(engine, terms)
        ranked = engine.topk(q, k)  # (doc_id, score), score>0, rank order
        ranks = np.arange(1, len(ranked) + 1, dtype=np.float64)
        is_rel = np.isin(
            np.array([d for d, _ in ranked], dtype=np.int64), rel)
        hits = int(is_rel.sum())
        mrr = float(1.0 / ranks[is_rel][0]) if hits else 0.0
        dcg = float(np.sum(1.0 / np.log2(ranks[is_rel] + 1.0)))
        n_ideal = min(len(rel), k)
        idcg = float(np.sum(
            1.0 / np.log2(np.arange(1, n_ideal + 1, dtype=np.float64) + 1.0)))
        ndcg = dcg / idcg if idcg > 0 else 0.0
        rows.append({
            "query": q,
            "n_rel": len(rel),
            "hits_at_k": hits,
            "mrr_at_k": round6(mrr),
            "ndcg_at_k": round6(ndcg),
        })
    return pd.DataFrame(
        rows, columns=["query", "n_rel", "hits_at_k", "mrr_at_k", "ndcg_at_k"]
    )
