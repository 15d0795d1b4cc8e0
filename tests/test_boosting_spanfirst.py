"""BM25+ similarity, boosting (negative-demotion) queries, and
span_first filtering vs independent brute-force referees over the
fixture corpus. The reference's scorer only ever ADDS positive term
contributions (search-engine/internal/bm25/score.go:77-82); these are
the negative-relevance / positional-window extensions of that kernel.
"""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import idf, topk_order
from zensearch_ray.functions.text import term_frequencies, tokenize
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine

K1, B = 1.2, 0.75

QUERIES = [
    "search engine ranking",
    "query data web site host text title",
    "zzz-not-a-word",
]


@pytest.fixture(scope="module")
def pos_index(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("bsfidx"))
    cfg = BuildConfig(
        num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en",
        positions=True,
    )
    build_index(pages_small, index_dir, cfg)
    t = pq.read_table(pages_small, columns=["text", "lang"])
    ids = np.arange(t.num_rows, dtype=np.int64)
    mask = np.array([l == "en" for l in t["lang"].to_pylist()])
    texts = [tx for tx, m in zip(t["text"].to_pylist(), mask) if m]
    return index_dir, ids[mask], texts


def _bm25_scores(doc_ids, texts, query):
    """Per-doc python-loop BM25 referee (k1=1.2, b=0.75, idf=ln(N/df))."""
    tfs = [term_frequencies(t) for t in texts]
    dls = np.array([sum(d.values()) for d in tfs], dtype=np.float64)
    n = len(texts)
    avgdl = float(dls.mean())
    df = {}
    for d in tfs:
        for term in d:
            df[term] = df.get(term, 0) + 1
    scores = np.zeros(n)
    for term in dict.fromkeys(tokenize(query)):
        if df.get(term, 0) == 0:
            continue
        w = idf(n, df[term])
        if w == 0.0:
            continue
        for i, d in enumerate(tfs):
            tf = d.get(term, 0)
            if tf == 0:
                continue
            norm = tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * dls[i] / avgdl))
            scores[i] += w * norm
    return scores


def test_bm25plus_rank_identity(pos_index):
    """BM25+ (Lv & Zhai 2011): idf·(tf_norm + 1.0) per matched term."""
    index_dir, doc_ids, texts = pos_index
    engine = QueryEngine(index_dir)
    tfs = [term_frequencies(t) for t in texts]
    dls = np.array([sum(d.values()) for d in tfs], dtype=np.float64)
    n = len(texts)
    avgdl = float(dls.mean())
    df = {}
    for d in tfs:
        for term in d:
            df[term] = df.get(term, 0) + 1
    for query in QUERIES:
        scores = np.zeros(n)
        for term in dict.fromkeys(tokenize(query)):
            if df.get(term, 0) == 0:
                continue
            w = idf(n, df[term])
            if w == 0.0:
                continue
            for i, d in enumerate(tfs):
                tf = d.get(term, 0)
                if tf == 0:
                    continue
                norm = (
                    tf * (K1 + 1.0)
                    / (tf + K1 * (1 - B + B * dls[i] / avgdl))
                )
                scores[i] += w * (norm + 1.0)
        keep = scores > 0
        ids, sc = topk_order(doc_ids[keep], scores[keep], 10)
        got = engine.topk_sim(query, k=10, similarity="bm25plus")
        assert [d for d, _ in got] == ids.tolist(), query
        np.testing.assert_allclose([s for _, s in got], sc, rtol=1e-9)


def test_bm25plus_dominates_bm25(pos_index):
    """Every BM25+ score exceeds the plain BM25 score of the same doc
    by >= idf-sum of its matched terms' delta (scores strictly larger
    whenever any term matched)."""
    index_dir, _, _ = pos_index
    engine = QueryEngine(index_dir)
    plain = dict(engine.topk(QUERIES[0], k=200))
    plus = dict(engine.topk_sim(QUERIES[0], k=200, similarity="bm25plus"))
    assert set(plain) <= set(plus)
    for d, s in plain.items():
        assert plus[d] > s


@pytest.mark.parametrize("negative", ["engine", "the", "zzz-not-a-word"])
def test_boosting_rank_identity(pos_index, negative):
    index_dir, doc_ids, texts = pos_index
    engine = QueryEngine(index_dir)
    query = "search engine ranking"
    scores = _bm25_scores(doc_ids, texts, query)
    neg_terms = set(tokenize(negative))
    has_neg = np.array(
        [bool(neg_terms & set(tokenize(t))) for t in texts]
    )
    demoted = np.where(has_neg, scores * 0.3, scores)
    keep = demoted > 0
    ids, sc = topk_order(doc_ids[keep], demoted[keep], 10)
    got = engine.topk_boosting(query, negative, k=10, negative_boost=0.3)
    assert [d for d, _ in got] == ids.tolist()
    np.testing.assert_allclose([s for _, s in got], sc, rtol=1e-9)


def test_boosting_demotes_not_excludes(pos_index):
    """A doc matching the negative leg stays in the candidate set with
    a scaled score — the exclusion form is topk_not."""
    index_dir, doc_ids, texts = pos_index
    engine = QueryEngine(index_dir)
    query = "search engine ranking"
    full = dict(engine.topk(query, k=500))
    boosted = dict(engine.topk_boosting(query, "engine", k=500))
    assert set(full) == set(boosted)  # same candidates
    neg_docs = {
        int(doc_ids[i]) for i, t in enumerate(texts)
        if "engine" in set(tokenize(t))
    }
    for d, s in full.items():
        if d in neg_docs:
            assert math.isclose(boosted[d], 0.3 * s, rel_tol=1e-12)
        else:
            assert math.isclose(boosted[d], s, rel_tol=1e-12)


@pytest.mark.parametrize("first_n", [1, 3, 25])
def test_spanfirst_rank_identity(pos_index, first_n):
    index_dir, doc_ids, texts = pos_index
    engine = QueryEngine(index_dir)
    query = "search engine ranking"
    qterms = set(tokenize(query))
    qual = np.array(
        [bool(qterms & set(tokenize(t)[:first_n])) for t in texts]
    )
    scores = _bm25_scores(doc_ids, texts, query)
    keep = qual & (scores > 0)
    ids, sc = topk_order(doc_ids[keep], scores[keep], 10)
    got = engine.topk_spanfirst(query, first_n, k=10)
    assert [d for d, _ in got] == ids.tolist(), first_n
    np.testing.assert_allclose([s for _, s in got], sc, rtol=1e-9)


def test_spanfirst_scores_equal_unfiltered(pos_index):
    """Filter-then-rank: surviving docs keep their corpus-global BM25
    score (the topk_filtered rule)."""
    index_dir, _, _ = pos_index
    engine = QueryEngine(index_dir)
    query = "search engine ranking"
    full = dict(engine.topk(query, k=500))
    span = engine.topk_spanfirst(query, 5, k=500)
    for d, s in span:
        assert math.isclose(s, full[d], rel_tol=1e-12)


def test_spanfirst_requires_positions(ray_session, pages_small, tmp_path):
    index_dir = str(tmp_path / "nopos")
    build_index(pages_small, index_dir, BuildConfig(num_shards=2, lang="en"))
    with pytest.raises(ValueError, match="positions"):
        QueryEngine(index_dir).topk_spanfirst("search", 3)


def test_spanfirst_zero_window_empty(pos_index):
    index_dir, _, _ = pos_index
    assert QueryEngine(index_dir).topk_spanfirst("search", 0) == []
