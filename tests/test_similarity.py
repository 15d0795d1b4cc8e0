"""Pluggable similarity (tfidf / lmd) vs an independent brute-force
referee over the fixture corpus — same segments, different ranking
function (the Lucene ``Similarity`` plug; the reference hard-codes
BM25 at ``search-engine/internal/bm25/score.go:129-131``)."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import LMD_MU, idf, topk_order
from zensearch_ray.functions.text import term_frequencies, tokenize
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine

QUERIES = [
    "search engine ranking",
    "the of and",
    "query data web site host text title",
    "zzz-not-a-word",
    "OpenAI openai OPENAI",
]


@pytest.fixture(scope="module")
def sim_index(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("simidx"))
    cfg = BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    build_index(pages_small, index_dir, cfg)
    t = pq.read_table(pages_small, columns=["text", "lang"])
    ids = np.arange(t.num_rows, dtype=np.int64)
    mask = np.array([l == "en" for l in t["lang"].to_pylist()])
    texts = [tx for tx, m in zip(t["text"].to_pylist(), mask) if m]
    return index_dir, ids[mask], texts


def _referee(doc_ids, texts, query, similarity, k=10):
    """Independent per-doc loop (no shared kernels beyond idf/topk_order
    tie-break spec)."""
    tfs = [term_frequencies(t) for t in texts]
    dls = np.array([sum(d.values()) for d in tfs], dtype=np.float64)
    n = len(texts)
    avgdl = float(dls.mean())
    total = avgdl * n
    df = {}
    ctf = {}
    for d in tfs:
        for term, c in d.items():
            df[term] = df.get(term, 0) + 1
            ctf[term] = ctf.get(term, 0) + c
    scores = np.zeros(n)
    matched = np.zeros(n, dtype=bool)
    for term in dict.fromkeys(tokenize(query)):
        if df.get(term, 0) == 0:
            continue
        for i, d in enumerate(tfs):
            tf = d.get(term, 0)
            if tf == 0:
                continue
            matched[i] = True
            if similarity == "tfidf":
                w = idf(n, df[term])
                scores[i] += w * (1.0 + math.log(tf))
            else:
                scores[i] += math.log(
                    1.0 + tf * total / (LMD_MU * ctf[term])
                ) + math.log(LMD_MU / (dls[i] + LMD_MU))
    keep = (scores > 0) if similarity == "tfidf" else matched
    ids, sc = topk_order(doc_ids[keep], scores[keep], k)
    return list(zip(ids.tolist(), sc.tolist()))


@pytest.mark.parametrize("similarity", ["tfidf", "lmd"])
@pytest.mark.parametrize("query", QUERIES)
def test_sim_rank_identity(sim_index, similarity, query):
    index_dir, doc_ids, texts = sim_index
    engine = QueryEngine(index_dir)
    got = engine.topk_sim(query, k=10, similarity=similarity)
    want = _referee(doc_ids, texts, query, similarity)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-9
    )


def test_sim_bm25_mode_is_default_path(sim_index):
    index_dir, _, _ = sim_index
    engine = QueryEngine(index_dir)
    q = "search engine ranking"
    assert engine.topk_sim(q, k=10, similarity="bm25") == engine.topk(q, k=10)


def test_sim_unknown_raises(sim_index):
    index_dir, _, _ = sim_index
    with pytest.raises(ValueError):
        QueryEngine(index_dir).topk_sim("a", similarity="dfr")


def test_lmd_negative_scores_rank(sim_index):
    """LMD keeps (and correctly orders) docs whose total score is
    negative — the no-zero-filter contract."""
    index_dir, doc_ids, texts = sim_index
    engine = QueryEngine(index_dir)
    got = engine.topk_sim("the", k=10, similarity="lmd")
    assert got, "stopword matches docs"
    sc = [s for _, s in got]
    assert sc == sorted(sc, reverse=True)
