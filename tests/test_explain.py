"""Score explanation (Lucene-Explanation analog of the reference's
per-webpage TfRating/IdfRating/Bm25rating fields): per-term
contributions must reproduce the ranked score, term stats must match
the engine's own df/idf, and a requested doc outside the results must
explain to its true (possibly zero-term) breakdown."""

import math

import pytest

from zensearch_ray.functions.bm25 import idf
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine

QUERIES = [
    "search engine ranking",
    "the of and",
    "query data web site host text title",
    "the",
]


@pytest.fixture(scope="module")
def engine(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("exidx"))
    cfg = BuildConfig(num_shards=8, salt_subs=4, heavy_df_threshold=60, lang="en")
    build_index(pages_small, index_dir, cfg)
    return QueryEngine(index_dir)


def test_contributions_sum_to_ranked_score(engine):
    for q in QUERIES:
        want = engine.topk(q, 10)
        exp = engine.explain(q, k=10)
        assert [e["doc_id"] for e in exp] == [d for d, _ in want]
        for e, (_, score) in zip(exp, want):
            assert e["score"] == score
            total = math.fsum(t["contribution"] for t in e["terms"])
            assert total == pytest.approx(score, rel=1e-12)
            for t in e["terms"]:
                assert t["df"] == engine.df(t["term"])
                assert t["idf"] == pytest.approx(
                    idf(engine.n_docs, t["df"]), rel=1e-15
                )
                assert t["contribution"] == pytest.approx(
                    t["idf"] * t["tf_norm"], rel=1e-15
                )
                assert t["tf"] >= 1 and t["dl"] >= t["tf"]


def test_duplicate_query_tokens_count_twice(engine):
    one = engine.explain("the", k=1)[0]
    two = engine.explain("the the", k=1, doc_id=one["doc_id"])[0]
    assert len(two["terms"]) == 2 * len(one["terms"])
    assert two["score"] == pytest.approx(2 * one["score"], rel=1e-12)


def test_explain_specific_doc(engine):
    hits = engine.topk("search engine", k=3)
    d, s = hits[-1]
    e = engine.explain("search engine", doc_id=d)
    assert len(e) == 1 and e[0]["doc_id"] == d
    assert e[0]["score"] == pytest.approx(s, rel=1e-12)
    # a doc with no query terms explains to zero, not an error
    none = engine.explain("zzzqqqxyzzy", doc_id=d)
    assert none[0]["score"] == 0.0 and none[0]["terms"] == []
