"""Exact-phrase top-k: contiguity semantics on a handcrafted corpus.

The engine (pipelines/corpus.py phrase_topk) takes conjunctive
(intersection) candidates from the index and verifies the contiguous
token run against document text — these tests pin the semantics the
sf-dir oracle can't isolate: a doc containing both terms NON-adjacent
must be excluded, and surviving scores must equal the conjunctive BM25
scores for the same docs.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import bm25_topk, phrase_topk

DOCS = [
    # doc 0: phrase present, once
    "alpha beta gamma delta",
    # doc 1: both terms, NOT adjacent — conjunctive hit, phrase miss
    "alpha gamma beta delta",
    # doc 2: phrase present twice (higher tf on both terms)
    "alpha beta alpha beta epsilon",
    # doc 3: only one term
    "alpha gamma gamma delta",
    # doc 4: neither
    "zeta eta theta iota",
    # doc 5: phrase at end of doc (boundary of the needle padding)
    "gamma delta alpha beta",
    # doc 6: reversed order only (never alpha→beta adjacent)
    "beta zeta alpha zeta beta",
]


@pytest.fixture(scope="module")
def phrase_sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("phrase_sf")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
            "text": pa.array(DOCS, type=pa.string()),
            "lang": pa.array(["en"] * len(DOCS)),
            "source": pa.array(["t"] * len(DOCS)),
            "n_chars": pa.array([len(s) for s in DOCS], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_phrase_contiguity(phrase_sf_dir):
    out = phrase_topk(phrase_sf_dir, "alpha beta", k=10)
    # docs 1 and 6 contain both terms but never the contiguous run
    assert set(out["doc_id"]) == {0, 2, 5}
    assert list(out["rank"]) == [1, 2, 3]


def test_phrase_scores_match_conjunctive(phrase_sf_dir):
    """Surviving docs keep their conjunctive-BM25 score and relative
    order — phrase verification filters, never rescores."""
    ph = phrase_topk(phrase_sf_dir, "alpha beta", k=10)
    conj = bm25_topk(phrase_sf_dir, "alpha beta", k=10, conjunctive=True)
    merged = ph.merge(conj, on="doc_id", suffixes=("_ph", "_conj"))
    assert len(merged) == len(ph)
    pd.testing.assert_series_equal(
        merged["score_ph"], merged["score_conj"], check_names=False
    )
    # rank order is the conjunctive order restricted to survivors
    conj_order = [d for d in conj["doc_id"] if d in set(ph["doc_id"])]
    assert list(ph.sort_values("rank")["doc_id"]) == conj_order


def test_phrase_absent_returns_empty_with_schema(phrase_sf_dir):
    out = phrase_topk(phrase_sf_dir, "beta gamma zeta", k=10)
    assert len(out) == 0
    assert [str(t) for t in out.dtypes] == ["int64", "int64", "float64"]


def test_phrase_k_truncates(phrase_sf_dir):
    out = phrase_topk(phrase_sf_dir, "alpha beta", k=2)
    assert len(out) == 2
    assert list(out["rank"]) == [1, 2]
