"""Percolator (reverse search): vectorized boolean matching vs a
brute-force per-document referee, plus Dataset-level plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from zensearch_ray.functions.boolquery import parse_bool
from zensearch_ray.functions.text import tokenize
from zensearch_ray.stages.percolate import Percolator, percolate

_TEXTS = [
    "spark window merge stream table",
    "spark spark hash window",
    "hash join window table",
    "merge stream only doc",
    "window window window",
    "spark hash merge",
    "unrelated words entirely here",
    "",
]

_QUERIES = {
    "a": "spark AND window",
    "b": "hash OR (merge AND stream)",
    "c": "table -join",
    "d": "NOT (spark OR hash OR merge OR window)",
    "e": "nosuchterm",
    "f": "(spark OR NOT spark)",  # tautology: every doc
}


def _referee():
    want = set()
    for qid, expr in _QUERIES.items():
        ast = parse_bool(expr)

        def ev(node, toks):
            kind = node[0]
            if kind == "term":
                return node[1] in toks
            if kind == "and":
                return all(ev(c, toks) for c in node[1])
            if kind == "or":
                return any(ev(c, toks) for c in node[1])
            return not ev(node[1], toks)

        for i, tx in enumerate(_TEXTS):
            if ev(ast, set(tokenize(tx))):
                want.add((i, qid))
    return want


def _batch(texts, ids=None):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(
                np.asarray(ids if ids is not None else range(n), dtype=np.int64)
            ),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_percolator_matches_referee():
    out = Percolator(_QUERIES)(_batch(_TEXTS))
    got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
    assert got == _referee()
    assert out.schema.field("query_id").type == pa.string()
    assert out.schema.field("doc_id").type == pa.int64()


def test_percolator_batch_split_invariance():
    """Matching is per-document: any batch partitioning yields the
    same sparse match set (the map-only distribution argument)."""
    whole = Percolator(_QUERIES)(_batch(_TEXTS))
    want = set(zip(whole["doc_id"].to_pylist(), whole["query_id"].to_pylist()))
    p = Percolator(_QUERIES)
    got = set()
    for lo in range(0, len(_TEXTS), 3):
        texts = _TEXTS[lo : lo + 3]
        chunk = p(_batch(texts, ids=range(lo, lo + len(texts))))
        got.update(zip(chunk["doc_id"].to_pylist(), chunk["query_id"].to_pylist()))
    assert got == want


def test_percolator_empty_inputs():
    out = Percolator(_QUERIES)(_batch([]))
    assert out.num_rows == 0
    out = Percolator({})(_batch(_TEXTS))
    assert out.num_rows == 0


def test_percolator_bad_query_fails_at_registration():
    with pytest.raises(Exception):
        Percolator({"bad": "a OR"})


def test_percolate_dataset(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(_batch(_TEXTS))
    out = percolate(docs, _QUERIES).to_pandas()
    got = set(zip(out["doc_id"], out["query_id"]))
    assert got == _referee()
