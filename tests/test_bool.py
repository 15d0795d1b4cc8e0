"""Boolean retrieval (AND/OR/NOT + parens): parser unit tests and
engine semantics vs a brute-force set-algebra + BM25Oracle referee."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import BM25Oracle
from zensearch_ray.functions.boolquery import (
    BoolParseError,
    parse_bool,
    scoring_terms,
)
from zensearch_ray.functions.rounding import round6
from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine

# ---------------------------------------------------------------- parser


def test_parse_precedence_and_adjacency():
    # adjacency binds as AND, OR is lowest, NOT is unary
    ast = parse_bool("a b OR NOT c")
    assert ast == ("or", [("and", [("term", "a"), ("term", "b")]),
                          ("not", ("term", "c"))])


def test_parse_parens_and_dash_sugar():
    assert parse_bool("(a OR b) -c") == (
        "and", [("or", [("term", "a"), ("term", "b")]), ("not", ("term", "c"))]
    )


def test_parse_multiword_token_expands_to_and():
    # pinned tokenizer splits "http/2"-style input; '/' is not a lexer
    # char so the word reaches tokenize() whole
    assert parse_bool("http/2") == ("and", [("term", "http"), ("term", "2")])


def test_parse_errors():
    for bad in ("", "AND a", "a OR", "(a b", "a )", "NOT"):
        with pytest.raises(BoolParseError):
            parse_bool(bad)


def test_scoring_terms_excludes_negated():
    ast = parse_bool("(a OR NOT b) c -a")
    # 'a' occurs both positively and negated → scores (positive wins);
    # 'b' only under NOT → never scores
    assert scoring_terms(ast) == ["a", "c"]


# ---------------------------------------------------------------- engine

_TEXTS = [
    "spark window merge stream table",
    "spark spark hash window",
    "hash join window table",
    "merge stream only doc",
    "window window window",
    "spark hash merge",
    "unrelated words entirely here",
    "hash window stream",
]


@pytest.fixture(scope="module")
def bool_index(ray_session, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bool") / "docs.parquet")
    n = len(_TEXTS)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "url": pa.array([f"https://b.test/{i}" for i in range(n)]),
                "warc_ts": pa.array(
                    np.arange(n, dtype=np.int64), type=pa.timestamp("us")
                ),
                "text": pa.array(_TEXTS),
                "lang": pa.array(["en"] * n),
            }
        ),
        path,
    )
    d = str(tmp_path_factory.mktemp("bool_idx"))
    build_index(path, d, BuildConfig(num_shards=4, salt_subs=2, lang=None, id_col="doc_id"))
    return QueryEngine(d)


def _referee(expr: str, k: int = 10):
    """Brute-force: membership by Python set algebra over the texts,
    scores via BM25Oracle restricted to the non-negated terms."""
    oracle = BM25Oracle(list(range(len(_TEXTS))), _TEXTS)
    docsets = {
        t: {i for i, tx in enumerate(_TEXTS) if t in tokenize(tx)}
        for t in {w for tx in _TEXTS for w in tokenize(tx)}
    }
    universe = set(range(len(_TEXTS)))

    def ev(node):
        kind = node[0]
        if kind == "term":
            return docsets.get(node[1], set())
        if kind == "and":
            out = ev(node[1][0])
            for c in node[1][1:]:
                out &= ev(c)
            return out
        if kind == "or":
            out = set()
            for c in node[1]:
                out |= ev(c)
            return out
        return universe - ev(node[1])

    ast = parse_bool(expr)
    cand = ev(ast)
    scores = oracle.score(" ".join(scoring_terms(ast)))
    ranked = sorted(((i, scores[i]) for i in cand), key=lambda p: (-p[1], p[0]))
    return [(i, round6(s)) for i, s in ranked[:k]]


BOOL_QUERIES = [
    "spark AND window",
    "spark OR hash",
    "(spark OR hash) AND window -merge",
    "NOT spark",                      # pure complement → zero scores
    "window AND NOT (hash OR merge)",
    "spark spark window",             # duplicates collapse (distinct terms)
    "nosuchterm OR window",
    "nosuchterm AND window",          # empty
    "(spark OR NOT spark)",           # tautology → whole corpus
]


def test_bool_matches_referee(bool_index):
    for q in BOOL_QUERIES:
        got = [(d, round6(s)) for d, s in bool_index.topk_bool(q, k=10)]
        assert got == _referee(q), f"query {q!r}"


def test_pure_not_returns_zero_scores(bool_index):
    hits = bool_index.topk_bool("NOT spark", k=10)
    assert all(s == 0.0 for _, s in hits)
    assert [d for d, _ in hits] == [2, 3, 4, 6, 7]  # docs without spark


def test_bool_respects_tombstones(ray_session, bool_index, tmp_path_factory):
    import shutil

    from zensearch_ray.pipelines.delete import delete_docs

    d2 = str(tmp_path_factory.mktemp("bool_idx_del"))
    shutil.rmtree(d2)
    shutil.copytree(bool_index.layout.root, d2)
    delete_docs(d2, doc_ids=[2, 3])
    engine = QueryEngine(d2)
    # complement universe must exclude tombstoned docs too
    assert [d for d, _ in engine.topk_bool("NOT spark", k=10)] == [4, 6, 7]
    assert 2 not in {d for d, _ in engine.topk_bool("hash OR merge", k=10)}
