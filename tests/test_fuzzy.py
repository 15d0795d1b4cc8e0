"""Fuzzy (edit-distance-1) query expansion: the vectorized byte-wise
lcp/lcs screen must agree with a reference Levenshtein DP everywhere
(including multi-byte UTF-8, where DuckDB's byte semantics are the
contract), and topk_fuzzy must equal scoring the expansion as an
OR-query."""

import itertools

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.fuzzy import edit1_mask, expand_edit1
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine


def _lev_bytes(a: str, b: str) -> int:
    """Reference DP over UTF-8 bytes (DuckDB levenshtein semantics)."""
    a, b = a.encode(), b.encode()
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_edit1_mask_matches_dp_referee():
    pool = ["".join(p) for n in range(0, 4) for p in itertools.product("abc", repeat=n)]
    pool += ["café", "cafe", "caf", "cafés", "straße", "strasse",
             "naïve", "naive", "中文", "中", "stream", "strem", "key"]
    for q in ["ab", "abc", "abca", "a", "café", "naive", "中文", "xyz", "strem"]:
        want = np.array([_lev_bytes(t, q) <= 1 for t in pool])
        got = edit1_mask(pool, q)
        assert (want == got).all(), (q, [pool[i] for i in np.nonzero(want != got)[0]])


def test_edit1_unicode_is_byte_based():
    # é is 2 UTF-8 bytes → distance('cafe','café') == 2, NOT a match;
    # this is deliberate DuckDB/Postgres levenshtein parity
    assert not edit1_mask(["café"], "cafe")[0]
    assert edit1_mask(["cafés"], "café")[0]  # one byte appended


def test_expand_edit1_unions_query_terms():
    vocab = ["stream", "window", "key", "table", "strem"]
    got = expand_edit1(vocab, ["strem", "windoq", "kay", "strem"])
    assert got == ["key", "stream", "strem", "window"]
    assert expand_edit1([], ["x"]) == []
    assert expand_edit1(vocab, []) == []


@pytest.fixture(scope="module")
def fuzzy_index(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("fuzzy_idx"))
    cfg = BuildConfig(num_shards=8, salt_subs=4, heavy_df_threshold=60, lang="en")
    build_index(pages_small, index_dir, cfg)
    return index_dir, pages_small


def test_expand_fuzzy_matches_vocab_scan(fuzzy_index):
    from zensearch_ray.functions.text import tokenize

    index_dir, pages_path = fuzzy_index
    engine = QueryEngine(index_dir)
    t = pq.read_table(pages_path, columns=["text", "lang"])
    vocab = set()
    for tx, lg in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
        if lg == "en":
            vocab.update(tokenize(tx))
    for q in ["serch", "engin", "tha", "café", "zzzzzzz", "serch engin"]:
        toks = tokenize(q)
        want = sorted(
            v for v in vocab if any(_lev_bytes(v, tk) <= 1 for tk in toks)
        )
        assert engine.expand_fuzzy(q) == want, q


def test_suggest_matches_brute_force(fuzzy_index):
    from zensearch_ray.functions.text import tokenize

    index_dir, pages_path = fuzzy_index
    engine = QueryEngine(index_dir)
    t = pq.read_table(pages_path, columns=["text", "lang"])
    docs = [
        set(tokenize(tx))
        for tx, lg in zip(t["text"].to_pylist(), t["lang"].to_pylist())
        if lg == "en"
    ]
    vocab = sorted(set().union(*docs))
    df = {v: sum(v in d for d in docs) for v in vocab}
    for q in ["serch engin", "the", "tha thb", "zzzzzzzz", "café"]:
        want = []
        for tok in sorted(set(tokenize(q))):
            cands = [v for v in vocab if _lev_bytes(v, tok) <= 1]
            if not cands:
                continue
            best = min(cands, key=lambda v: (v != tok, -df[v], v))
            want.append((tok, best, df[best]))
        assert engine.suggest(q) == want, q
    # an exactly-spelled token suggests itself even when a neighbor has
    # higher df ("the" is the df champion around most 3-letter tokens)
    for tok, sug, _ in engine.suggest("the"):
        assert sug == tok == "the"


def test_topk_fuzzy_scores_expansion_as_or_query(fuzzy_index):
    from zensearch_ray.functions.bm25 import idf

    index_dir, _ = fuzzy_index
    engine = QueryEngine(index_dir)
    for q in ["serch engin", "tha", "qqqqzzz"]:
        terms = engine.expand_fuzzy(q)
        plan = []
        for term in terms:
            p = engine.lookup(term)
            if p is None:
                continue
            w = idf(engine.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        want = engine._score_plan(plan, 10) if plan else []
        assert engine.topk_fuzzy(q, 10) == want, q
    assert engine.topk_fuzzy("", 10) == []


def test_levenshtein_bytes_matches_dp_referee():
    from zensearch_ray.functions.fuzzy import levenshtein_bytes

    pool = ["".join(p) for n in range(0, 4)
            for p in itertools.product("abc", repeat=n)]
    pool += ["café", "cafe", "straße", "strasse", "中文", "中", "stream"]
    for a in pool[::3] + ["café", "stream", ""]:
        for b in pool[::5] + ["中文", "abca"]:
            assert levenshtein_bytes(a.encode(), b.encode()) == _lev_bytes(
                a, b
            ), (a, b)


def test_symspell_deletes_upto():
    from zensearch_ray.functions.fuzzy import deletes_upto

    assert deletes_upto(b"ab", 1) == {b"ab", b"a", b"b"}
    assert deletes_upto(b"abc", 2) == {
        b"abc", b"ab", b"ac", b"bc", b"a", b"b", b"c"
    }
    assert deletes_upto(b"", 2) == {b""}


def test_symspell_lookup_matches_brute_scan():
    """The delete-bucket candidate set must lose NOTHING: lookup ==
    brute-force distance-<=2 scan of the vocabulary for every probe
    (incl. multi-byte UTF-8 and probes far from everything)."""
    from zensearch_ray.functions.fuzzy import SymSpellIndex

    vocab = sorted({
        "stream", "strem", "steam", "scream", "street", "key", "kay",
        "a", "ab", "the", "table", "cable", "café", "cafe", "中文",
    })
    idx = SymSpellIndex(vocab, max_dist=2)
    for q in ["stream", "stram", "str", "kay", "k", "caffe", "中", "zzzzz", ""]:
        for d in (1, 2):
            want = sorted(v for v in vocab if _lev_bytes(v, q) <= d)
            assert idx.lookup(q, d) == want, (q, d)
    with pytest.raises(ValueError, match="max_dist"):
        idx.lookup("x", 3)


def test_expand_fuzzy_dist2_matches_vocab_scan(fuzzy_index):
    from zensearch_ray.functions.text import tokenize

    index_dir, pages_path = fuzzy_index
    engine = QueryEngine(index_dir)
    t = pq.read_table(pages_path, columns=["text", "lang"])
    vocab = set()
    for tx, lg in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
        if lg == "en":
            vocab.update(tokenize(tx))
    for q in ["serch", "engin", "tha", "zzzzzzz", "serch engin", "kay"]:
        toks = tokenize(q)
        want = sorted(
            v for v in vocab if any(_lev_bytes(v, tk) <= 2 for tk in toks)
        )
        assert engine.expand_fuzzy(q, max_dist=2) == want, q
    with pytest.raises(ValueError, match="max_dist"):
        engine.expand_fuzzy("x", max_dist=3)


def test_topk_fuzzy_dist2_scores_expansion_as_or_query(fuzzy_index):
    from zensearch_ray.functions.bm25 import idf

    index_dir, _ = fuzzy_index
    engine = QueryEngine(index_dir)
    for q in ["serch engin", "tha", "qqqqzzz"]:
        terms = engine.expand_fuzzy(q, max_dist=2)
        plan = []
        for term in terms:
            p = engine.lookup(term)
            if p is None:
                continue
            w = idf(engine.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        want = engine._score_plan(plan, 10) if plan else []
        assert engine.topk_fuzzy(q, 10, max_dist=2) == want, q
