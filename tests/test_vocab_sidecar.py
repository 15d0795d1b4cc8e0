"""Vocab-scale serving memory: wildcard / regex / substring / fuzzy /
did-you-mean / autocomplete must answer from PRUNED or STREAMED
term-dictionary sidecar reads — never by materializing the full
vocabulary into the engine (``_all_terms``) — and stay value-identical
to the full-vocab computation."""

import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table


@pytest.fixture(scope="module")
def vs_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("vs")
    t = generate_pages_table(300, seed=21)
    p = str(root / "pages.parquet")
    pq.write_table(t, p, row_group_size=64)
    d = str(root / "idx")
    build_index(p, d, BuildConfig(num_shards=4, salt_subs=2, lang="en"))
    return d


def _guarded(engine):
    def boom():
        raise AssertionError("_all_terms materialized the vocabulary")

    engine._all_terms = boom
    return engine


def test_expansions_never_materialize_vocab(vs_index):
    ref = QueryEngine(vs_index)
    vocab = ref._all_terms()

    eng = _guarded(QueryEngine(vs_index))
    # wildcard with literal prefix → pruned window read
    want = [t for t in vocab if re.fullmatch("s.*a.*", t)]
    assert eng.expand_wildcard("s*a*") == want
    # wildcard with leading * and a short seed → streamed dictionary
    rx = re.compile(".*ing\\Z")
    assert eng.expand_wildcard("*ing", max_terms=10000) == sorted(
        {t for t in vocab if rx.match(t)}
    )
    # regex with literal prefix → window; without → stream
    assert eng.expand_regex("st.*") == [
        t for t in vocab if re.fullmatch("st.*", t)
    ]
    assert eng.expand_regex(".*tion", max_terms=10000) == sorted(
        {t for t in vocab if re.fullmatch(".*tion", t)}
    )
    # short-substring fallback (trigram sidecar needs ≥3 chars) → stream
    assert eng.expand_infix("ar", max_terms=10000) == sorted(
        {t for t in vocab if "ar" in t}
    )


def test_fuzzy_and_dym_stream_the_dictionary(vs_index):
    from zensearch_ray.functions.fuzzy import expand_edit1

    ref = QueryEngine(vs_index)
    vocab = ref._all_terms()
    eng = _guarded(QueryEngine(vs_index))
    assert eng.expand_fuzzy("strem windoq", max_dist=1) == expand_edit1(
        vocab, ["strem", "windoq"]
    )
    got = eng.suggest("strem")
    assert got and got[0][0] == "strem"
    cands = [v for v in vocab
             if len(expand_edit1([v], ["strem"])) == 1]
    best = min(cands, key=lambda t: (t != "strem", -ref.df(t), t))
    assert got[0][1] == best


def test_autocomplete_windows_above_cache_cap(vs_index):
    ref = QueryEngine(vs_index)
    want = ref.autocomplete("se", 10)
    eng = _guarded(QueryEngine(vs_index))
    eng._VOCAB_CACHE_MAX_TERMS = 0  # force the vocab-scale route
    assert eng.autocomplete("se", 10) == want
    assert eng._vocab_df is None  # the resident arrays were never built
    # and the (metadata-only) bound is what routed it
    assert eng._vocab_upper_bound() > 0
    # the small-vocab default still caches (fast path intact)
    eng2 = QueryEngine(vs_index)
    assert eng2.autocomplete("se", 10) == want
    assert eng2._vocab_df is not None
