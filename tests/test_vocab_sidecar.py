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


def test_fuzzy2_probes_the_symspell_sidecar(vs_index):
    """Distance-2 fuzzy must answer from predicate-pushdown reads of
    the persisted delete-neighborhood sidecar — never by materializing
    the vocabulary or building the in-memory SymSpell index."""
    from zensearch_ray.functions.fuzzy import SymSpellIndex, expand_edit2

    ref = QueryEngine(vs_index)
    vocab = ref._all_terms()
    want = expand_edit2(SymSpellIndex(vocab, max_dist=2),
                        ["serch", "engin"])
    assert want  # the fixture must actually exercise the expansion

    eng = _guarded(QueryEngine(vs_index))
    eng._symspell = lambda: (_ for _ in ()).throw(
        AssertionError("in-memory SymSpell built despite sidecar")
    )
    assert eng.expand_fuzzy("serch engin", max_dist=2) == want
    # and the scored form stays on the same path
    ref_hits = ref.topk_fuzzy("serch engin", 10, max_dist=2)
    assert eng.topk_fuzzy("serch engin", 10, max_dist=2) == ref_hits


def test_fuzzy2_falls_back_without_sidecar(vs_index, tmp_path):
    """Pre-sidecar indexes (no symspell dir) keep working through the
    in-memory build, value-identical."""
    import shutil

    from zensearch_ray.state.manifest import IndexLayout

    clone = str(tmp_path / "idx_nosidecar")
    shutil.copytree(vs_index, clone)
    shutil.rmtree(IndexLayout(clone).symspell_dir)

    want = QueryEngine(vs_index).expand_fuzzy("serch engin", max_dist=2)
    eng = QueryEngine(clone)
    assert eng._symspell_files() is None
    assert eng.expand_fuzzy("serch engin", max_dist=2) == want


def test_fsck_flags_corrupt_symspell_sidecar(vs_index, tmp_path):
    import shutil

    import pyarrow as pa

    from zensearch_ray.pipelines.fsck import fsck_index
    from zensearch_ray.state.manifest import IndexLayout

    clone = str(tmp_path / "idx_badss")
    shutil.copytree(vs_index, clone)
    layout = IndexLayout(clone)
    victims = sorted(
        p for p in __import__("os").listdir(layout.symspell_dir)
        if p.endswith(".parquet")
    )
    bad = __import__("os").path.join(layout.symspell_dir, victims[0])
    pq.write_table(
        pa.table({"dkey": pa.array([b"zz"], pa.binary()),
                  "term": pa.array(["zz"], pa.string())}),
        bad,
    )
    report = fsck_index(clone, deep=True)
    assert not report["ok"]
    assert any("symspell sidecar disagrees" in e for e in report["errors"])


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
