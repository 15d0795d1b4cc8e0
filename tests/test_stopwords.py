"""Index-time stopword removal (BuildConfig.stopwords — Lucene
StopFilter semantics): stop terms vanish from the vocabulary, doc
lengths count surviving tokens only, scoring equals a BM25 referee
over the filtered texts, and the config fingerprint isolates filtered
from unfiltered artifacts."""

import re

import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import BM25Oracle
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table

STOPS = ("the", "of", "and", "a")


def _cfg(**kw):
    return BuildConfig(
        num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en",
        stopwords=STOPS, **kw,
    )


@pytest.fixture(scope="module")
def stop_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("stop")
    src = str(root / "pages.parquet")
    t = generate_pages_table(200, seed=13)
    pq.write_table(t, src, row_group_size=64)
    idx = str(root / "idx")
    build_index(src, idx, _cfg())
    return idx, t


def _filtered_corpus(t):
    """(ids, texts) with stop TOKENS removed — token-level surgery so
    the pinned tokenizer sees the same surviving stream the index
    stores (plain text replace would break on substrings)."""
    from zensearch_ray.functions.text import tokenize

    ids, texts = [], []
    for i, (tx, lg) in enumerate(
        zip(t["text"].to_pylist(), t["lang"].to_pylist())
    ):
        if lg != "en":
            continue
        kept = [w for w in tokenize(tx) if w not in STOPS]
        ids.append(i)
        texts.append(" ".join(kept))
    return ids, texts


def test_stop_terms_have_no_postings_and_short_dl(stop_index):
    engine = QueryEngine(stop_index[0])
    for s in STOPS:
        assert engine.lookup(s) is None, s
    assert not set(STOPS) & set(engine._all_terms())


def test_scoring_matches_filtered_referee(stop_index):
    idx, t = stop_index
    engine = QueryEngine(idx)
    oracle = BM25Oracle(*_filtered_corpus(t))
    assert engine.n_docs == oracle.n_docs
    assert engine.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    for q in ["search engine ranking", "the search engine", "data of the web"]:
        got = engine.topk(q, 10)
        want = oracle.topk(q, 10)
        assert got == want, q
        # stopword-only query is inert on both sides
    assert engine.topk("the of and", 10) == []
    # pruned path agrees too (block-max bounds built from filtered dls)
    assert engine.topk_pruned("search engine ranking", 10) == engine.topk(
        "search engine ranking", 10
    )


def test_fingerprint_isolates_stopword_builds(stop_index, tmp_path):
    idx, t = stop_index
    src = str(tmp_path / "more.parquet")
    pq.write_table(generate_pages_table(50, seed=14), src)
    with pytest.raises(ValueError, match="fingerprint"):
        build_index(
            src, idx,
            BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en"),
            append=True,
        )


def test_stopwords_incompatible_with_positions(tmp_path):
    src = str(tmp_path / "p.parquet")
    pq.write_table(generate_pages_table(10, seed=15), src)
    with pytest.raises(ValueError, match="positional"):
        build_index(src, str(tmp_path / "i"), _cfg(positions=True))


def test_manifest_records_stopwords(stop_index):
    from zensearch_ray.state.manifest import IndexLayout

    manifest = IndexLayout(stop_index[0]).read_manifest()
    assert manifest["stopwords"] == sorted(STOPS)
