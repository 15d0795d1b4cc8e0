"""Analyzer reindex (postings-only migration) ≡ a from-corpus build
with the same analyzer config — the whole point of the operator:
decoded postings, corpus stats and query results must be EQUAL, and
the corpus text must never be read."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.pipelines.reindex import reindex_analyzer
from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.state.manifest import IndexLayout

QUERIES = [
    "search engine ranking",
    "the of and",
    "café straße naïve",
    "posting shard delta varint",
]


def _cfg(**kw):
    base = dict(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    base.update(kw)
    return BuildConfig(**base)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("reindex_src")
    t = generate_pages_table(250, seed=7)
    p = str(root / "pages.parquet")
    pq.write_table(t, p, row_group_size=64)
    return p


@pytest.fixture(scope="module")
def plain_index(ray_session, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "plain")
    build_index(corpus, d, _cfg())
    return d


def _postings_df(index_dir):
    from zensearch_ray.pipelines.export import dump_postings

    df = dump_postings(index_dir).to_pandas()
    return df.sort_values(["term", "doc_id"], ignore_index=True)


def _assert_equivalent(direct_dir, reindexed_dir):
    md = IndexLayout(direct_dir).read_manifest()
    mr = IndexLayout(reindexed_dir).read_manifest()
    for k in ("n_docs", "sum_dl", "avgdl", "total_postings", "stopwords",
              "stem", "synonyms", "id_mode"):
        assert mr[k] == md[k], (k, mr[k], md[k])
    pd.testing.assert_frame_equal(
        _postings_df(reindexed_dir), _postings_df(direct_dir)
    )
    ed, er = QueryEngine(direct_dir), QueryEngine(reindexed_dir)
    for q in QUERIES:
        assert er.topk(q, 10) == ed.topk(q, 10), q
        assert er.topk_pruned(q, 10) == ed.topk_pruned(q, 10), q


def test_reindex_stem_equivalent(ray_session, corpus, plain_index, tmp_path):
    cfg = _cfg(stem=True)
    direct = str(tmp_path / "direct_stem")
    build_index(corpus, direct, cfg)
    re_d = str(tmp_path / "re_stem")
    man = reindex_analyzer(plain_index, re_d, cfg)
    assert man["reindexed_from"] == plain_index
    _assert_equivalent(direct, re_d)


def test_reindex_stopwords_equivalent(ray_session, corpus, plain_index, tmp_path):
    # stopwords change doc_len/avgdl — the hard case (Lucene StopFilter
    # semantics must fall out of the tf sums, including docs whose
    # every token is stopped)
    cfg = _cfg(stopwords=("the", "of", "and", "a", "to"))
    direct = str(tmp_path / "direct_stop")
    build_index(corpus, direct, cfg)
    re_d = str(tmp_path / "re_stop")
    reindex_analyzer(plain_index, re_d, cfg)
    _assert_equivalent(direct, re_d)
    # the analyzer must have actually changed the corpus stats
    assert (
        IndexLayout(re_d).read_manifest()["sum_dl"]
        < IndexLayout(plain_index).read_manifest()["sum_dl"]
    )


def test_reindex_synonyms_plus_stem_equivalent(
    ray_session, corpus, plain_index, tmp_path
):
    cfg = _cfg(stem=True, synonyms=(("crawler", "crawl"), ("indexes", "index")))
    direct = str(tmp_path / "direct_syn")
    build_index(corpus, direct, cfg)
    re_d = str(tmp_path / "re_syn")
    reindex_analyzer(plain_index, re_d, cfg)
    _assert_equivalent(direct, re_d)


def test_reindex_stopwords_plus_synonyms_equivalent(
    ray_session, corpus, plain_index, tmp_path
):
    # The one composition where an analyzer-ORDER divergence between
    # reindex's _analyzer_map (stop→syn→stem) and the from-corpus
    # TokenizeStage would surface: a synonym SOURCE that is a stopword
    # ("the"→"search" must never fire: the stop filter runs first) and a
    # synonym TARGET that is a stopword ("engine"→"to" must SURVIVE:
    # synonyms run after the stop filter, so the produced "to" stays).
    cfg = _cfg(
        stem=True,
        stopwords=("the", "of", "and", "a", "to"),
        synonyms=(("the", "search"), ("engine", "to"), ("indexes", "index")),
    )
    direct = str(tmp_path / "direct_stop_syn")
    build_index(corpus, direct, cfg)
    re_d = str(tmp_path / "re_stop_syn")
    reindex_analyzer(plain_index, re_d, cfg)
    _assert_equivalent(direct, re_d)
    # the stopworded source synonym must not have resurrected "the"
    assert QueryEngine(re_d).topk("the", 10) == QueryEngine(direct).topk(
        "the", 10
    )


def test_reindex_guards(ray_session, plain_index, tmp_path):
    with pytest.raises(ValueError, match="no analyzer"):
        reindex_analyzer(plain_index, str(tmp_path / "x1"), _cfg())
    with pytest.raises(ValueError, match="no positions"):
        # a positional target cannot be derived from a positionless src
        reindex_analyzer(
            plain_index, str(tmp_path / "x2"), _cfg(stem=True, positions=True)
        )
    with pytest.raises(ValueError, match="title_boost"):
        reindex_analyzer(
            plain_index, str(tmp_path / "x3"), _cfg(stem=True, title_boost=2)
        )


@pytest.fixture(scope="module")
def positional_index(ray_session, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "plain_pos")
    build_index(corpus, d, _cfg(positions=True))
    return d


def test_reindex_positional_stem_equivalent(
    ray_session, corpus, positional_index, tmp_path
):
    """Positional migration: merged position lists must reproduce the
    from-corpus positional stem build exactly — including PHRASE
    queries, the whole reason positions exist."""
    cfg = _cfg(stem=True, positions=True)
    direct = str(tmp_path / "direct_pos_stem")
    build_index(corpus, direct, cfg)
    re_d = str(tmp_path / "re_pos_stem")
    reindex_analyzer(positional_index, re_d, cfg)
    _assert_equivalent(direct, re_d)
    from zensearch_ray.pipelines.export import dump_postings

    dp = dump_postings(direct, positions=True).to_pandas()
    rp = dump_postings(re_d, positions=True).to_pandas()
    dp["pos"] = dp["pos"].map(tuple)
    rp["pos"] = rp["pos"].map(tuple)
    pd.testing.assert_frame_equal(
        rp.sort_values(["term", "doc_id"], ignore_index=True),
        dp.sort_values(["term", "doc_id"], ignore_index=True),
    )
    ed, er = QueryEngine(direct), QueryEngine(re_d)
    for q in ["search engine", "the of", "posting shard"]:
        assert er.topk_phrase(q, 10) == ed.topk_phrase(q, 10), q


def test_reindex_positional_downgrade(
    ray_session, corpus, positional_index, tmp_path
):
    # a positional source reindexed WITHOUT positions ≡ the plain
    # (positionless) from-corpus stem build
    cfg = _cfg(stem=True)
    direct = str(tmp_path / "direct_stem_flat")
    build_index(corpus, direct, cfg)
    re_d = str(tmp_path / "re_stem_flat")
    reindex_analyzer(positional_index, re_d, cfg)
    _assert_equivalent(direct, re_d)
    with pytest.raises(ValueError, match="stopwords"):
        reindex_analyzer(
            positional_index, str(tmp_path / "x"),
            _cfg(positions=True, stopwords=("the",)),
        )


def test_reindex_refuses_analyzer_source(ray_session, corpus, tmp_path):
    src = str(tmp_path / "stemmed_src")
    build_index(corpus, src, _cfg(stem=True))
    with pytest.raises(ValueError, match="already carries an analyzer"):
        reindex_analyzer(src, str(tmp_path / "x"), _cfg(stopwords=("the",)))


def test_reindex_refuses_tombstoned_source(
    ray_session, corpus, plain_index, tmp_path
):
    import shutil

    src = str(tmp_path / "tombstoned")
    shutil.copytree(plain_index, src)
    IndexLayout(src).write_deletes(np.array([0], dtype=np.int64))
    with pytest.raises(ValueError, match="tombstones"):
        reindex_analyzer(src, str(tmp_path / "x"), _cfg(stem=True))


def test_reindex_appended_source_compacts(ray_session, corpus, tmp_path):
    """Reindexing a multi-generation (appended) source must cover every
    generation's postings and docmeta EXACTLY ONCE — equivalent to the
    from-corpus stem build over the union, in one gen-0 output."""
    import pyarrow.parquet as pq2

    t = pq.read_table(corpus)
    half_a = str(tmp_path / "a.parquet")
    half_b = str(tmp_path / "b.parquet")
    pq2.write_table(t.slice(0, 125), half_a, row_group_size=64)
    pq2.write_table(t.slice(125), half_b, row_group_size=64)
    src = str(tmp_path / "appended")
    build_index(half_a, src, _cfg())
    build_index(half_b, src, _cfg(), append=True)
    assert IndexLayout(src).read_manifest()["n_generations"] == 2

    cfg = _cfg(stem=True)
    direct = str(tmp_path / "direct_union_stem")
    build_index(corpus, direct, cfg)
    re_d = str(tmp_path / "re_appended")
    man = reindex_analyzer(src, re_d, cfg)
    assert man["n_generations"] == 1
    _assert_equivalent(direct, re_d)


def test_reindex_refuses_mismatched_resume(ray_session, plain_index, tmp_path):
    """A target dir holding artifacts from a DIFFERENT analyzer config
    must be refused, not silently mixed (the build_index resume guard,
    mirrored)."""
    d = str(tmp_path / "resume_mix")
    reindex_analyzer(plain_index, d, _cfg(stem=True))
    with pytest.raises(ValueError, match="docstats built under config"):
        reindex_analyzer(plain_index, d, _cfg(stopwords=("the",)))
    # same config: idempotent rerun (everything committed → no-op build)
    man = reindex_analyzer(plain_index, d, _cfg(stem=True))
    assert man["n_partitions_built_this_run"] == 0


def test_reindex_partial_crash_resume(ray_session, plain_index, tmp_path):
    """Interrupted reindex (strict subset of partitions committed)
    resumed afterwards == an uninterrupted reindex — partition-level
    lineage is shared with build_index and must hold here too."""
    import os

    cfg = _cfg(stem=True)
    full = str(tmp_path / "full")
    reindex_analyzer(plain_index, full, cfg)
    resumed = str(tmp_path / "resumed")
    reindex_analyzer(plain_index, resumed, cfg)
    layout = IndexLayout(resumed)
    parts = sorted(layout.committed_parts().keys())
    assert len(parts) >= 3
    killed = parts[::2]
    for p in killed:
        os.remove(layout.posting_path(p))
        os.remove(layout.part_manifest_path(p))
    os.remove(layout.manifest_path)

    man = reindex_analyzer(plain_index, resumed, cfg)
    assert man["n_partitions_built_this_run"] == len(killed)
    pd.testing.assert_frame_equal(_postings_df(resumed), _postings_df(full))


def test_cache_tokenized_flip_equivalent(ray_session, corpus, tmp_path):
    """cache_tokenized=False (the at-scale auto-flip target: recompute
    pass 2 instead of pinning the tokenized corpus) must produce a
    bit-identical index to the pinned path, and AUTO must record its
    decision in the manifest."""
    a = str(tmp_path / "pinned")
    b = str(tmp_path / "recompute")
    build_index(corpus, a, _cfg(cache_tokenized=True))
    build_index(corpus, b, _cfg(cache_tokenized=False))
    pd.testing.assert_frame_equal(_postings_df(a), _postings_df(b))
    ma = IndexLayout(a).read_manifest()
    mb = IndexLayout(b).read_manifest()
    for k in ("n_docs", "sum_dl", "avgdl", "total_postings"):
        assert ma[k] == mb[k]
    assert ma["cache_tokenized"] is True
    assert mb["cache_tokenized"] is False
    c = str(tmp_path / "auto")
    mc = build_index(corpus, c, _cfg(cache_tokenized=None))
    assert mc["cache_tokenized"] is True  # tiny corpus → pin
    pd.testing.assert_frame_equal(_postings_df(c), _postings_df(a))
