"""Index append (generation) semantics: build half the corpus, append
the rest — results must be rank-identical to a one-shot build over the
union (VERDICT r1 item 6 'done' criterion), across all three query
strategies; an interrupted append must resume to the same state."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.state.manifest import IndexLayout

QUERIES = [
    "search engine ranking",
    "the of and",
    "café straße naïve",
    "posting shard delta varint",
    "the",
]


def _cfg():
    return BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("split")
    t = generate_pages_table(300, seed=11)
    a = str(root / "src_a.parquet")
    b = str(root / "src_b.parquet")
    pq.write_table(t.slice(0, 150), a, row_group_size=64)
    pq.write_table(t.slice(150, 150), b, row_group_size=64)
    return a, b


def test_append_rank_identical_to_oneshot(ray_session, split_corpus, tmp_path):
    a, b = split_corpus
    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")

    m_full = build_index([a, b], full_dir, _cfg())
    build_index(a, inc_dir, _cfg())
    m_inc = build_index(b, inc_dir, _cfg(), append=True)

    assert m_inc["n_docs"] == m_full["n_docs"]
    assert m_inc["avgdl"] == pytest.approx(m_full["avgdl"], rel=1e-12)
    assert m_inc["n_generations"] == 2
    assert m_inc["id_ceiling"] == m_full["id_ceiling"]

    e_full, e_inc = QueryEngine(full_dir), QueryEngine(inc_dir)
    for term in ["the", "search", "café"]:
        assert e_inc.df(term) == e_full.df(term), term
    for q in QUERIES:
        want = e_full.topk(q, 10)
        assert e_inc.topk(q, 10) == want, f"topk differs for {q!r}"
        got_p = e_inc.topk_pruned(q, 10)
        assert [d for d, _ in got_p] == [d for d, _ in want], f"pruned {q!r}"
        np.testing.assert_allclose(
            [s for _, s in got_p], [s for _, s in want], rtol=1e-9, err_msg=q
        )
        assert e_inc.topk_and(q, 10) == e_full.topk_and(q, 10), f"and {q!r}"
    # docmeta covers both generations (title/url resolution spans appends)
    rows = e_inc.topk_docs("search engine", k=5)
    assert rows and all(r["url"] for r in rows)


def test_append_resume_after_partial_commit(ray_session, split_corpus, tmp_path):
    a, b = split_corpus
    idx = str(tmp_path / "resumable")
    pre_append_manifest = build_index(a, idx, _cfg())
    build_index(b, idx, _cfg(), append=True)
    layout = IndexLayout(idx)
    gen1 = sorted(layout.committed_parts(1).keys())
    assert gen1
    snapshot = {p: open(layout.posting_path(p, 1), "rb").read() for p in gen1}

    # simulate a crash MID-append: drop half of generation 1's
    # partitions and restore the pre-append global manifest (the real
    # crash window — the global manifest is written last)
    killed = gen1[::2]
    for p in killed:
        os.remove(layout.posting_path(p, 1))
        os.remove(layout.part_manifest_path(p, 1))
    layout.write_manifest(pre_append_manifest)

    m = build_index(b, idx, _cfg(), append=True)
    assert m["n_partitions_built_this_run"] == len(killed)
    assert sorted(layout.committed_parts(1).keys()) == gen1
    for p in gen1:
        assert open(layout.posting_path(p, 1), "rb").read() == snapshot[p], p


def test_append_wrong_config_refused(ray_session, split_corpus, tmp_path):
    a, b = split_corpus
    idx = str(tmp_path / "fp")
    build_index(a, idx, _cfg())
    other = BuildConfig(num_shards=8, salt_subs=2, heavy_df_threshold=60, lang="en")
    with pytest.raises(ValueError, match="config"):
        build_index(b, idx, other, append=True)
