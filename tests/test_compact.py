"""Compaction semantics: build + append (2 generations) → compact →
the output must be a single-generation index whose partitions are
byte-identical to a one-shot build over the union corpus, and whose
query results are identical; a crashed compaction must resume."""

import os

import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.compact import compact_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.state.manifest import IndexLayout

QUERIES = ["search engine ranking", "the of and", "café straße naïve", "the"]


def _cfg():
    return BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("compact_src")
    t = generate_pages_table(300, seed=23)
    a = str(root / "src_a.parquet")
    b = str(root / "src_b.parquet")
    pq.write_table(t.slice(0, 150), a, row_group_size=64)
    pq.write_table(t.slice(150, 150), b, row_group_size=64)
    full = str(root / "full")
    appended = str(root / "appended")
    m_full = build_index([a, b], full, _cfg())
    build_index(a, appended, _cfg())
    m_app = build_index(b, appended, _cfg(), append=True)
    assert m_app["n_generations"] == 2
    return full, appended, m_full


def test_compact_matches_oneshot_build(ray_session, corpora, tmp_path):
    full, appended, m_full = corpora
    out = str(tmp_path / "compacted")
    m = compact_index(appended, out)

    assert m["n_generations"] == 1
    assert m["n_docs"] == m_full["n_docs"]
    assert m["total_postings"] == m_full["total_postings"]

    lay_out = IndexLayout(out)
    # no generation files in the output
    assert not [f for f in os.listdir(lay_out.postings_dir) if ".g" in f]

    e_out, e_full = QueryEngine(out), QueryEngine(full)
    # per-shard posting content identical (partition-level layout may
    # legitimately differ: salting depends on per-generation heavy sets)
    for term in ["the", "be", "search", "café"]:
        assert e_out.df(term) == e_full.df(term), term
    for q in QUERIES:
        want = e_full.topk(q, 10)
        assert e_out.topk(q, 10) == want, q
        assert [d for d, _ in e_out.topk_pruned(q, 10)] == [d for d, _ in want], q
    # docmeta consolidated across generations
    rows = e_out.topk_docs("search engine", k=5)
    assert rows and all(r["url"] for r in rows)


def test_compact_resumes_after_partial_commit(ray_session, corpora, tmp_path):
    _, appended, _ = corpora
    out = str(tmp_path / "resume_out")
    compact_index(appended, out)
    lay = IndexLayout(out)
    parts = sorted(lay.committed_parts())
    snapshot = {p: open(lay.posting_path(p), "rb").read() for p in parts}

    # simulate crash: drop half the output partitions + global manifest
    killed = parts[::2]
    for p in killed:
        os.remove(lay.posting_path(p))
        os.remove(lay.part_manifest_path(p))
    os.remove(lay.manifest_path)

    m = compact_index(appended, out)
    assert m["n_partitions_built_this_run"] == len(killed)
    for p in parts:
        assert open(lay.posting_path(p), "rb").read() == snapshot[p], p


def test_append_after_compact(ray_session, corpora, tmp_path_factory):
    """The full lifecycle: build → append → compact → append again —
    the compacted index must accept new generations."""
    root = tmp_path_factory.mktemp("lifecycle")
    _, appended, _ = corpora
    out = str(root / "compacted")
    compact_index(appended, out)

    extra = generate_pages_table(80, seed=99, row_offset=7000)
    src_c = str(root / "src_c.parquet")
    pq.write_table(extra, src_c, row_group_size=64)
    m = build_index(src_c, out, _cfg(), append=True)
    assert m["n_generations"] == 2
    e = QueryEngine(out)
    for q in QUERIES:
        assert len(e.topk(q, 10)) > 0
