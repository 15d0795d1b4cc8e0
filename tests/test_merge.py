"""Cross-index merge semantics: two INDEPENDENTLY built indexes over
disjoint corpus halves, merged, must answer queries identically to a
one-shot build over the union corpus (scores exact — the merge
re-encodes under the exact union avgdl); merge must resume after a
partial crash and refuse mismatched configs."""

import os

import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.compact import merge_indexes
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.state.manifest import IndexLayout

QUERIES = ["search engine ranking", "the of and", "café straße naïve", "the"]


def _cfg(**kw):
    base = dict(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    base.update(kw)
    return BuildConfig(**base)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("merge_src")
    t = generate_pages_table(300, seed=31)
    a = str(root / "src_a.parquet")
    b = str(root / "src_b.parquet")
    pq.write_table(t.slice(0, 150), a, row_group_size=64)
    pq.write_table(t.slice(150, 150), b, row_group_size=64)
    full = str(root / "full")
    idx_a = str(root / "idx_a")
    idx_b = str(root / "idx_b")
    m_full = build_index([a, b], full, _cfg())
    m_a = build_index(a, idx_a, _cfg())
    m_b = build_index(b, idx_b, _cfg())
    return full, idx_a, idx_b, m_full, m_a, m_b


def test_merge_matches_oneshot_build(ray_session, built, tmp_path):
    full, idx_a, idx_b, m_full, m_a, m_b = built
    out = str(tmp_path / "merged")
    m = merge_indexes(idx_a, idx_b, out)

    assert m["n_generations"] == 1
    assert m["n_docs"] == m_full["n_docs"] == m_a["n_docs"] + m_b["n_docs"]
    assert m["total_postings"] == m_full["total_postings"]
    assert m["id_ceiling"] == m_a["id_ceiling"] + m_b["id_ceiling"]
    assert abs(m["avgdl"] - m_full["avgdl"]) < 1e-9

    e_out, e_full = QueryEngine(out), QueryEngine(full)
    for term in ["the", "be", "search", "café"]:
        assert e_out.df(term) == e_full.df(term), term
    for q in QUERIES:
        want = e_full.topk(q, 10)
        # dense ids relocate by file offset in both paths → exact
        # (doc_id, score) identity, not just rank identity
        assert e_out.topk(q, 10) == want, q
        assert [d for d, _ in e_out.topk_pruned(q, 10)] == [d for d, _ in want], q
    # docmeta consolidated: every result row resolves url/title
    rows = e_out.topk_docs("search engine", k=5)
    assert rows and all(r["url"] for r in rows)
    want_rows = e_full.topk_docs("search engine", k=5)
    assert [(r["url"], r["score"]) for r in rows] == [
        (r["url"], r["score"]) for r in want_rows
    ]


def test_merge_positional_phrase_parity(ray_session, tmp_path):
    t = generate_pages_table(200, seed=37)
    a = str(tmp_path / "pa.parquet")
    b = str(tmp_path / "pb.parquet")
    pq.write_table(t.slice(0, 100), a, row_group_size=64)
    pq.write_table(t.slice(100, 100), b, row_group_size=64)
    cfg = _cfg(positions=True)
    full, idx_a, idx_b = (str(tmp_path / d) for d in ("pfull", "pia", "pib"))
    build_index([a, b], full, cfg)
    build_index(a, idx_a, cfg)
    build_index(b, idx_b, cfg)
    out = str(tmp_path / "pmerged")
    merge_indexes(idx_a, idx_b, out)
    e_out, e_full = QueryEngine(out), QueryEngine(full)
    for phrase in ["search engine", "the of"]:
        assert e_out.topk_phrase(phrase, 10) == e_full.topk_phrase(phrase, 10), phrase


def test_merge_resumes_after_partial_commit(ray_session, built, tmp_path):
    _, idx_a, idx_b, *_ = built
    out = str(tmp_path / "resume_out")
    merge_indexes(idx_a, idx_b, out)
    lay = IndexLayout(out)
    parts = sorted(lay.committed_parts())
    snapshot = {p: open(lay.posting_path(p), "rb").read() for p in parts}

    killed = parts[::2]
    for p in killed:
        os.remove(lay.posting_path(p))
        os.remove(lay.part_manifest_path(p))
    os.remove(lay.manifest_path)

    m = merge_indexes(idx_a, idx_b, out)
    assert m["n_partitions_built_this_run"] == len(killed)
    for p in parts:
        assert open(lay.posting_path(p), "rb").read() == snapshot[p], p


def test_merge_refuses_mismatched_config(ray_session, built, tmp_path):
    _, idx_a, idx_b, *_ = built
    other = str(tmp_path / "other")
    t = generate_pages_table(60, seed=41)
    src = str(tmp_path / "other_src.parquet")
    pq.write_table(t, src, row_group_size=64)
    build_index(src, other, _cfg(num_shards=8))
    with pytest.raises(ValueError, match="fingerprint"):
        merge_indexes(idx_a, other, str(tmp_path / "bad"))
