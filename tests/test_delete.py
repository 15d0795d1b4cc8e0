"""Deletion lifecycle (pipelines/delete.py + the compact purge path):

  * tombstoned docs vanish from every query mode immediately, while
    surviving docs keep their EXACT pre-delete scores (Lucene
    stats-at-merge semantics: n_docs/avgdl/df stay stale until compact);
  * compact physically purges postings + docmeta and recomputes exact
    stats — results (url, score) identical to a one-shot build over the
    surviving corpus;
  * deletion is idempotent, validates id ranges, resolves urls via
    docmeta, and merge refuses tombstoned inputs.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.rounding import round6
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.compact import compact_index, merge_indexes
from zensearch_ray.pipelines.delete import delete_docs
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.state.manifest import IndexLayout

QUERIES = ["search engine ranking", "the of and", "data stream", "the"]


def _cfg(**kw):
    return BuildConfig(
        num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en", **kw
    )


@pytest.fixture(scope="module")
def deleted_index(ray_session, tmp_path_factory):
    """Built index + tombstones for the top-2 hits of QUERIES[0], plus
    the surviving-corpus parquet for rebuild comparisons."""
    root = tmp_path_factory.mktemp("delete_src")
    table = generate_pages_table(300, seed=31)
    src = str(root / "pages.parquet")
    pq.write_table(table, src, row_group_size=64)
    idx = str(root / "idx")
    build_index(src, idx, _cfg())

    engine = QueryEngine(idx)
    before = {q: engine.topk(q, 50) for q in QUERIES}
    victims = [d for d, _ in before[QUERIES[0]][:2]]
    summary = delete_docs(idx, doc_ids=victims)
    assert summary["n_newly_deleted"] == 2

    # surviving corpus = source rows minus the victims (dense doc_id ==
    # file row offset, single file → row index)
    keep = np.ones(table.num_rows, dtype=bool)
    keep[victims] = False
    survivors = str(root / "survivors.parquet")
    pq.write_table(table.filter(keep), survivors, row_group_size=64)
    return idx, before, victims, survivors


def test_delete_excludes_docs_scores_unchanged(deleted_index):
    idx, before, victims, _ = deleted_index
    engine = QueryEngine(idx)  # reopen: tombstones load at construction
    for q in QUERIES:
        want = [(d, s) for d, s in before[q] if d not in victims][:10]
        assert engine.topk(q, 10) == want, q
        # pruned is rank-preserving; scores may differ in the last ulp
        # (accumulation order), as elsewhere compare ranks
        assert [d for d, _ in engine.topk_pruned(q, 10)] == [d for d, _ in want], q
    # docs-resolved surface never shows a tombstoned doc
    rows = engine.topk_docs(QUERIES[0], k=10)
    assert victims[0] not in {r["doc_id"] for r in rows}


def test_delete_by_url_and_idempotence(deleted_index):
    idx, _, victims, _ = deleted_index
    layout = IndexLayout(idx)
    meta = pq.ParquetDataset(layout.docmeta_dir).read(columns=["doc_id", "url"])
    url_of = dict(zip(meta["doc_id"].to_pylist(), meta["url"].to_pylist()))
    # re-deleting an already-tombstoned doc via its url is a no-op
    s = delete_docs(idx, urls=[url_of[victims[0]], "https://nowhere.example/x"])
    assert s["n_newly_deleted"] == 0
    assert s["n_unmatched_urls"] == 1
    with pytest.raises(ValueError, match="out of range"):
        delete_docs(idx, doc_ids=[10**9])


def test_compact_purges_tombstones(deleted_index, tmp_path):
    idx, before, victims, survivors = deleted_index
    out = str(tmp_path / "purged")
    m = compact_index(idx, out)
    rebuilt = str(tmp_path / "rebuilt")
    m_ref = build_index(survivors, rebuilt, _cfg())

    assert m["n_docs"] == m_ref["n_docs"]
    assert m["sum_dl"] == m_ref["sum_dl"]
    assert abs(m["avgdl"] - m_ref["avgdl"]) < 1e-12
    assert m["total_postings"] == m_ref["total_postings"]
    assert "n_deleted" not in m
    lay = IndexLayout(out)
    assert len(lay.read_deletes()) == 0

    # (url, score) parity with the one-shot build over survivors —
    # dense doc_ids differ (row offsets shift), urls identify docs
    e_out, e_ref = QueryEngine(out), QueryEngine(rebuilt)
    for q in QUERIES:
        got = [(r["url"], round6(r["score"])) for r in e_out.topk_docs(q, k=10)]
        want = [(r["url"], round6(r["score"])) for r in e_ref.topk_docs(q, k=10)]
        assert got == want, q
    # stale df purged to live counts
    tok = "the"
    assert e_out.df(tok) == e_ref.df(tok)
    # docmeta no longer carries the victims
    meta = pq.ParquetDataset(lay.docmeta_dir).read(columns=["doc_id"])
    assert not set(victims) & set(meta["doc_id"].to_pylist())


def test_positional_modes_respect_tombstones(ray_session, tmp_path):
    from zensearch_ray.functions.text import tokenize

    table = generate_pages_table(200, seed=77)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(table, src, row_group_size=64)
    idx = str(tmp_path / "idx_pos")
    build_index(src, idx, _cfg(positions=True))
    engine = QueryEngine(idx)
    # a phrase guaranteed present: the first two tokens of an indexed doc
    meta = pq.ParquetDataset(IndexLayout(idx).docmeta_dir).read(columns=["doc_id"])
    some_id = int(meta["doc_id"][0].as_py())
    phrase = " ".join(tokenize(table["text"][some_id].as_py())[:2])
    hits = engine.topk_phrase(phrase, k=1 << 30)
    assert hits
    victim = hits[0][0]
    delete_docs(idx, doc_ids=[victim])
    engine2 = QueryEngine(idx)
    assert victim not in {d for d, _ in engine2.topk_phrase(phrase, k=1 << 30)}
    assert victim not in {d for d, _ in engine2.topk_near(phrase, 4, 1 << 30)}
    assert victim not in {d for d, _ in engine2.topk_and(phrase, 1 << 30)}
    # surviving phrase hits keep their scores
    want = [(d, s) for d, s in hits if d != victim]
    assert engine2.topk_phrase(phrase, k=1 << 30) == want


def test_merge_refuses_tombstoned_inputs(deleted_index, tmp_path):
    idx, _, _, survivors = deleted_index
    other = str(tmp_path / "other")
    build_index(survivors, other, _cfg())
    with pytest.raises(ValueError, match="tombstones"):
        merge_indexes(idx, other, str(tmp_path / "merged"))
