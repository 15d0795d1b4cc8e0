"""Checkpoint/resume equivalence (FIXTURES.md §5, north_rule lineage).

An interrupted build (only a strict subset of partitions committed)
resumed afterwards must produce identical query results and identical
per-partition content vs an uninterrupted build.
"""

import json
import os

import pyarrow.parquet as pq

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.state.manifest import IndexLayout


def _cfg():
    return BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")


def test_resume_equivalence(ray_session, pages_small, tmp_path):
    full_dir = str(tmp_path / "full")
    resumed_dir = str(tmp_path / "resumed")

    build_index(pages_small, full_dir, _cfg())

    # simulate an interrupted build: run fully, then delete a strict
    # subset of committed partitions (their segment + manifest), and the
    # global manifest — exactly the state after a mid-shuffle crash
    build_index(pages_small, resumed_dir, _cfg())
    layout = IndexLayout(resumed_dir)
    parts = sorted(layout.committed_parts().keys())
    assert len(parts) >= 3
    killed = parts[:: 2]  # drop every other partition
    for p in killed:
        os.remove(layout.posting_path(p))
        os.remove(layout.part_manifest_path(p))
    os.remove(layout.manifest_path)

    manifest2 = build_index(pages_small, resumed_dir, _cfg())
    # resume must rebuild ONLY the killed partitions
    assert manifest2["n_partitions_built_this_run"] == len(killed)
    assert sorted(layout.committed_parts().keys()) == parts

    # logical index content identical to the uninterrupted build
    full_layout = IndexLayout(full_dir)
    for p in parts:
        a = pq.read_table(full_layout.posting_path(p)).sort_by("term")
        b = pq.read_table(layout.posting_path(p)).sort_by("term")
        assert a.equals(b), f"partition {p} differs after resume"

    # identical query results
    e1, e2 = QueryEngine(full_dir), QueryEngine(resumed_dir)
    for q in ["search engine", "the of and", "café", "posting shard"]:
        assert e1.topk(q, 10) == e2.topk(q, 10)


def test_partition_manifests_carry_metrics(ray_session, pages_small, tmp_path):
    index_dir = str(tmp_path / "idx")
    build_index(pages_small, index_dir, _cfg())
    layout = IndexLayout(index_dir)
    for part, m in layout.committed_parts().items():
        assert m["n_postings"] > 0
        assert m["posting_bytes"] > 0
        assert "build_sec" in m and "postings_per_sec" in m
    with open(layout.manifest_path) as f:
        g = json.load(f)
    assert g["docs_per_sec"] is not None
    assert g["total_posting_bytes"] == sum(
        m["posting_bytes"] for m in layout.committed_parts().values()
    )


def test_resume_with_different_config_refused(ray_session, pages_small, tmp_path):
    """Resuming into an index_dir built under a different config must
    raise, not silently mix incompatibly-sharded partitions (r1 ADVICE)."""
    import pytest

    index_dir = str(tmp_path / "idx_fp")
    build_index(pages_small, index_dir, _cfg())
    other = BuildConfig(num_shards=8, salt_subs=2, heavy_df_threshold=60, lang="en")
    with pytest.raises(ValueError, match="config"):
        build_index(pages_small, index_dir, other)


def test_empty_corpus_build(ray_session, pages_small, tmp_path):
    """A filter that matches nothing must produce a valid empty index
    and empty query results, not a crash."""
    index_dir = str(tmp_path / "empty_idx")
    cfg = BuildConfig(num_shards=4, salt_subs=2, lang="xx-no-such-lang")
    manifest = build_index(pages_small, index_dir, cfg)
    assert manifest["n_docs"] == 0
    assert manifest["total_postings"] == 0
    engine = QueryEngine(index_dir)
    assert engine.topk("anything", 10) == []
    assert engine.topk_and("anything", 10) == []
