"""Term-dictionary sidecars: per-segment sorted-unique term files written
at commit (``IndexLayout._write_termdict``) so prefix / wildcard / fuzzy
/ suggest expansion is metadata-only — posting segments are never opened.
Covers: sidecar presence + content parity with the segment term column,
reader fallback equivalence when sidecars are absent, and append
generations publishing their own sidecars."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.state.manifest import IndexLayout


@pytest.fixture(scope="module")
def dict_index(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("dictidx"))
    build_index(
        pages_small,
        index_dir,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en"),
    )
    return index_dir


def test_sidecar_per_segment_sorted_unique(dict_index):
    layout = IndexLayout(dict_index)
    segs = sorted(glob.glob(os.path.join(layout.postings_dir, "part=*.parquet")))
    assert segs
    for seg in segs:
        side = layout.dict_path_for(seg)
        assert os.path.exists(side), f"missing sidecar for {seg}"
        dict_terms = pq.read_table(side, columns=["term"])["term"].to_pylist()
        seg_terms = pq.read_table(seg, columns=["term"])["term"].to_pylist()
        assert dict_terms == sorted(set(seg_terms))
        # metadata-scale: the sidecar is strictly smaller than its segment
        assert os.path.getsize(side) < os.path.getsize(seg)


def test_fallback_equivalence_without_sidecars(dict_index, tmp_path):
    copy = str(tmp_path / "nodict")
    shutil.copytree(dict_index, copy)
    shutil.rmtree(os.path.join(copy, "termdict"))
    with_side = QueryEngine(dict_index)
    without = QueryEngine(copy)
    assert without.expand_prefix("th") == with_side.expand_prefix("th")
    assert without.expand_wildcard("*ing") == with_side.expand_wildcard("*ing")
    assert without._all_terms() == with_side._all_terms()
    assert with_side.topk_prefix("se", k=10) == without.topk_prefix("se", k=10)


def test_append_generation_gets_sidecar(dict_index, pages_small, tmp_path, ray_session):
    copy = str(tmp_path / "appidx")
    shutil.copytree(dict_index, copy)
    from zensearch_ray.sources.pages import generate_pages_parquet

    extra = str(tmp_path / "extra.parquet")
    generate_pages_parquet(extra, n_rows=60, seed=99)
    build_index(
        extra,
        copy,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en"),
        append=True,
    )
    layout = IndexLayout(copy)
    gen_segs = glob.glob(os.path.join(layout.postings_dir, "part=*.g1.parquet"))
    assert gen_segs, "append produced no generation-1 segments"
    for seg in gen_segs:
        assert os.path.exists(layout.dict_path_for(seg))
