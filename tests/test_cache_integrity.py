"""Shared-cache integrity: ``_locked_build`` must validate a
complete-LOOKING cache before reusing it and rebuild a poisoned one
under the lock (the round-2 ``tfidf_topk`` red-cell class — a cache
corrupted before the build mutex landed, or truncated by any non-repo
writer, passes ``is_complete()`` forever)."""

from __future__ import annotations

import json
import os

import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.corpus import (
    _VALIDATED_CACHES,
    _cache_valid,
    _locked_build,
)
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.state.manifest import IndexLayout

CFG = BuildConfig(num_shards=2, salt_subs=1, heavy_df_threshold=60, lang="en")


@pytest.fixture()
def cache_dir(ray_session, pages_small, tmp_path):
    d = str(tmp_path / "idx_cache")
    calls = []

    def build_fn():
        calls.append(1)
        build_index(pages_small, d, CFG)

    _locked_build(d, build_fn)
    assert calls == [1]
    _VALIDATED_CACHES.discard(d)  # simulate a NEW process reusing it
    return d, build_fn, calls


def _first_segment(d: str) -> str:
    layout = IndexLayout(d)
    for m in layout.committed_parts_all_gens():
        return layout.posting_path(int(m["part"]), int(m.get("gen", 0)))
    raise AssertionError("no committed partitions")


def test_clean_cache_reused_without_rebuild(cache_dir):
    d, build_fn, calls = cache_dir
    _locked_build(d, build_fn)
    assert calls == [1]  # validated and reused, not rebuilt
    assert d in _VALIDATED_CACHES  # memoised for this process
    _locked_build(d, build_fn)
    assert calls == [1]


def test_truncated_segment_triggers_rebuild(cache_dir):
    d, build_fn, calls = cache_dir
    seg = _first_segment(d)
    os.remove(seg)  # manifest still present → is_complete() == True
    assert IndexLayout(d).is_complete()
    assert not _cache_valid(d, None)
    _locked_build(d, build_fn)
    assert calls == [1, 1]  # poisoned cache torn down and rebuilt
    assert os.path.exists(seg)
    assert len(QueryEngine(d).topk("search engine", k=3)) > 0


def test_wrong_docmeta_rowcount_triggers_rebuild(cache_dir):
    d, build_fn, calls = cache_dir
    layout = IndexLayout(d)
    victim = next(
        os.path.join(base, f)
        for base, _dirs, files in os.walk(layout.docmeta_dir)
        for f in files
        if f.endswith(".parquet")
    )
    os.remove(victim)  # docmeta rows != n_docs, segments intact
    assert not _cache_valid(d, None)
    _locked_build(d, build_fn)
    assert calls == [1, 1]


def test_config_fingerprint_pins_cache_contents(cache_dir):
    d, build_fn, calls = cache_dir
    # internally consistent cache, but built with a DIFFERENT config
    # than the caller expects → must not be served
    manifest = IndexLayout(d).read_manifest()
    assert _cache_valid(d, manifest["config_fp"])
    assert not _cache_valid(d, "not-the-config-you-built-with")
    _locked_build(d, build_fn, expect_fp="not-the-config-you-built-with")
    assert calls == [1, 1]  # rebuilt (build_fn's cfg wins; the caller
    # pins the fp of the cfg it passes, so in production they agree)


def test_garbage_manifest_triggers_rebuild(cache_dir):
    d, build_fn, calls = cache_dir
    with open(IndexLayout(d).manifest_path, "w") as f:
        json.dump({"n_docs": 999999, "config_fp": "zzz"}, f)
    assert not _cache_valid(d, None)
    _locked_build(d, build_fn)
    assert calls == [1, 1]
    assert len(QueryEngine(d).topk("search engine", k=3)) > 0
