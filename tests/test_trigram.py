"""Character-trigram sidecars (infix/substring search index): written
per segment at commit, read with parquet ``tri IN (...)`` pushdown by
``QueryEngine.expand_infix`` and the leading-'*' wildcard path. Covers
sidecar content validity, trigram-vs-vocab-scan result identity, the
no-vocab-scan property, pre-trigram fallback, short-substring fallback,
and fsck's partial-sidecar-set detection."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.state.manifest import IndexLayout


@pytest.fixture(scope="module")
def tri_index(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("triidx"))
    build_index(
        pages_small,
        index_dir,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en"),
    )
    return index_dir


def test_sidecar_rows_valid(tri_index):
    layout = IndexLayout(tri_index)
    segs = sorted(glob.glob(os.path.join(layout.postings_dir, "part=*.parquet")))
    assert segs
    for seg in segs:
        side = layout.trigram_path_for(seg)
        assert os.path.exists(side), f"missing trigram sidecar for {seg}"
        t = pq.read_table(side)
        tris = t["tri"].to_pylist()
        terms = t["term"].to_pylist()
        assert tris == sorted(tris), "sidecar must be sorted by tri"
        assert all(len(g) == 3 and g in w for g, w in zip(tris, terms))
        # exactly the segment's >=3-char terms appear
        seg_terms = set(pq.read_table(seg, columns=["term"])["term"].to_pylist())
        assert set(terms) == {w for w in seg_terms if len(w) >= 3}


def test_infix_matches_vocab_scan(tri_index):
    eng = QueryEngine(tri_index)
    vocab = eng._all_terms()
    for sub in ["ing", "tion", "ear", "arch", "xyzzy"]:
        want = [t for t in vocab if sub in t]
        assert eng.expand_infix(sub) == want


def test_wildcard_uses_trigrams_not_vocab(tri_index):
    eng = QueryEngine(tri_index)
    # pick an inner substring guaranteed present in the vocabulary
    seed = next(t for t in eng._all_terms() if len(t) >= 5)[1:4]
    pattern = f"*{seed}*"
    expected = eng.expand_wildcard(pattern)
    assert expected  # non-trivial expansion by construction
    fresh = QueryEngine(tri_index)

    def boom():
        raise AssertionError("vocab scan used despite trigram sidecar")

    fresh._all_terms = boom
    assert fresh.expand_wildcard(pattern) == expected


def test_pre_trigram_index_falls_back(tri_index, tmp_path):
    copy = str(tmp_path / "notri")
    shutil.copytree(tri_index, copy)
    shutil.rmtree(os.path.join(copy, "trigram"))
    with_tri = QueryEngine(tri_index)
    without = QueryEngine(copy)
    assert without._trigram_files() is None
    assert without.expand_infix("ing") == with_tri.expand_infix("ing")
    assert without.expand_wildcard("*tion*") == with_tri.expand_wildcard("*tion*")


def test_short_substring_falls_back(tri_index):
    eng = QueryEngine(tri_index)
    vocab = eng._all_terms()
    assert eng.expand_infix("th", max_terms=100000) == [
        t for t in vocab if "th" in t
    ]


def test_fsck_flags_partial_trigram_set(tri_index, tmp_path, ray_session):
    from zensearch_ray.pipelines.fsck import fsck_index

    copy = str(tmp_path / "holetri")
    shutil.copytree(tri_index, copy)
    side = sorted(glob.glob(os.path.join(copy, "trigram", "part=*.parquet")))[0]
    os.remove(side)
    report = fsck_index(copy, deep=True)
    assert any("trigram sidecar missing" in e for e in report["errors"])
    # absent dir entirely is legal (pre-trigram index)
    shutil.rmtree(os.path.join(copy, "trigram"))
    report2 = fsck_index(copy, deep=True)
    assert not any("trigram" in e for e in report2["errors"])
