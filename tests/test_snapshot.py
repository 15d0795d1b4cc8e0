"""Snapshot/restore: a verified snapshot restores to a query-identical
index; corrupt layouts are refused at snapshot time; truncated copies
are refused at restore time; destinations are never clobbered."""

from __future__ import annotations

import json
import os

import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.pipelines.snapshot import (
    SNAP_MANIFEST,
    restore_index,
    snapshot_index,
)

QUERIES = ["search engine", "data stream", "web page"]


@pytest.fixture(scope="module")
def snap_index(ray_session, pages_small, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snap_idx") / "idx")
    build_index(
        pages_small, d,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60,
                    lang="en"),
    )
    return d


def test_snapshot_restore_query_identical(snap_index, tmp_path):
    snap = str(tmp_path / "snap")
    m = snapshot_index(snap_index, snap)
    assert m["n_files"] == len(m["files"]) > 0
    assert os.path.exists(os.path.join(snap, SNAP_MANIFEST))

    out = str(tmp_path / "restored")
    r = restore_index(snap, out)
    assert r["restored"] == out
    # no SNAPSHOT.json inside the restored index
    assert not os.path.exists(os.path.join(out, SNAP_MANIFEST))

    a, b = QueryEngine(snap_index), QueryEngine(out)
    for q in QUERIES:
        assert a.topk(q, 10) == b.topk(q, 10)


def test_snapshot_refuses_corrupt_index(snap_index, tmp_path):
    import shutil

    broken = str(tmp_path / "broken")
    shutil.copytree(snap_index, broken)
    # tear the layout: drop one committed partition manifest
    manis = sorted(
        os.path.join(broken, "_manifests", f)
        for f in os.listdir(os.path.join(broken, "_manifests"))
    )
    os.remove(manis[0])
    with pytest.raises(ValueError, match="fsck"):
        snapshot_index(broken, str(tmp_path / "snap2"))


def test_restore_refuses_truncated_snapshot(snap_index, tmp_path):
    snap = str(tmp_path / "snap3")
    snapshot_index(snap_index, snap)
    # truncate one posting file inside the snapshot
    m = json.load(open(os.path.join(snap, SNAP_MANIFEST)))
    victim = next(
        f["path"] for f in m["files"] if f["path"].endswith(".parquet")
    )
    vp = os.path.join(snap, victim)
    with open(vp, "r+b") as fh:
        fh.truncate(os.path.getsize(vp) // 2)
    with pytest.raises(ValueError, match="inventory"):
        restore_index(snap, str(tmp_path / "restored3"))


def test_destination_guards(snap_index, tmp_path):
    snap = str(tmp_path / "snap4")
    snapshot_index(snap_index, snap)
    with pytest.raises(ValueError, match="exists"):
        snapshot_index(snap_index, snap)  # snapshot dest exists
    occupied = tmp_path / "occupied"
    occupied.mkdir()
    (occupied / "x").write_text("y")
    with pytest.raises(ValueError, match="not empty"):
        restore_index(snap, str(occupied))
