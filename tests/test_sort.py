"""Range-partitioned distributed sort: global order across partition
files, multiset preservation, exact balance, boundary-tie handling
(deterministic left-assignment vs spread), and nulls-last."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from zensearch_ray.pipelines.sort import (
    range_sorted_stats,
    sorted_export,
)


def _read_concat(out_dir: str, col: str) -> np.ndarray:
    files = sorted(glob.glob(f"{out_dir}/part_*.parquet"))
    assert files, "no partition files written"
    parts = [pq.read_table(f)[col].to_numpy(zero_copy_only=False) for f in files]
    return np.concatenate(parts)


def _assert_sorted_and_same_multiset(out_dir, col, vals):
    got = _read_concat(out_dir, col)
    nn = got[~pd.isna(got)]
    assert (np.diff(nn) >= 0).all(), "concatenated stream not globally sorted"
    np.testing.assert_array_equal(
        np.sort(got[~pd.isna(got)]), np.sort(vals[~pd.isna(vals)])
    )
    assert pd.isna(got).sum() == pd.isna(vals).sum()


def test_uniform_export_sorted_and_balanced(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1_000_000, size=20_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(8)
    out = str(tmp_path / "sorted")
    manifest = sorted_export(ds, "x", out, n_parts=8)
    assert list(manifest["part_id"]) == list(range(8))
    _assert_sorted_and_same_multiset(out, "x", vals)
    # exact-quantile pivots: every partition within one tie-run of N/P
    assert manifest["n_rows"].max() - manifest["n_rows"].min() <= 16


def test_stats_match_export(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 5_000, size=6_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(4)
    stats = range_sorted_stats(ds, "x", n_parts=4)
    assert int(stats["n_rows"].sum()) == len(vals)
    # partition key ranges must chain: max of part i <= min of part i+1
    assert (
        stats["max_v"].to_numpy()[:-1] <= stats["min_v"].to_numpy()[1:]
    ).all()


def test_heavy_ties_left_assignment_concentrates(ray_session, tmp_path):
    # one value = 60% of rows: deterministic assignment puts the run in
    # one partition (documented); spread_ties splits it
    vals = np.concatenate(
        [np.full(12_000, 42, dtype=np.int64),
         np.arange(8_000, dtype=np.int64) + 100]
    )
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(6)
    out = str(tmp_path / "tied")
    manifest = sorted_export(ds, "x", out, n_parts=4, spread_ties=True)
    _assert_sorted_and_same_multiset(out, "x", vals)
    # the 12k-row tie mass must NOT sit in a single partition
    assert manifest["n_rows"].max() < 12_000


def test_nulls_last(ray_session, tmp_path):
    vals = np.array([5.0, np.nan, 1.0, 3.0, np.nan, 2.0, 4.0])
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)}))
    out = str(tmp_path / "nulls")
    sorted_export(ds, "x", out, n_parts=2)
    got = _read_concat(out, "x")
    # all nulls at the very end of the concatenated stream
    n_null = int(pd.isna(got).sum())
    assert n_null == 2
    assert pd.isna(got[-n_null:]).all()
    assert (np.diff(got[:-n_null]) >= 0).all()


def test_single_partition(ray_session, tmp_path):
    vals = np.array([3, 1, 2], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": vals}))
    out = str(tmp_path / "one")
    manifest = sorted_export(ds, "x", out, n_parts=1)
    assert len(manifest) == 1
    _assert_sorted_and_same_multiset(out, "x", vals)


def test_export_resume_rewrites_only_missing(ray_session, tmp_path):
    import os

    rng = np.random.default_rng(41)
    vals = rng.integers(0, 100_000, size=8_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(6)
    out = str(tmp_path / "resumable")
    first = sorted_export(ds, "x", out, n_parts=6)
    assert len(first) == 6
    # simulate a crash: one partition's data + marker vanish
    victim = first["path"][2]
    pid = int(first["part_id"][2])
    os.remove(victim)
    os.remove(f"{out}/_partitions/part-{pid:05d}.json")
    second = sorted_export(ds, "x", out, n_parts=6)
    assert list(second["part_id"]) == [pid]  # only the hole rewritten
    _assert_sorted_and_same_multiset(out, "x", vals)
    # fully-committed rerun: zero new work, schema intact
    third = sorted_export(ds, "x", out, n_parts=6)
    assert len(third) == 0 and list(third.columns) == ["part_id", "n_rows", "path"]


def test_tiebreak_cols_global_lexicographic(ray_session, tmp_path):
    rng = np.random.default_rng(53)
    # coarse primary key (many ties) + fine tiebreak
    x = rng.integers(0, 20, size=5_000).astype(np.int64)
    y = rng.integers(0, 1_000_000, size=5_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(5)
    out = str(tmp_path / "lex")
    sorted_export(ds, "x", out, n_parts=4, tiebreak_cols=("y",))
    import glob
    files = sorted(glob.glob(f"{out}/part_*.parquet"))
    gx, gy = [], []
    for f in files:
        t = pq.read_table(f)
        gx.append(t["x"].to_numpy())
        gy.append(t["y"].to_numpy())
    gx, gy = np.concatenate(gx), np.concatenate(gy)
    key = gx.astype(np.int64) * 2_000_000 + gy
    assert (np.diff(key) >= 0).all(), "not globally lexicographically sorted"
    with pytest.raises(ValueError):
        sorted_export(ds, "x", str(tmp_path / "bad"), n_parts=4,
                      tiebreak_cols=("y",), spread_ties=True)


def test_spread_ties_resume_rejected(ray_session, tmp_path):
    # ADVICE r2: positional tie assignment is batch-dependent, so a
    # resume over committed partitions could duplicate/drop tie rows —
    # the export must refuse rather than corrupt
    import os

    vals = np.concatenate(
        [np.full(6_000, 7, dtype=np.int64), np.arange(4_000, dtype=np.int64) + 100]
    )
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(4)
    out = str(tmp_path / "spread_resume")
    first = sorted_export(ds, "x", out, n_parts=4, spread_ties=True)
    assert len(first) == 4
    # simulate a crash hole, then attempt to resume with spread_ties
    os.remove(first["path"][1])
    pid = int(first["part_id"][1])
    os.remove(f"{out}/_partitions/part-{pid:05d}.json")
    with pytest.raises(ValueError, match="spread_ties"):
        sorted_export(ds, "x", out, n_parts=4, spread_ties=True)
    # skip_existing=False restarts from scratch and is allowed
    redo = sorted_export(ds, "x", out, n_parts=4, spread_ties=True,
                         skip_existing=False)
    assert len(redo) == 4
    _assert_sorted_and_same_multiset(out, "x", vals)


def test_cli_sort_fully_resumed_reports_zero(ray_session, tmp_path, capsys):
    # ADVICE r2: the all-partitions-committed rerun used to crash on
    # int(NaN) from an empty manifest
    import json

    import pyarrow.parquet as pq

    from zensearch_ray.__main__ import main

    inp = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"x": np.arange(500, dtype=np.int64)}), inp)
    out = str(tmp_path / "cli_sorted")
    argv = ["sort", "--input", inp, "--col", "x",
            "--output", out, "--parts", "3"]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["parts"] == 3 and first["rows"] == 500
    assert main(argv) == 0  # rerun: everything committed already
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second == {"parts": 0, "rows": 0, "max_part_rows": 0}
