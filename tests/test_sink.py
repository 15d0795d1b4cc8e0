"""Resumable partitioned sink: atomic per-partition commit, resume
skips finished partitions, converged output equals a one-shot write."""

import glob
import os

import duckdb
import pytest

from zensearch_ray.state.sink import completed_partitions, write_partitioned

N_PARTS = 16


def _events(sf_dir="/root/testdata/sf0.001"):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )


def _read_all(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    return duckdb.sql(
        f"SELECT * FROM read_parquet({files!r}) ORDER BY event_id"
    ).df()


def test_write_and_readback_complete(ray_session, tmp_path):
    out = str(tmp_path / "sink")
    stats = write_partitioned(_events(), out, "user_id", n_partitions=N_PARTS)
    assert stats["rows"] == 1000 and stats["skipped"] == 0
    assert completed_partitions(out) == set(range(stats["written"])) or len(
        completed_partitions(out)
    ) == stats["written"]
    df = _read_all(out)
    assert len(df) == 1000
    assert df["event_id"].is_unique


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    out = str(tmp_path / "resumable")
    write_partitioned(_events(), out, "user_id", n_partitions=N_PARTS)
    full = _read_all(out)
    done = sorted(completed_partitions(out))
    # simulate crash: drop a third of the partitions (data + marker)
    killed = done[::3]
    for p in killed:
        os.remove(os.path.join(out, f"part-{p:05d}.parquet"))
        os.remove(os.path.join(out, "_partitions", f"part-{p:05d}.json"))

    stats = write_partitioned(_events(), out, "user_id", n_partitions=N_PARTS)
    assert stats["written"] == len(killed)
    assert stats["skipped"] == len(done) - len(killed)
    assert _read_all(out).equals(full)


def test_skip_existing_false_rewrites(ray_session, tmp_path):
    out = str(tmp_path / "rewrite")
    write_partitioned(_events(), out, "user_id", n_partitions=N_PARTS)
    n = len(completed_partitions(out))
    stats = write_partitioned(
        _events(), out, "user_id", n_partitions=N_PARTS, skip_existing=False
    )
    assert stats["written"] == n and stats["skipped"] == 0


def test_string_keys_partition_stably(ray_session, tmp_path):
    import ray.data as rd

    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang"]
    )
    write_partitioned(docs, out1, "lang", n_partitions=8)
    write_partitioned(docs, out2, "lang", n_partitions=8)
    f1 = sorted(os.path.basename(f) for f in glob.glob(out1 + "/part-*.parquet"))
    f2 = sorted(os.path.basename(f) for f in glob.glob(out2 + "/part-*.parquet"))
    assert f1 == f2  # same keys land in the same partitions every run


def test_jsonl_format_roundtrip_and_resume(ray_session, tmp_path):
    import json

    out = str(tmp_path / "jsonl_sink")
    stats = write_partitioned(
        _events(), out, "user_id", n_partitions=N_PARTS, format="jsonl"
    )
    assert stats["rows"] == 1000
    files = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert files and not glob.glob(os.path.join(out, "*.tmp"))
    rows = [json.loads(l) for f in files for l in open(f)]
    assert len(rows) == 1000
    assert sorted(r["event_id"] for r in rows) == list(range(1000)) or len(
        {r["event_id"] for r in rows}
    ) == 1000
    # resume: drop one partition's data+marker, rerun rewrites only it
    victim = files[0]
    part = int(os.path.basename(victim).split("-")[1].split(".")[0])
    os.remove(victim)
    os.remove(os.path.join(out, "_partitions", f"part-{part:05d}.json"))
    stats2 = write_partitioned(
        _events(), out, "user_id", n_partitions=N_PARTS, format="jsonl"
    )
    assert stats2["written"] == 1
    rows2 = [
        json.loads(l)
        for f in sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
        for l in open(f)
    ]
    assert {r["event_id"] for r in rows2} == {r["event_id"] for r in rows}


def test_bad_format_rejected(ray_session, tmp_path):
    with pytest.raises(ValueError):
        write_partitioned(_events(), str(tmp_path / "x"), "user_id", format="csv")
