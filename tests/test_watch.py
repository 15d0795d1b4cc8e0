"""Streaming ingest loop (pipelines/watch.py + CLI watch): committed
drop files become append generations, near-dups across deltas and
against the indexed base are dropped, warm serving replicas pick each
generation up via live reload, and the marker protocol makes every
cycle idempotent."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.__main__ import main
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.service import QueryService
from zensearch_ray.pipelines.watch import ingest_once, ingested_files, pending_files
from zensearch_ray.sources.pages import generate_pages_table


def _cfg():
    # reproducible from CLI flags (the watch CLI reconstructs the build
    # config the same way build --append does)
    return BuildConfig(num_shards=4, salt_subs=2, lang="en", sig_store=True)


def _pages(urls, texts):
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(
            [1_700_000_000_000_000 + i for i in range(n)],
            type=pa.timestamp("us"),
        ),
        "html": pa.array([b""] * n, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
    })


def _drop(drop_dir: str, name: str, tbl: pa.Table) -> None:
    """Producer contract: write tmp, rename into place."""
    tmp = os.path.join(drop_dir, name + ".tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(drop_dir, name))


FRESH_A = "aardwolf quokka numbat " * 8 + "uniquetokena"
FRESH_B = "axolotl capybara fossa " * 8 + "uniquetokenb"


def test_watch_two_deltas_live_reload(ray_session, tmp_path, capsys):
    base_tbl = generate_pages_table(120, seed=7)
    base = str(tmp_path / "base.parquet")
    pq.write_table(base_tbl, base)
    idx = str(tmp_path / "idx")
    build_index(base, idx, _cfg())
    drop = str(tmp_path / "drop")
    os.makedirs(drop)

    en_texts = base_tbl.filter(
        pa.compute.equal(base_tbl["lang"], "en")
    )["text"].to_pylist()
    near_base = "zzzchanged " + " ".join(en_texts[5].split(" ")[1:])

    with QueryService(idx, replicas=1, reload_secs=0.01) as svc:
        assert svc.search("uniquetokena") == []

        # ---- delta 1: one fresh doc + one near-dup of the base ----
        _drop(drop, "delta-001.parquet", _pages(
            ["https://d1.example.com/a", "https://d1.example.com/neardup"],
            [FRESH_A, near_base],
        ))
        # a producer's half-written file must be invisible
        with open(os.path.join(drop, "partial.parquet.tmp"), "wb") as f:
            f.write(b"garbage")
        assert pending_files(drop) == ["delta-001.parquet"]

        argv = ["watch", "--index", idx, "--drop", drop, "--once",
                "--near-dedup", "--dedup-threshold", "0.5",
                "--shards", "4", "--salt-subs", "2", "--sigstore"]
        assert main(argv) == 0
        lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
        assert lines[0]["file"] == "delta-001.parquet"
        assert lines[0]["dropped"] == 1  # the near-dup of the base

        svc.refresh()  # push form of the reload the poll would do
        hits = svc.search("uniquetokena")
        assert hits, "warm replica must see generation 1"
        assert svc.search("zzzchanged") == []  # near-dup never indexed

        # ---- delta 2: fresh doc + near-dup of DELTA 1's doc ----
        near_a = FRESH_A + " tail"
        _drop(drop, "delta-002.parquet", _pages(
            ["https://d2.example.com/b", "https://d2.example.com/neardup"],
            [FRESH_B, near_a],
        ))
        assert main(argv) == 0
        lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
        assert lines[0]["file"] == "delta-002.parquet"
        assert lines[0]["dropped"] == 1  # cross-delta near-dup dropped

        svc.refresh()
        assert svc.search("uniquetokenb"), "replica must see generation 2"
        # the cross-delta near-dup was dropped: only delta-1's original
        # carries the unique token
        assert len(svc.search("uniquetokena")) == 1

    assert ingested_files(drop) == ["delta-001.parquet", "delta-002.parquet"]
    assert pending_files(drop) == []
    # idempotent: nothing pending → a rerun ingests nothing
    assert ingest_once(idx, drop, _cfg(), threshold=0.5) == []


def test_ingest_marker_crash_window_never_double_appends(
    ray_session, tmp_path
):
    """Crash between the append's commit and the ingest marker write:
    the restart must converge WITHOUT re-appending the file. The
    append records the drop file's fingerprint in the index manifest
    inside its own atomic commit; a marker-less but tag-committed file
    is skipped and only its marker re-written (before the tag existed,
    this restart path duplicated the file's docs as an extra
    generation)."""
    from zensearch_ray.state.manifest import IndexLayout

    base = str(tmp_path / "base.parquet")
    pq.write_table(generate_pages_table(200, seed=3), base)
    idx = str(tmp_path / "idx")
    build_index(base, idx, _cfg())
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    _drop(drop, "d0.parquet", generate_pages_table(
        60, seed=9, row_offset=40_000))

    out1 = ingest_once(idx, drop, _cfg())
    assert len(out1) == 1 and "skipped" not in out1[0]
    m1 = IndexLayout(idx).read_manifest()
    assert len(m1["ingest_tags"]) == 1

    # simulate the crash window: the marker vanishes, the append stays
    marker = os.path.join(drop, "_ingested", "d0.parquet.json")
    os.remove(marker)
    assert pending_files(drop) == ["d0.parquet"]

    out2 = ingest_once(idx, drop, _cfg())
    assert out2 == [{"file": "d0.parquet", "skipped": "already_ingested"}]
    m2 = IndexLayout(idx).read_manifest()
    assert m2["n_docs"] == m1["n_docs"]  # NOT double-appended
    assert m2["n_generations"] == m1["n_generations"]
    assert os.path.exists(marker)  # marker converged
    assert pending_files(drop) == []

    # the next (uniquely-named, per the producer contract) file is a
    # fresh ingest and adds its own tag
    _drop(drop, "d1.parquet", generate_pages_table(
        30, seed=11, row_offset=80_000))
    out3 = ingest_once(idx, drop, _cfg())
    assert len(out3) == 1 and "skipped" not in out3[0]
    m3 = IndexLayout(idx).read_manifest()
    assert m3["n_docs"] > m2["n_docs"]
    assert len(m3["ingest_tags"]) == 2

    # compaction preserves the tags (the guard survives the LSM fold)
    from zensearch_ray.pipelines.compact import compact_in_place

    compact_in_place(idx)
    assert IndexLayout(idx).read_manifest()["ingest_tags"] == \
        m3["ingest_tags"]


def test_watch_loop_max_cycles(ray_session, tmp_path):
    from zensearch_ray.pipelines.watch import watch

    base = str(tmp_path / "base.parquet")
    pq.write_table(generate_pages_table(60, seed=3), base)
    idx = str(tmp_path / "idx")
    build_index(base, idx, _cfg())
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    _drop(drop, "d1.parquet", _pages(
        ["https://w.example.com/1"], [FRESH_A]))

    seen = []
    n = watch(idx, drop, _cfg(), threshold=0.5, poll_secs=0.01,
              max_cycles=3, on_cycle=lambda s: seen.extend(s))
    assert n == 1 and [s["file"] for s in seen] == ["d1.parquet"]


def test_watch_auto_compaction(ray_session, tmp_path):
    """compact_every=N: once an ingest cycle leaves the index at >= N
    generations, the watcher folds them in place — queries unchanged,
    generation count back to 1, sigstore carried over so near-dedup of
    LATER deltas keeps working across the swap."""
    from zensearch_ray.pipelines.query import QueryEngine
    from zensearch_ray.pipelines.watch import watch
    from zensearch_ray.state.manifest import IndexLayout

    base_tbl = generate_pages_table(120, seed=9)
    base = str(tmp_path / "base.parquet")
    pq.write_table(base_tbl, base)
    idx = str(tmp_path / "idx")
    build_index(base, idx, _cfg())
    drop = str(tmp_path / "drop")
    os.makedirs(drop)

    _drop(drop, "delta-001.parquet", _pages(
        ["https://c.example.com/a"], [FRESH_A]))
    _drop(drop, "delta-002.parquet", _pages(
        ["https://c.example.com/b"], [FRESH_B]))

    compactions = []
    n = watch(idx, drop, _cfg(), near_dedup=True, threshold=0.6,
              poll_secs=0.01, max_cycles=1, compact_every=2,
              on_compact=lambda m: compactions.append(m))
    assert n == 2
    assert len(compactions) == 1
    manifest = IndexLayout(idx).read_manifest()
    assert manifest.get("n_generations", 1) == 1  # folded
    eng = QueryEngine(idx)
    assert eng.topk("uniquetokena") and eng.topk("uniquetokenb")
    # near-dedup continuity across the swap: a near-dup of delta-1's
    # doc arriving AFTER compaction must still be dropped
    near = "zzz " + " ".join(FRESH_A.split(" ")[1:])
    _drop(drop, "delta-003.parquet", _pages(
        ["https://c.example.com/neardup", "https://c.example.com/c"],
        [near, "entirely fresh tokens herexyz " * 4],
    ))
    # the repeated-token fixture docs share ~2/3 of their shingles
    # after a one-token edit, so the continuity check probes at 0.6
    summaries = ingest_once(idx, drop, _cfg(), near_dedup=True,
                            threshold=0.6)
    assert summaries and summaries[-1]["dropped"] == 1


def test_compact_in_place_fsck_gate_and_idempotence(ray_session, tmp_path):
    from zensearch_ray.pipelines.compact import compact_in_place
    from zensearch_ray.pipelines.query import QueryEngine

    base_tbl = generate_pages_table(100, seed=11)
    base = str(tmp_path / "base.parquet")
    pq.write_table(base_tbl, base)
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(num_shards=4, salt_subs=2, lang="en")
    build_index(base, idx, cfg)
    before = QueryEngine(idx).topk("spark window merge", k=10)
    # crash leftovers must not block the swap
    os.makedirs(idx + ".compacting", exist_ok=True)
    os.makedirs(idx + ".precompact", exist_ok=True)
    m = compact_in_place(idx)
    assert m["n_docs"] > 0
    assert not os.path.exists(idx + ".compacting")
    assert not os.path.exists(idx + ".precompact")
    after = QueryEngine(idx).topk("spark window merge", k=10)
    assert after == before
