"""WARC source: writer→reader round trip (plain + member-gzip),
multi-member gzip walk, HTTP response parse, torn-file loudness, Ray
Dataset read, and the pages-schema coercion into the prep pipelines."""

from __future__ import annotations

import gzip

import pytest

from zensearch_ray.sources.warc import (
    parse_warc,
    read_warc,
    read_warc_pages,
    write_warc,
)

RECORDS = [
    {"url": "https://a.example.com/x", "date": "2026-01-02T03:04:05Z",
     "status": 200, "mime": "text/html",
     "payload": "<html><body><p>héllo wörld</p></body></html>".encode()},
    {"url": "https://b.example.com/y", "date": "2026-01-02T03:04:06Z",
     "status": 404, "mime": "text/plain", "payload": b"gone"},
    {"url": "https://c.example.com/z", "date": "2026-01-02T03:04:07Z",
     "status": 200, "mime": "image/png",
     "payload": b"\x89PNG\r\n\x1a\n" + bytes(range(64))},  # binary-safe
]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip(tmp_path, gz):
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    assert write_warc(RECORDS, path, gzip_members=gz) == 3
    with open(path, "rb") as f:
        rows = parse_warc(f.read())
    assert len(rows) == 3  # warcinfo lead record skipped
    for r, want in zip(rows, RECORDS):
        assert r["url"] == want["url"]
        assert r["warc_ts"] == want["date"]
        assert r["status"] == want["status"]
        assert r["mime"] == want["mime"]
        assert r["html"] == want["payload"]


def test_gzip_members_are_seekable_units(tmp_path):
    """Each record is its own gzip member: any member boundary is a
    valid parse start (the CDX-offset splitting contract)."""
    path = str(tmp_path / "a.warc.gz")
    write_warc(RECORDS, path, gzip_members=True)
    payload = open(path, "rb").read()
    # member boundaries = every gzip magic occurrence here (the 2-byte
    # magic inside compressed data is possible in general, but these
    # fixtures are tiny and checked)
    bounds = [i for i in range(len(payload) - 1)
              if payload[i] == 0x1F and payload[i + 1] == 0x8B]
    assert len(bounds) == 4  # warcinfo + 3 responses
    # parse starting from the THIRD member: yields the last two records
    rows = parse_warc(payload[bounds[2]:])
    assert [r["url"] for r in rows] == [RECORDS[1]["url"], RECORDS[2]["url"]]


def test_deterministic_bytes(tmp_path):
    a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc(RECORDS, a)
    write_warc(RECORDS, b)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_truncated_record_raises(tmp_path):
    path = str(tmp_path / "a.warc")
    write_warc(RECORDS, path, gzip_members=False)
    payload = open(path, "rb").read()
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(payload[:-20])
    with pytest.raises(ValueError, match="bad WARC"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_foreign_gzip_warc_parses(tmp_path):
    """A WARC gzipped as ONE stream (not per-member) still parses —
    readers must accept both layouts."""
    plain = str(tmp_path / "a.warc")
    write_warc(RECORDS, plain, gzip_members=False)
    blob = gzip.compress(open(plain, "rb").read())
    rows = parse_warc(blob)
    assert [r["url"] for r in rows] == [r["url"] for r in RECORDS]


def test_ray_read_warc_multiple_files(ray_session, tmp_path):
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc(RECORDS, p1)
    write_warc(
        [{"url": "https://d.example.com", "date": "2026-01-03T00:00:00Z",
          "status": 200, "mime": "text/html", "payload": b"<p>d</p>"}],
        p2,
    )
    df = read_warc([p1, p2]).to_pandas().sort_values("url",
                                                     ignore_index=True)
    assert len(df) == 4
    assert list(df["status"]) == [200, 404, 200, 200]
    assert df["html"].iloc[0] == RECORDS[0]["payload"]


def test_read_warc_pages_feeds_prep(ray_session, tmp_path):
    """Pages coercion: only 200 + HTML records survive, timestamps
    parse, and the canonical schema plugs into the HTML extractor."""
    path = str(tmp_path / "a.warc.gz")
    write_warc(RECORDS, path)
    ds = read_warc_pages(path)
    from zensearch_ray.stages.extract import extract_batch

    out = ds.map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    assert list(out["url"]) == ["https://a.example.com/x"]  # 404/png dropped
    assert out["warc_ts"].iloc[0].isoformat().startswith("2026-01-02T03:04:05")
    assert "héllo wörld" in out["text"].iloc[0]


def test_cdx_indexed_read_matches_plain(ray_session, tmp_path):
    """CDX-split read ≡ whole-file read; ranges genuinely split the
    file (multiple tasks) and each range parses independently."""
    from zensearch_ray.sources.warc import build_warc_cdx, read_warc_indexed

    path = str(tmp_path / "a.warc.gz")
    many = [
        {"url": f"https://e.example.com/{i}", "date": "2026-01-04T00:00:00Z",
         "status": 200, "mime": "text/html",
         "payload": f"<p>doc {i}</p>".encode()}
        for i in range(40)
    ]
    write_warc(many, path)
    cdx = build_warc_cdx(path)
    import pyarrow.parquet as pq_

    idx = pq_.read_table(cdx)
    assert idx.num_rows == 40  # warcinfo excluded
    assert idx["offset"].to_pylist() == sorted(idx["offset"].to_pylist())
    whole = read_warc(path).to_pandas().sort_values("url", ignore_index=True)
    split = (read_warc_indexed(path, records_per_task=7)
             .to_pandas().sort_values("url", ignore_index=True))
    assert split.equals(whole)
    # a mid-file range really is independently parseable
    off = idx["offset"][20].as_py()
    ln = idx["length"][20].as_py()
    with open(path, "rb") as f:
        f.seek(off)
        rows = parse_warc(f.read(ln))
    assert rows[0]["url"] == "https://e.example.com/20"


def test_cdx_requires_member_gzip(tmp_path):
    from zensearch_ray.sources.warc import build_warc_cdx

    plain = str(tmp_path / "a.warc")
    write_warc(RECORDS, plain, gzip_members=False)
    with pytest.raises(ValueError, match="member-gzipped"):
        build_warc_cdx(plain)


def _english_warc(path: str, n: int = 30) -> None:
    docs = [
        f"<html><body><p>the quick brown fox and the lazy dog walk in "
        f"the park with a map of "
        f"{'zebra trail' if i % 6 == 0 else 'plain road'} {i} on it"
        f"</p></body></html>"
        for i in range(n)
    ]
    write_warc(
        [{"url": f"https://w.example.com/{i}",
          "date": "2026-01-05T00:00:00Z", "status": 200,
          "mime": "text/html", "payload": d.encode()}
         for i, d in enumerate(docs)],
        path,
    )


def test_build_index_from_warc(ray_session, tmp_path):
    """resolve_pages_source makes a WARC a first-class build input:
    extraction + language-ID fill, then the NORMAL en-filtered build,
    and queries hit the archived pages."""
    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.pipelines.query import QueryEngine, resolve_docs
    from zensearch_ray.sources import resolve_pages_source

    path = str(tmp_path / "crawl.warc.gz")
    _english_warc(path)
    idx = str(tmp_path / "idx")
    manifest = build_index(
        resolve_pages_source(path), idx,
        BuildConfig(num_shards=4, salt_subs=2))  # default lang="en" kept
    assert manifest["n_docs"] == 30
    eng = QueryEngine(idx)
    hits = eng.topk("zebra trail", 5)
    assert len(hits) == 5
    urls = {r["url"] for r in resolve_docs(eng.layout, hits)}
    # the zebra docs are exactly i % 6 == 0
    assert urls == {f"https://w.example.com/{i}" for i in (0, 6, 12, 18, 24)}


def test_watch_ingests_warc_drop(ray_session, tmp_path):
    """A .warc.gz renamed into the drop dir appends like any delta."""
    import os

    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.pipelines.query import QueryEngine
    from zensearch_ray.pipelines.watch import ingest_once, ingested_files
    from zensearch_ray.sources import resolve_pages_source

    base = str(tmp_path / "base.warc.gz")
    _english_warc(base, n=10)
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(num_shards=4, salt_subs=2, sig_store=True)
    build_index(resolve_pages_source(base), idx, cfg)

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    delta_tmp = str(tmp_path / "delta.part")
    _english_warc(delta_tmp, n=5)
    os.replace(delta_tmp, os.path.join(drop, "delta.warc.gz"))
    # the delta's pages reuse base urls 0..4 → near-dedup must drop them
    out = ingest_once(idx, drop, cfg, near_dedup=True, threshold=0.5)
    assert len(out) == 1
    assert ingested_files(drop) == ["delta.warc.gz"]
    eng = QueryEngine(idx)
    assert eng.layout.read_manifest()["n_docs"] == 10  # all 5 were dups
    assert ingest_once(idx, drop, cfg) == []  # marker → idempotent


def test_prep_cli_accepts_warc(ray_session, tmp_path):
    """`prep --input crawl.warc.gz` runs the full prep chain over an
    archive (resolver fills text+lang) and writes partitioned parquet."""
    import pyarrow.parquet as pq_

    from zensearch_ray.pipelines.prep import prep_corpus
    from zensearch_ray.sources import resolve_pages_source

    path = str(tmp_path / "crawl.warc.gz")
    _english_warc(path, n=24)
    out = str(tmp_path / "prepped")
    stats = prep_corpus(
        resolve_pages_source(path), out,
        min_tokens=5, n_partitions=4)
    assert stats["rows"] > 0
    got = pq_.ParquetDataset(out).read()
    assert got.num_rows == stats["rows"]
    assert "chunk_text" in got.column_names
    assert all(got["n_tokens"].to_numpy() >= 1)
