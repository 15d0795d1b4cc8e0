"""WARC (Web ARChive, ISO 28500) ingestion — the public web-crawl
interchange format (Common Crawl ships ~100 TB/month of these), i.e.
the batch-scale analog of the reference's live crawl feed
(`crawler/internal/crawler/page_navigator.go:220-301` produces
url+html records over AMQP; a WARC file is the same stream at rest).

Reader semantics: 'response' records → one row per fetched page
(url, warc_ts, status, mime, html payload). Handles plain WARC and
the member-per-record gzip convention (each record its own gzip
member, concatenated — Common Crawl's layout) via a multi-member
stdlib-zlib walk. The writer exists to synthesize REAL fixtures and
round-trip-test the reader; it emits spec-shaped records (warcinfo
lead, CRLF framing, Content-Length octets) with deterministic ids so
fixture bytes are reproducible.

Scale shape: one WARC file is one read task (`read_binary_files`) —
a WARC stream is not splittable mid-file without a CDX offset index,
so the parallelism unit is the file, exactly how Common Crawl shards
(~1 GB/file, thousands of files). With a CDX index the gzip members
ARE independently seekable; `parse_warc` accepts any byte slice that
starts at a member boundary, so an offset-indexed splitting datasource
can reuse it unchanged.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"


def _record_id(url: str, ts: str) -> str:
    # deterministic in place of urn:uuid — fixture bytes must reproduce
    h = hashlib.sha1(f"{url}|{ts}".encode()).hexdigest()
    return f"<urn:sha1:{h}>"


def write_warc(
    records,
    path: str,
    gzip_members: bool = True,
    warcinfo: str = "software: zensearch_ray",
) -> int:
    """Write an iterable of record dicts
    ``{url, date (ISO str), status, mime, payload (bytes)}`` as WARC
    'response' records behind a 'warcinfo' lead record. Returns the
    record count (excluding warcinfo). ``gzip_members=True`` gzips
    each record as its own member (the Common Crawl convention —
    seekable at member boundaries)."""

    def one(headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = b"WARC/1.0" + _CRLF
        head += b"".join(
            f"{k}: {v}".encode() + _CRLF for k, v in headers
        )
        head += f"Content-Length: {len(block)}".encode() + _CRLF + _CRLF
        raw = head + block + _CRLF + _CRLF
        if not gzip_members:
            return raw
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw)
        return buf.getvalue()

    now = datetime(2026, 1, 1, tzinfo=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    info_block = warcinfo.encode() + _CRLF
    out = [one(
        [("WARC-Type", "warcinfo"),
         ("WARC-Date", now),
         ("WARC-Record-ID", _record_id("warcinfo", now)),
         ("Content-Type", "application/warc-fields")],
        info_block,
    )]
    n = 0
    for r in records:
        status = int(r.get("status", 200))
        mime = r.get("mime", "text/html")
        payload = r["payload"]
        http = (
            f"HTTP/1.1 {status} {'OK' if status == 200 else 'X'}".encode()
            + _CRLF
            + f"Content-Type: {mime}".encode() + _CRLF
            + f"Content-Length: {len(payload)}".encode() + _CRLF
            + _CRLF + payload
        )
        out.append(one(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", r["url"]),
             ("WARC-Date", r.get("date", now)),
             ("WARC-Record-ID", _record_id(r["url"], r.get("date", now))),
             ("Content-Type", "application/http; msgtype=response")],
            http,
        ))
        n += 1
    with open(path, "wb") as f:
        f.writelines(out)
    return n


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (zlib keeps
    ``unused_data`` at each member boundary — no temp files)."""
    out = []
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(payload[pos:]))
        out.append(d.flush())
        rest = d.unused_data
        if not rest:
            break
        pos = len(payload) - len(rest)
    return b"".join(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse WARC bytes (plain or member-gzipped) → one dict per
    'response' record: url, warc_ts (ISO str), status, mime,
    html (payload bytes). Non-response records (warcinfo, request,
    metadata) are skipped. Raises on truncated records — a torn file
    must fail loudly, not yield a silent prefix."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    rows = []
    pos = 0
    while pos < len(payload):
        # skip inter-record blank lines
        while payload[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= len(payload):
            break
        if payload[pos:pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC record header at offset {pos}")
        hdr_end = payload.index(_CRLF + _CRLF, pos)
        headers = {}
        for line in payload[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        length = int(headers["content-length"])
        block_start = hdr_end + 4
        block = payload[block_start:block_start + length]
        if len(block) != length:
            raise ValueError("truncated WARC record")
        pos = block_start + length
        if headers.get("warc-type") != "response":
            continue
        status, mime, body = _parse_http_response(block)
        rows.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "status": status,
            "mime": mime,
            "html": body,
        })
    return rows


def _parse_http_response(block: bytes) -> tuple[int, str, bytes]:
    hdr_end = block.find(_CRLF + _CRLF)
    if hdr_end < 0:  # bare payload (no HTTP head) — tolerate
        return 200, "", block
    lines = block[:hdr_end].split(_CRLF)
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return 200, "", block
    mime = ""
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            mime = v.strip().decode(errors="replace")
    return status, mime, block[hdr_end + 4:]


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.string()),
        "status": pa.array([r["status"] for r in rows], pa.int32()),
        "mime": pa.array([r["mime"] for r in rows], pa.string()),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
    })


_EMPTY = _rows_to_table([])


def read_warc(paths):
    """WARC file(s) → Dataset of (url, warc_ts, status, mime, html).
    One read task per file (the WARC parallelism unit — see module
    docstring); parsing runs inside ``map_batches`` on the worker that
    read the bytes, so payloads never make an extra hop."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            _rows_to_table(parse_warc(payload.as_py()))
            for payload in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else _EMPTY

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def read_warc_pages(paths):
    """WARC → the canonical pages schema
    ``(url, warc_ts, html, text, lang)`` (200-status HTML records
    only), so crawl archives feed the SAME prep/build pipelines as
    parquet and JSONL sources."""
    import pyarrow.compute as pc

    def coerce(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(batch["status"], 200),
            pc.match_substring(batch["mime"], "html"),
        )
        t = batch.filter(keep)
        ts = pc.strptime(t["warc_ts"], format="%Y-%m-%dT%H:%M:%SZ",
                         unit="us")
        return pa.table({
            "url": t["url"],
            "warc_ts": ts,
            "html": t["html"],
            "text": pa.nulls(t.num_rows, pa.string()),
            "lang": pa.nulls(t.num_rows, pa.string()),
        })

    return read_warc(paths).map_batches(coerce, batch_format="pyarrow")


def build_warc_cdx(warc_path: str, cdx_path: str | None = None) -> str:
    """Derive a CDX-style offset index for a member-gzipped WARC →
    parquet sidecar (url, warc_ts, offset, length), one row per
    'response' record. This is the Common Crawl CDX(J) idea with
    parquet as the carrier (columnar, predicate-prunable — the natural
    form for a Ray-native engine); offsets address gzip MEMBER
    boundaries, so any (offset, length) slice is independently
    decompressable and parseable. The index is what turns a WARC from
    one-task-per-file into arbitrarily-splittable input."""
    import pyarrow.parquet as pq

    cdx_path = cdx_path or warc_path + ".cdx.parquet"
    with open(warc_path, "rb") as f:
        payload = f.read()
    if payload[:2] != b"\x1f\x8b":
        raise ValueError("CDX indexing expects a member-gzipped WARC")
    urls, tss, offs, lens = [], [], [], []
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(payload[pos:]) + d.flush()
        end = len(payload) - len(d.unused_data)
        hdr_end = raw.index(_CRLF + _CRLF)
        headers = {}
        for line in raw[:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        if headers.get("warc-type") == "response":
            urls.append(headers.get("warc-target-uri", ""))
            tss.append(headers.get("warc-date", ""))
            offs.append(pos)
            lens.append(end - pos)
        pos = end
    tmp = f"{cdx_path}.tmp{id(payload) & 0xffff}"
    pq.write_table(pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.string()),
        "offset": pa.array(offs, pa.int64()),
        "length": pa.array(lens, pa.int64()),
    }), tmp)
    import os

    os.replace(tmp, cdx_path)
    return cdx_path


def read_warc_indexed(warc_path: str, cdx_path: str | None = None,
                      records_per_task: int = 512):
    """CDX-indexed WARC → Dataset of (url, warc_ts, status, mime,
    html), SPLIT into ~``records_per_task``-record byte ranges —
    contiguous records coalesce into one pread per task, so a single
    1 GB archive fans out across the cluster instead of pinning one
    worker. Requires (and builds, if absent) the parquet CDX sidecar."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    cdx_path = cdx_path or warc_path + ".cdx.parquet"
    if not os.path.exists(cdx_path):
        build_warc_cdx(warc_path, cdx_path)
    cdx = pq.read_table(cdx_path, columns=["offset", "length"])
    offs = cdx["offset"].to_numpy(zero_copy_only=False)
    lens = cdx["length"].to_numpy(zero_copy_only=False)
    ranges = []
    for i in range(0, len(offs), records_per_task):
        lo = int(offs[i])
        j = min(i + records_per_task, len(offs)) - 1
        hi = int(offs[j] + lens[j])
        ranges.append({"path": warc_path, "offset": lo, "length": hi - lo})
    if not ranges:
        return rd.from_arrow(_EMPTY)

    def fetch(batch: pa.Table) -> pa.Table:
        tables = []
        for path, off, ln in zip(batch["path"].to_pylist(),
                                 batch["offset"].to_pylist(),
                                 batch["length"].to_pylist()):
            with open(path, "rb") as f:
                f.seek(off)
                tables.append(_rows_to_table(parse_warc(f.read(ln))))
        return pa.concat_tables(tables) if tables else _EMPTY

    return rd.from_items(ranges).map_batches(
        fetch, batch_format="pyarrow", batch_size=1)


def documents_to_warc(sf_dir: str, out_path: str, gzip_members: bool = True) -> int:
    """Synthesize a deterministic WARC fixture from the driver's
    read-only ``documents`` table (each doc wrapped in a minimal HTML
    envelope) — the reproducible stand-in for a real crawl archive."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()

    def gen():
        for d, txt in zip(ids, texts):
            yield {
                "url": f"https://docs.example.com/{d}",
                "date": datetime(
                    2026, 1, 1, tzinfo=timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%SZ"),
                "status": 200,
                "mime": "text/html",
                "payload": f"<html><body><p>{txt}</p></body></html>".encode(),
            }

    return write_warc(gen(), out_path, gzip_members=gzip_members)
