"""JSONL crawl-dump ingestion — the batch analog of the reference's
JSON crawl payloads (parsed in
``search-engine/utilities/webpage_paser.go:8-16`` and shipped over
AMQP, ``crawler/internal/rabbitmq/*``): newline-delimited JSON crawl
records are read and coerced to the canonical pages schema
``(url, warc_ts, html, text, lang)`` so every downstream pipeline
(build_index, dedup, textstats, ...) is source-agnostic.

Scale shape: ``ray.data.read_json`` streams one task per file (gzip
transparently handled by Arrow); the coercion is a zero-copy-ish
column projection per batch. Missing fields become typed nulls — the
same contract a heterogeneous crawl produces.
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA: dict[str, pa.DataType] = {
    "url": pa.string(),
    "warc_ts": pa.timestamp("us"),  # ISO strings in JSON parse via cast
    "html": pa.binary(),
    "text": pa.string(),
    "lang": pa.string(),
}


def coerce_pages_batch(batch: pa.Table) -> pa.Table:
    """Project/cast any superset-or-subset JSON record batch onto the
    canonical pages schema (missing columns → typed nulls, extras
    dropped, lax numeric/string casts)."""
    n = batch.num_rows
    cols = {}
    for name, typ in PAGES_SCHEMA.items():
        if name in batch.column_names:
            cols[name] = batch[name].cast(typ)
        else:
            cols[name] = pa.nulls(n, typ)
    return pa.table(cols)


def read_pages_jsonl(paths):
    """JSONL file(s)/dir → Dataset in canonical pages schema."""
    import ray.data as rd

    return rd.read_json(paths).map_batches(
        coerce_pages_batch, batch_format="pyarrow"
    )


def read_pages_csv(paths):
    """CSV crawl-export file(s)/dir → Dataset in canonical pages schema
    (the spreadsheet-born sibling of ``read_pages_jsonl``; one read
    task per file, gzip by extension, Arrow's CSV reader infers
    timestamps). The ``html`` column, when present, arrives as a
    string column (CSV has no binary type) and is cast to binary by
    the shared coercion."""
    import ray.data as rd

    return rd.read_csv(paths).map_batches(
        coerce_pages_batch, batch_format="pyarrow"
    )
