"""End-to-end training-data prep pipeline — the composite job a
100-TB corpus-prep run actually is, as ONE streaming Ray Data pipeline
with resumable partitioned output:

    read pages (columns pruned)
      → [extract html→text]               # E1, only when asked
      → lang filter                       # map-side predicate
      → exact URL dedup (keep first)      # duplicate-sliver plan, no corpus shuffle
      → quality filter                    # min tokens / max stopword ratio
      → token-window chunking             # map-only flat explode
      → hash-partitioned parquet sink     # atomic per-partition commit

Every stage is an already-oracle-checked operator
(``stages/extract``, ``stages/dedup``, ``stages/textstats``,
``corpus.docs_chunked`` semantics, ``state/sink``); this module chains
them and exposes the chain as ``python -m zensearch_ray prep``.
Rerunning after a crash resumes: committed output partitions are
dropped at the map side before the shuffle.

Reference analog: this replaces the crawl loop's store-everything path
(``crawler/main.go:84-112`` → ``database/src/database.ts:16-91``) with
a filtered, deduplicated, chunked corpus ready for tokenizer/LM
training.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from zensearch_ray.functions.text import tokenize
from zensearch_ray.functions.ids import url_doc_id
from zensearch_ray.stages.dedup import dedup_by_key
from zensearch_ray.stages.extract import extract_batch
from zensearch_ray.stages.textstats import token_quality_batch
from zensearch_ray.state.sink import write_partitioned


def prep_corpus(
    source,
    out_dir: str,
    *,
    lang: str | None = "en",
    extract_from_html: bool = False,
    min_tokens: int = 40,
    max_stop_ratio: float = 0.5,
    chunk_tokens: int = 512,
    n_partitions: int = 64,
    canonical_dedup: bool = False,
    gopher: bool = False,
    repetition: bool = False,
    exact_substr: int | None = None,
) -> dict:
    """Run the prep chain over ``source`` (pages parquet path(s) or a
    Dataset) into ``out_dir``. Returns the sink's
    {written, skipped, rows} stats. Never calls ray.init."""
    import ray.data as rd

    if isinstance(source, (str, list)):
        cols = ["url", "warc_ts", "text", "lang"]
        if extract_from_html:
            cols.append("html")
        ds = rd.read_parquet(source, columns=cols)
    else:
        ds = source
    if extract_from_html:
        ds = ds.map_batches(extract_batch, batch_format="pyarrow", zero_copy_batch=True)
    if lang is not None:
        lng = lang
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["lang"], lng)), batch_format="pyarrow"
        )
    if canonical_dedup:
        # crawl-style dedup: mirrors of the same page that differ only
        # in case/fragment/tracking-params/default-port/trailing-slash
        # collapse to one canonical survivor (keep earliest warc_ts)
        from zensearch_ray.functions.urls import canonical_url_batch

        ds = ds.map_batches(canonical_url_batch, batch_format="pyarrow")
        ds = dedup_by_key(ds, "canon_url", order_col="warc_ts")
        ds = ds.drop_columns(["canon_url"])
    else:
        ds = dedup_by_key(ds, "url", order_col="warc_ts")

    def add_id(batch: pa.Table) -> pa.Table:
        ids = np.fromiter(
            (url_doc_id(u) for u in batch["url"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("doc_id", pa.array(ids))

    ds = ds.map_batches(add_id, batch_format="pyarrow")

    def qual_filter(batch: pa.Table) -> pa.Table:
        q = token_quality_batch(batch)
        keep = pc.and_(
            pc.greater_equal(q["n_tokens"], min_tokens),
            pc.less_equal(q["stop_ratio"], max_stop_ratio),
        )
        return batch.filter(keep)

    ds = ds.map_batches(qual_filter, batch_format="pyarrow")

    if gopher:
        from zensearch_ray.stages.textstats import gopher_batch

        def gopher_gate(batch: pa.Table) -> pa.Table:
            keep = pc.equal(gopher_batch(batch, id_col="doc_id")["keep"], 1)
            return batch.filter(keep)

        ds = ds.map_batches(gopher_gate, batch_format="pyarrow")
    if repetition:
        from zensearch_ray.stages.textstats import repetition_batch

        def repetition_gate(batch: pa.Table) -> pa.Table:
            keep = pc.equal(
                repetition_batch(batch, id_col="doc_id")["keep"], 1
            )
            return batch.filter(keep)

        ds = ds.map_batches(repetition_gate, batch_format="pyarrow")
    if exact_substr:
        # ExactSubstr duplicate-passage removal (Lee et al. 2022 genre):
        # rewrite each doc's text with cross-corpus duplicated token
        # windows cut (first occurrence kept) BEFORE chunking, so a
        # boilerplate passage never lands in two training chunks
        from zensearch_ray.stages.dedup import exact_substr_dedup

        ds = exact_substr_dedup(ds, l=int(exact_substr)).drop_columns(
            ["n_tokens", "n_removed"]
        )

    def chunk(batch: pa.Table) -> pa.Table:
        doc_ids, urls, chunk_ids, texts, lens = [], [], [], [], []
        for did, url, text in zip(
            batch["doc_id"].to_pylist(),
            batch["url"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            toks = tokenize(text)
            for ci in range(0, (len(toks) + chunk_tokens - 1) // chunk_tokens):
                part = toks[ci * chunk_tokens : (ci + 1) * chunk_tokens]
                doc_ids.append(did)
                urls.append(url)
                chunk_ids.append(ci)
                texts.append(" ".join(part))
                lens.append(len(part))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "chunk_id": pa.array(chunk_ids, type=pa.int64()),
                "chunk_text": pa.array(texts, type=pa.string()),
                "n_tokens": pa.array(lens, type=pa.int64()),
            }
        )

    chunks = ds.map_batches(chunk, batch_format="pyarrow")
    return write_partitioned(
        chunks, out_dir, "doc_id", n_partitions=n_partitions
    )
