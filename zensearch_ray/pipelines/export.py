"""Index export: decode the committed segments back into columnar
``(term, doc_id, tf, dl)`` posting rows as a streaming Ray Dataset.

Two jobs in one operator:

1. **Interop surface** — the inverse of the build's encode step, so a
   built index can feed any downstream columnar consumer (DuckDB,
   polars, another engine) without re-tokenizing the corpus. The
   reference's only export is row-at-a-time SQL through the Express
   API (``express-server/src/app/index.ts:175-203``); this is the
   batch-engine form.
2. **End-to-end integrity check** — the exported rows are verified
   against the SQL tokenization oracle (driver entry
   ``dump_postings``), closing the loop build → varint/delta encode →
   segment commit → decode → original (term, doc_id, tf) facts. A
   codec, shuffle, or merge bug anywhere in the index path breaks the
   value hash.

Shape: one ``read_parquet`` over the segment files (schema-pruned to
the term + blob columns) → a ``map_batches`` decode that explodes each
term row into its postings with one ``np.repeat`` per batch — map-only
streaming, no shuffle, no driver materialization. Tombstones are
dropped inline (broadcast sorted array, same probe as query-time).
Generations are disjoint by construction (appends index NEW doc_ids),
so segment rows decode independently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from zensearch_ray.functions.codec import decode_posting
from zensearch_ray.state.manifest import IndexLayout


def _segment_files(layout: IndexLayout) -> list[str]:
    manifest = layout.read_manifest()
    n_parts = manifest["num_shards"] * manifest["salt_subs"]
    return [
        path
        for part in range(n_parts)
        for path in layout.part_posting_files(part)
    ]


class _DecodeSegment:
    """Actor-pool map_batches body: term rows → exploded posting rows.

    Stateful only for the tombstone array (loaded once per actor, not
    per batch). Each input row's three blobs decode vectorized
    (numpy varint/delta kernels); the per-batch term column is built
    with one dictionary-indices ``np.repeat``, never a Python loop
    over postings.
    """

    def __init__(self, index_dir: str):
        self.deleted = IndexLayout(index_dir).read_deletes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"]
        parts = [decode_posting(r) for r in batch.to_pylist()]
        lens = np.array([len(p[0]) for p in parts], dtype=np.int64)
        if not lens.sum():
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                }
            )
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        term_idx = np.repeat(np.arange(len(parts), dtype=np.int32), lens)
        if self.deleted is not None and len(self.deleted):
            j = np.searchsorted(self.deleted, ids)
            hit = (j < len(self.deleted)) & (
                self.deleted[np.minimum(j, len(self.deleted) - 1)] == ids
            )
            if hit.any():
                keep = ~hit
                ids, tfs, dls, term_idx = (
                    ids[keep],
                    tfs[keep],
                    dls[keep],
                    term_idx[keep],
                )
        term_col = pa.DictionaryArray.from_arrays(
            pa.array(term_idx), terms
        ).cast(pa.string())
        return pa.table(
            {
                "term": term_col,
                "doc_id": pa.array(ids),
                "tf": pa.array(tfs.astype(np.int64)),
                "dl": pa.array(dls.astype(np.int64)),
            }
        )


def dump_postings(index_dir: str):
    """Decode every committed segment into a streaming Dataset of
    ``(term, doc_id, tf, dl)`` rows (live docs only — tombstones are
    filtered exactly as at query time). ``dl`` is the indexed document
    length, replicated per posting as stored in the segments."""
    import ray.data as rd

    layout = IndexLayout(index_dir)
    files = _segment_files(layout)
    if not files:
        raise FileNotFoundError(f"no committed segments under {index_dir}")
    ds = rd.read_parquet(files, columns=["term", "docs", "tfs", "dls"])
    return ds.map_batches(
        _DecodeSegment,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def export_postings(index_dir: str, output_dir: str) -> dict:
    """CLI body: stream the decoded postings to partitioned parquet.
    Returns a small summary dict (rows, files)."""
    ds = dump_postings(index_dir)
    ds.write_parquet(output_dir)
    import glob

    return {
        "output": output_dir,
        "files": len(glob.glob(f"{output_dir}/*.parquet")),
    }
