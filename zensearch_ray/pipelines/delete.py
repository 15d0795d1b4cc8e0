"""Document deletion — the tombstone step of the index lifecycle
(build → append → merge → compact → DELETE).

The reference mutates its corpus in place (MySQL upsert/delete,
``database/src/database.ts:16-91``); an immutable-segment engine can't.
The batch-native design is Lucene's: deletion writes a TOMBSTONE set
(``deletes.parquet`` beside the manifest), queries exclude tombstoned
docs at posting-decode time, and the next ``compact_index`` physically
drops their postings and docmeta and recomputes corpus stats exactly.

Semantics until compaction (documented, Lucene-identical):

  * tombstoned docs never appear in any query result (every evaluation
    strategy — exhaustive/pruned/and/phrase/near/prefix/fuzzy/not —
    filters at the shared ``_TermPostings.decode_all`` choke point);
  * surviving docs keep their EXACT pre-delete scores: ``n_docs``,
    ``avgdl`` and per-term ``df`` still count tombstoned docs until
    compaction folds them out (stats-at-merge, like Lucene's deleted
    docs counting toward IDF until segments merge);
  * after ``compact_index`` the output is results-identical to an
    index built one-shot over the surviving corpus (asserted in
    ``tests/test_delete.py``).

Deletion is idempotent (the tombstone set is a union) and metadata-
scale: resolving URLs reads only docmeta with parquet predicate
pushdown; postings are never touched.
"""

from __future__ import annotations

import numpy as np

from zensearch_ray.state.manifest import IndexLayout


def delete_docs(
    index_dir: str,
    doc_ids=None,
    urls: list[str] | None = None,
) -> dict:
    """Tombstone documents by id and/or url. Returns a summary dict.

    URLs resolve to doc_ids via the docmeta sidecar (predicate-pushdown
    read over every generation); URLs not present in the index are
    counted in ``n_unmatched_urls`` (a delete list from a crawl feed
    legitimately contains pages that were filtered out at build time —
    an unmatched url is a no-op, not an error). Raw doc_ids are
    validated against ``id_ceiling`` when the index has dense ids.

    Engines already open keep serving their pre-delete view (they load
    tombstones at construction); reopen to observe the deletion —
    the same visibility rule as every other mutation of this layout.
    """
    import pyarrow.parquet as pq

    layout = IndexLayout(index_dir)
    manifest = layout.read_manifest()

    ids = np.asarray(
        [] if doc_ids is None else list(doc_ids), dtype=np.int64
    )
    n_unmatched = 0
    if urls:
        meta = pq.ParquetDataset(
            layout.docmeta_dir, filters=[("url", "in", list(urls))]
        ).read(columns=["doc_id", "url"])
        found = meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_unmatched = len(set(urls)) - len(set(meta["url"].to_pylist()))
        ids = np.concatenate([ids, found])

    ceiling = manifest.get("id_ceiling")
    if ceiling is not None and len(ids):
        bad = ids[(ids < 0) | (ids >= int(ceiling))]
        if len(bad):
            raise ValueError(
                f"doc_ids out of range [0, {ceiling}): {sorted(set(bad.tolist()))[:10]}"
            )

    existing = layout.read_deletes()
    merged = np.unique(np.concatenate([existing, ids]))
    n_new = int(len(merged) - len(existing))
    if n_new:
        layout.write_deletes(merged)
        manifest["n_deleted"] = int(len(merged))
        layout.write_manifest(manifest)
    return {
        "n_deleted_total": int(len(merged)),
        "n_newly_deleted": n_new,
        "n_unmatched_urls": int(n_unmatched),
        "n_docs": int(manifest["n_docs"]),
    }
