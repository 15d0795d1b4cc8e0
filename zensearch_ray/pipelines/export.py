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

import os

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


# per-WORKER tombstone cache: decode runs as a TASK pool (an actor
# pool here starves in complex DAGs — Ray Data's resource reservation
# for sibling operators can pin the pool at its minimum size, observed
# at 10M docs: one actor decoding 430M postings while 23 CPUs idled);
# the only state is the tombstone array, cached per worker process.
# Keyed on (index_dir, deletes mtime_ns, size): delete_docs rewrites
# deletes.parquet in place at a fixed path, so a long-lived worker
# reused across runs must not serve a tombstone array that predates an
# intervening delete.
_DELETES_CACHE: dict = {}


def _deletes_for(index_dir: str):
    layout = IndexLayout(index_dir)
    try:
        st = os.stat(layout.deletes_path)
        key = (index_dir, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (index_dir, None, None)
    if key not in _DELETES_CACHE:
        _DELETES_CACHE.clear()  # stale generations are never re-read
        _DELETES_CACHE[key] = layout.read_deletes()
    return _DELETES_CACHE[key]


class _DecodeSegment:
    """map_batches body: term rows → exploded posting rows.

    Each input row's three blobs decode vectorized (numpy varint/delta
    kernels); the per-batch term column is built with one
    dictionary-indices ``np.repeat``, never a Python loop over
    postings. Tombstones come from the per-worker cache above.
    """

    def __init__(self, index_dir: str, positions: bool = False):
        self.deleted = _deletes_for(index_dir)
        self.positions = positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"]
        rows = batch.to_pylist()
        parts = [decode_posting(r) for r in rows]
        lens = np.array([len(p[0]) for p in parts], dtype=np.int64)
        if not lens.sum():
            cols = {
                "term": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64()),
                "dl": pa.array([], type=pa.int64()),
            }
            if self.positions:
                cols["pos"] = pa.array([], type=pa.list_(pa.int32()))
            return pa.table(cols)
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        term_idx = np.repeat(np.arange(len(parts), dtype=np.int32), lens)
        pos_col = None
        if self.positions:
            from zensearch_ray.functions.codec import decode_positions

            # one flat positional stream per term row, sliced per
            # posting by its tf (token offsets within each doc)
            flats = [
                decode_positions(r["pos"], p[1])
                for r, p in zip(rows, parts)
            ]
            flat_all = (
                np.concatenate(flats) if flats else np.empty(0, np.int64)
            )
            offs = np.zeros(len(ids) + 1, dtype=np.int32)
            np.cumsum(tfs, out=offs[1:])
            pos_col = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(flat_all.astype(np.int32), type=pa.int32()),
            )
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
                if pos_col is not None:
                    pos_col = pos_col.take(pa.array(np.flatnonzero(keep)))
        term_col = pa.DictionaryArray.from_arrays(
            pa.array(term_idx), terms
        ).cast(pa.string())
        cols = {
            "term": term_col,
            "doc_id": pa.array(ids),
            "tf": pa.array(tfs.astype(np.int64)),
            "dl": pa.array(dls.astype(np.int64)),
        }
        if pos_col is not None:
            cols["pos"] = pos_col
        return pa.table(cols)


def dump_postings(index_dir: str, positions: bool = False):
    """Decode every committed segment into a streaming Dataset of
    ``(term, doc_id, tf, dl)`` rows (live docs only — tombstones are
    filtered exactly as at query time). ``dl`` is the indexed document
    length, replicated per posting as stored in the segments.
    ``positions=True`` (positional index only) adds a ``pos``
    list<int32> column — each posting's token offsets within its doc."""
    import ray.data as rd

    layout = IndexLayout(index_dir)
    files = _segment_files(layout)
    if not files:
        raise FileNotFoundError(f"no committed segments under {index_dir}")
    cols = ["term", "docs", "tfs", "dls"] + (["pos"] if positions else [])
    ds = rd.read_parquet(files, columns=cols)

    def decode(batch: pa.Table) -> pa.Table:
        return _DecodeSegment(index_dir, positions)(batch)

    # task pool, NOT an actor pool: free scheduling on every CPU (see
    # _DELETES_CACHE note), trivially cheap per-task state
    return ds.map_batches(decode, batch_format="pyarrow")


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


def significant_terms(
    index_dir: str,
    query: str,
    k: int = 25,
    min_fg_df: int = 3,
) -> "pd.DataFrame":
    """Significant-terms aggregation (the Elasticsearch
    ``significant_terms`` genre): which index terms are over-represented
    in the documents matching ``query`` (the FOREGROUND — the union of
    the query terms' posting lists) relative to the whole corpus (the
    BACKGROUND)? The reference's user-facing analog is the "related
    searches" affordance a search page derives from result contents;
    its engine re-scans full text per query
    (``search-engine/internal/query/query.go``), whereas here both
    frequencies come from the already-committed segments — the corpus
    text is never touched.

    Score is JLH: ``(fg_rate - bg_rate) * (fg_rate / bg_rate)`` with
    ``fg_rate = df_fg / n_fg`` and ``bg_rate = df_bg / n_docs``; the
    query's own terms are excluded (they are trivially maximal) and
    terms with ``df_fg < min_fg_df`` are dropped as noise. Returns the
    top-``k`` rows ``(term, df_fg, df_bg, score)`` ordered by
    (round6(score) DESC, term ASC) — rounded BEFORE ordering so the
    boundary is float-reproducible against the SQL oracle.

    Distributed shape (scale notes):

    - The foreground doc-id set is derived on the driver from the
      query terms' postings (the same cached decodes ``topk`` uses) and
      broadcast ONCE via ``ray.put`` as a sorted int64 array — 8 bytes
      per matching doc. For web-scale foregrounds (≥ ~10^8 docs) swap
      the exact probe for the repo's bloom stage (``stages/bloom.py``)
      at the cost of a bounded false-positive df inflation; the exact
      array is the right default for query-shaped foregrounds.
    - One schema-pruned scan over the segment files reads ONLY the
      ``term`` + ``docs`` columns — the tf/dl/position blobs never
      leave parquet. Each row's doc-id stream decodes vectorized
      (``delta_decode_docids``), tombstones drop via the broadcast
      sorted probe, and fg membership is one ``searchsorted`` over the
      concatenated batch.
    - Per-row partials ``(term, df_fg, df_bg)`` combine in the
      repo-standard bucketed groupby-sum (vocabulary-scale metadata
      exchange — same shape as ``term_df``; salted sub-partitions and
      append generations sum exactly as ``QueryEngine.lookup`` merges).
    - Scoring is vectorized per block and each block emits only its
      local top-``k``; the driver merges k x blocks candidate rows —
      never the vocabulary.
    """
    import pandas as pd
    import ray
    import ray.data as rd

    from zensearch_ray.functions.agg import bucketed_groupby_sum
    from zensearch_ray.functions.rounding import round6
    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.pipelines.query import QueryEngine

    engine = QueryEngine(index_dir)
    qterms = list(dict.fromkeys(tokenize(query)))
    fg_parts = []
    for tok in qterms:
        p = engine.lookup(tok)
        if p is not None:
            fg_parts.append(p.decode_all()[0])
    empty = pd.DataFrame(
        {
            "term": pd.Series([], dtype=str),
            "df_fg": pd.Series([], dtype=np.int64),
            "df_bg": pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
        }
    )
    if not fg_parts:
        return empty
    fg = np.unique(np.concatenate(fg_parts))
    n_fg = len(fg)
    n_docs = engine.n_docs
    if n_fg == 0:
        return empty
    fg_ref = ray.put(fg)

    layout = IndexLayout(index_dir)
    files = _segment_files(layout)
    ds = rd.read_parquet(files, columns=["term", "docs"])
    counted = ds.map_batches(
        _FgDfCount,
        fn_constructor_kwargs={"index_dir": index_dir, "fg_ref": fg_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    summed = bucketed_groupby_sum(counted, keys=["term"], sum_cols=["df_fg", "df_bg"])

    qset = set(qterms)

    def block_topk(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pylist(), dtype=object)
        fgc = batch["df_fg"].to_numpy(zero_copy_only=False).astype(np.float64)
        bgc = batch["df_bg"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = fgc >= min_fg_df
        if qset:
            keep &= np.array([t not in qset for t in terms], dtype=bool)
        terms, fgc, bgc = terms[keep], fgc[keep], bgc[keep]
        if len(terms) == 0:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "df_fg": pa.array([], type=pa.int64()),
                    "df_bg": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        fr = fgc / n_fg
        br = bgc / n_docs
        score = round6((fr - br) * (fr / br))
        order = np.lexsort((terms.astype(str), -score))[:k]
        return pa.table(
            {
                "term": pa.array(terms[order].astype(str)),
                "df_fg": pa.array(fgc[order].astype(np.int64)),
                "df_bg": pa.array(bgc[order].astype(np.int64)),
                "score": pa.array(score[order]),
            }
        )

    cand = summed.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return empty
    cand = cand.sort_values(
        ["score", "term"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return cand.reset_index(drop=True)


class _FgDfCount:
    """Actor-pool map_batches body for ``significant_terms``: segment
    rows → ``(term, df_fg, df_bg)`` live-doc count partials.

    Stateful for the two broadcast arrays (tombstones + foreground
    set), fetched once per actor. Per batch: every row's doc-id blob
    decodes vectorized, the rows concatenate into ONE id stream with a
    repeat-index back-pointer, and both memberships (deleted, fg) are
    single sorted ``searchsorted`` probes followed by ``bincount`` —
    no Python loop over postings.
    """

    def __init__(self, index_dir: str, fg_ref):
        import ray

        from zensearch_ray.functions.codec import delta_decode_docids

        self._decode = delta_decode_docids
        self.deleted = IndexLayout(index_dir).read_deletes()
        self.fg = ray.get(fg_ref)

    @staticmethod
    def _member(sorted_arr: np.ndarray, ids: np.ndarray) -> np.ndarray:
        j = np.searchsorted(sorted_arr, ids)
        return (j < len(sorted_arr)) & (
            sorted_arr[np.minimum(j, len(sorted_arr) - 1)] == ids
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["docs"].to_pylist()
        parts = [self._decode(b) for b in blobs]
        lens = np.array([len(p) for p in parts], dtype=np.int64)
        n = len(parts)
        if not lens.sum():
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "df_fg": pa.array([], type=pa.int64()),
                    "df_bg": pa.array([], type=pa.int64()),
                }
            )
        ids = np.concatenate(parts)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        if self.deleted is not None and len(self.deleted):
            keep = ~self._member(self.deleted, ids)
            ids, row_idx = ids[keep], row_idx[keep]
        bg = np.bincount(row_idx, minlength=n)
        hit = self._member(self.fg, ids)
        fgc = np.bincount(row_idx[hit], minlength=n)
        return pa.table(
            {
                "term": batch["term"],
                "df_fg": pa.array(fgc.astype(np.int64)),
                "df_bg": pa.array(bg.astype(np.int64)),
            }
        )
