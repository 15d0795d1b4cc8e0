"""Segment compaction: fold append GENERATIONS back into one segment
per partition — the LSM-style maintenance step that completes the
grow-by-append lifecycle (reference analog: the MySQL upsert keeps one
row per url, ``database/src/database.ts:16-91``; here immutable
generation segments are merged instead of rows rewritten in place).

Why compact: each append adds one segment file per touched partition,
so query-time term lookups probe ``n_generations`` files per
sub-partition, and generations encoded under an older (smaller) avgdl
carry loosened block-max bounds (the rank-safe ``encode_avgdl``
scaling in ``query.py:lookup``). Compaction restores one file per
partition with exact bounds under the current avgdl.

Crash-safety by construction: compaction writes a NEW index directory.
Source segments are immutable and untouched; each output partition
commits independently through the same atomic ``commit_partition``
protocol as a build (resume = rerun, committed partitions are
skipped); the output only becomes a valid index when its global
manifest lands last. Swapping serving over is a directory rename by
the operator — there is no in-place mutation window at all.

The compacted index is results-identical to a one-shot cold build over
the union corpus (asserted in ``tests/test_compact.py``): same pinned
scoring, and the merged avgdl IS the union avgdl (exact metadata
combine). The physical partition layout may differ — a term that is
heavy over the union but not within any single generation is salted
across sub-partitions by the one-shot build only; salting is a layout
knob, invisible to queries (the engine probes every sub-partition of a
shard), so compaction preserves each posting's partition.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from zensearch_ray.functions.bm25 import BM25Params
from zensearch_ray.state.manifest import IndexLayout


def _merge_partition(
    files: list[str | tuple[str, int]],
    avgdl: float,
    params: BM25Params,
    deleted: np.ndarray | None = None,
) -> bytes:
    """Read every source segment of one partition, merge postings per
    term (sources have disjoint doc-id ranges; sort makes the result
    order-invariant), re-encode under ``avgdl``. Each file may carry a
    doc-id offset (``(path, offset)``) — cross-index merge relocates
    one side's dense ids into the union id space; positions are
    doc-internal and never shift. ``deleted`` (sorted tombstoned
    doc_ids, ``pipelines/delete.py``) physically PURGES those docs'
    postings: their rows (and positions) drop, per-term df shrinks to
    the live count (df is re-derived from run lengths by
    ``encode_partition``), and terms left with no live postings vanish
    from the dictionary. Returns the parquet payload bytes.
    Pure function → plain testable code."""
    import io

    import pyarrow.parquet as pq

    from zensearch_ray.functions.codec import (
        decode_positions,
        decode_posting,
        encode_partition,
        permute_flat_by_rows,
    )

    if deleted is not None and len(deleted) == 0:
        deleted = None

    per_term: dict[str, list[tuple]] = {}
    positional = False
    for entry in files:
        path, id_offset = entry if isinstance(entry, tuple) else (entry, 0)
        t = pq.read_table(path)
        positional = positional or "pos" in t.column_names
        terms = t["term"].to_pylist()
        rows = t.to_pylist()
        for term, row in zip(terms, rows):
            ids, tfs_r, dls_r = decode_posting(row)
            if id_offset:
                ids = ids + id_offset
            # positional segments: positions merge alongside, re-sorted
            # with the same permutation as their postings
            flat_pos = (
                decode_positions(row["pos"], tfs_r) if "pos" in row else None
            )
            per_term.setdefault(term, []).append((ids, tfs_r, dls_r, flat_pos))

    terms_sorted = []
    ids_l, tfs_l, dls_l, pos_l, starts, ends = [], [], [], [], [], []
    off = 0
    for term in sorted(per_term):
        parts = per_term[term]
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        order = np.argsort(ids, kind="stable")
        ids, tfs_s, dls_s = ids[order], tfs[order], dls[order]
        flat_s = None
        if positional:
            flat = np.concatenate([p[3] for p in parts])
            flat_s = permute_flat_by_rows(flat, tfs, order)
        if deleted is not None and len(ids):
            j = np.searchsorted(deleted, ids)
            hit = (j < len(deleted)) & (
                deleted[np.minimum(j, len(deleted) - 1)] == ids
            )
            if hit.any():
                keep_idx = np.flatnonzero(~hit)
                if len(keep_idx) == 0:
                    continue  # term has no live postings → drop it
                if positional:
                    flat_s = permute_flat_by_rows(flat_s, tfs_s, keep_idx)
                ids, tfs_s, dls_s = ids[keep_idx], tfs_s[keep_idx], dls_s[keep_idx]
        terms_sorted.append(term)
        ids_l.append(ids)
        tfs_l.append(tfs_s)
        dls_l.append(dls_s)
        if positional:
            pos_l.append(flat_s)
        starts.append(off)
        off += len(ids)
        ends.append(off)

    if terms_sorted:
        doc_ids = np.concatenate(ids_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        flat_positions = np.concatenate(pos_l) if positional else None
    else:
        doc_ids = tfs = dls = np.empty(0, dtype=np.int64)
        flat_positions = np.empty(0, dtype=np.int64) if positional else None
    cols = encode_partition(
        doc_ids, tfs, dls,
        np.asarray(starts, dtype=np.int64), np.asarray(ends, dtype=np.int64),
        avgdl, params,
        flat_positions=flat_positions,
    )
    seg = pa.table({"term": pa.array(terms_sorted, type=pa.string()), **cols})
    seg = seg.replace_schema_metadata({b"encode_avgdl": repr(avgdl).encode()})
    buf = io.BytesIO()
    pq.write_table(seg, buf, compression="zstd", row_group_size=4096)
    return buf.getvalue()


def compact_index(index_dir: str, out_dir: str) -> dict:
    """Compact ``index_dir`` (any number of generations) into a fresh
    single-generation index at ``out_dir``. Distributed: one Ray Data
    task per partition (partitions are independent — no shuffle at
    all); docmeta is consolidated by file copy (metadata-sized IO).
    Rerunning after a crash resumes: committed output partitions are
    skipped. Never calls ray.init (driver owns the session)."""
    import ray.data as rd

    src = IndexLayout(index_dir)
    old = src.read_manifest()
    dst = IndexLayout(out_dir)
    dst.ensure_dirs()
    t_start = time.perf_counter()

    # tombstone purge (pipelines/delete.py): compaction is where deleted
    # docs physically leave — postings drop, df shrinks to live counts,
    # and corpus stats (n_docs, sum_dl, avgdl) recompute EXACTLY from
    # docmeta, so the output is results-identical to a one-shot build
    # over the surviving corpus (tests/test_delete.py)
    deleted = src.read_deletes()
    n_docs_live = int(old["n_docs"])
    sum_dl_live = int(old.get("sum_dl") or round(old["avgdl"] * old["n_docs"]))
    if len(deleted):
        del_dl = _deleted_doclen_sum(src, deleted)
        n_docs_live -= len(deleted)
        sum_dl_live -= del_dl
    avgdl = sum_dl_live / n_docs_live if n_docs_live else 0.0
    params = BM25Params(k1=float(old["k1"]), b=float(old["b"]))
    fp = str(old.get("config_fp", ""))
    # resume guard: every output partition must be purged under the SAME
    # tombstone set + live avgdl — deleting more docs between a crash
    # and the rerun would silently mix incompatible partitions otherwise
    purge_fp = _purge_fingerprint(deleted, avgdl)

    done = dst.committed_parts()
    for p, m in done.items():
        if m.get("config_fp") != fp or m.get("purge_fp", "") != purge_fp:
            raise ValueError(
                f"out_dir {out_dir} partition {p} was committed under config/"
                f"purge ({m.get('config_fp')!r}, {m.get('purge_fp')!r}) != "
                f"source ({fp!r}, {purge_fp!r}); use a fresh out_dir"
            )
    all_parts = sorted({int(m["part"]) for m in src.committed_parts_all_gens()})
    todo = [p for p in all_parts if p not in done]

    def compact_batch(batch: pa.Table) -> pa.Table:
        import io as _io

        import pyarrow.parquet as pq

        out_parts, out_bytes = [], []
        for part in batch["part"].to_pylist():
            files = src.part_posting_files(part)
            payload = _merge_partition(files, avgdl, params, deleted=deleted)
            seg = pq.read_table(_io.BytesIO(payload), columns=["df"])
            metrics = {
                "n_terms": int(seg.num_rows),
                "n_postings": int(np.sum(seg["df"].to_numpy(zero_copy_only=False)))
                if seg.num_rows else 0,
                "posting_bytes": len(payload),
                "config_fp": fp,
                "purge_fp": purge_fp,
                "encode_avgdl": avgdl,
                "compacted_from": [os.path.basename(f) for f in files],
            }
            dst.commit_partition(part, payload, metrics, gen=0)
            out_parts.append(part)
            out_bytes.append(len(payload))
        return pa.table(
            {
                "part": pa.array(out_parts, type=pa.int64()),
                "posting_bytes": pa.array(out_bytes, type=pa.int64()),
            }
        )

    n_built = 0
    if todo:
        # one block per partition → full task-level parallelism
        items = rd.from_items(
            [{"part": p} for p in todo], override_num_blocks=len(todo)
        )
        n_built = items.map_batches(
            compact_batch, batch_format="pyarrow", batch_size=1
        ).count()

    # docmeta: consolidate every generation's files into the flat dir
    # (names prefixed per source dir so generations can't collide);
    # tombstoned docs' rows are dropped in transit
    for gen_dir, prefix in _docmeta_sources(src):
        for name in sorted(os.listdir(gen_dir)):
            if not name.endswith(".parquet"):
                continue
            target = os.path.join(dst.docmeta_dir, f"{prefix}{name}")
            if os.path.exists(target):
                continue
            source_file = os.path.join(gen_dir, name)
            if len(deleted):
                import pyarrow.parquet as pq

                t = pq.read_table(source_file)
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                j = np.searchsorted(deleted, ids)
                hit = (j < len(deleted)) & (
                    deleted[np.minimum(j, len(deleted) - 1)] == ids
                )
                t = t.filter(pa.array(~hit))
                tmp = target + ".tmp"
                pq.write_table(t, tmp, compression="zstd")
                os.replace(tmp, target)
            else:
                shutil.copy2(source_file, target)

    # merged docstats → future appends onto the compacted index work
    heavy: set[str] = set()
    g = 0
    while (stats := src.read_docstats(g)) is not None:
        heavy.update(stats.get("heavy_terms", []))
        g += 1
    dst.write_docstats(
        {
            "n_docs": n_docs_live,
            "sum_dl": sum_dl_live,
            "avgdl": avgdl,
            "heavy_df_threshold": old.get("heavy_df_threshold"),
            "heavy_terms": sorted(heavy),
            "config_fp": fp,
            "gen": 0,
        }
    )

    committed = dst.committed_parts()
    manifest = dict(old)
    manifest.pop("n_deleted", None)  # purge is physical: no tombstones remain
    manifest.update(
        {
            "n_docs": n_docs_live,
            "sum_dl": sum_dl_live,
            "avgdl": avgdl,
            "n_generations": 1,
            "n_partitions": len(committed),
            "n_partitions_built_this_run": int(n_built),
            "total_postings": int(sum(m["n_postings"] for m in committed.values())),
            "total_posting_bytes": int(
                sum(m["posting_bytes"] for m in committed.values())
            ),
            "build_wall_sec": round(time.perf_counter() - t_start, 3),
            "phase_secs": {"compact": round(time.perf_counter() - t_start, 3)},
            "compacted_from": index_dir,
        }
    )
    dst.write_manifest(manifest)
    return manifest


def merge_indexes(a_dir: str, b_dir: str, out_dir: str) -> dict:
    """Merge two INDEPENDENTLY BUILT indexes into one fresh index — the
    posting-list merge step of a sharded build (index crawl batches on
    separate clusters, merge the results; reference analog: the single
    MySQL index simply grows, ``database/src/database.ts:16-91`` — here
    growth composes from immutable index artifacts instead).

    Both inputs must share a config fingerprint (tokenizer, codec,
    num_shards, salting, BM25 params, positions, id_mode) and carry an
    ``id_ceiling`` (dense/bounded doc ids). B's doc ids are relocated
    by ``a.id_ceiling`` into the union id space: postings are decoded,
    offset, merged per term and re-encoded under the UNION avgdl (exact
    metadata combine), so block-max bounds are exact — the merged index
    is results-identical to a one-shot build over the union corpus
    (asserted in ``tests/test_merge.py``). Positions never shift (they
    are doc-internal).

    Distributed and resumable exactly like ``compact_index``: one Ray
    Data task per partition, no shuffle, atomic per-partition commits,
    rerun skips finished partitions. Docmeta merges by file copy (A)
    plus a doc_id-offset rewrite (B) — metadata-sized IO.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    src_a, src_b = IndexLayout(a_dir), IndexLayout(b_dir)
    ma, mb = src_a.read_manifest(), src_b.read_manifest()
    fp = str(ma.get("config_fp", ""))
    if str(mb.get("config_fp", "")) != fp:
        raise ValueError(
            f"config fingerprints differ (a={fp!r}, b={mb.get('config_fp')!r}); "
            "indexes must be built with the exact same config to merge"
        )
    if not ma.get("id_ceiling") or not mb.get("id_ceiling"):
        raise ValueError(
            "merge requires bounded doc ids (id_ceiling) on both indexes; "
            "hash-id indexes cannot be relocated into a union id space"
        )
    if len(src_a.read_deletes()) or len(src_b.read_deletes()):
        raise ValueError(
            "merge inputs carry tombstones; run compact_index on each "
            "side first (purges deletions and recomputes exact stats), "
            "then merge the compacted indexes"
        )
    offset_b = int(ma["id_ceiling"])
    dst = IndexLayout(out_dir)
    dst.ensure_dirs()
    t_start = time.perf_counter()

    # union corpus stats — a pure metadata combine
    n_docs = int(ma["n_docs"]) + int(mb["n_docs"])
    sum_dl = int(ma.get("sum_dl") or round(ma["avgdl"] * ma["n_docs"])) + int(
        mb.get("sum_dl") or round(mb["avgdl"] * mb["n_docs"])
    )
    avgdl = sum_dl / n_docs if n_docs else 0.0
    params = BM25Params(k1=float(ma["k1"]), b=float(ma["b"]))

    done = dst.committed_parts()
    for p, m in done.items():
        if m.get("config_fp") != fp:
            raise ValueError(
                f"out_dir {out_dir} partition {p} was committed under config "
                f"{m.get('config_fp')!r} != source {fp!r}; use a fresh out_dir"
            )
    all_parts = sorted(
        {int(m["part"]) for m in src_a.committed_parts_all_gens()}
        | {int(m["part"]) for m in src_b.committed_parts_all_gens()}
    )
    todo = [p for p in all_parts if p not in done]

    def merge_batch(batch: pa.Table) -> pa.Table:
        import io as _io

        out_parts, out_bytes = [], []
        for part in batch["part"].to_pylist():
            files = [(f, 0) for f in src_a.part_posting_files(part)] + [
                (f, offset_b) for f in src_b.part_posting_files(part)
            ]
            payload = _merge_partition(files, avgdl, params)
            seg = pq.read_table(_io.BytesIO(payload), columns=["df"])
            metrics = {
                "n_terms": int(seg.num_rows),
                "n_postings": int(np.sum(seg["df"].to_numpy(zero_copy_only=False)))
                if seg.num_rows else 0,
                "posting_bytes": len(payload),
                "config_fp": fp,
                "encode_avgdl": avgdl,
                "merged_from": [os.path.basename(f) for f, _ in files],
            }
            dst.commit_partition(part, payload, metrics, gen=0)
            out_parts.append(part)
            out_bytes.append(len(payload))
        return pa.table(
            {
                "part": pa.array(out_parts, type=pa.int64()),
                "posting_bytes": pa.array(out_bytes, type=pa.int64()),
            }
        )

    n_built = 0
    if todo:
        items = rd.from_items(
            [{"part": p} for p in todo], override_num_blocks=len(todo)
        )
        n_built = items.map_batches(
            merge_batch, batch_format="pyarrow", batch_size=1
        ).count()

    # docmeta: A copies through; B rewrites doc_id into the union space
    for gen_dir, prefix in _docmeta_sources(src_a):
        for name in sorted(os.listdir(gen_dir)):
            if not name.endswith(".parquet"):
                continue
            target = os.path.join(dst.docmeta_dir, f"a-{prefix}{name}")
            if not os.path.exists(target):
                shutil.copy2(os.path.join(gen_dir, name), target)
    for gen_dir, prefix in _docmeta_sources(src_b):
        for name in sorted(os.listdir(gen_dir)):
            if not name.endswith(".parquet"):
                continue
            target = os.path.join(dst.docmeta_dir, f"b-{prefix}{name}")
            if os.path.exists(target):
                continue
            t = pq.read_table(os.path.join(gen_dir, name))
            ids = pc.add(t["doc_id"], pa.scalar(offset_b, type=pa.int64()))
            t = t.set_column(
                t.schema.get_field_index("doc_id"), "doc_id", ids.cast(pa.int64())
            )
            tmp = target + ".tmp"
            pq.write_table(t, tmp, compression="zstd")
            os.replace(tmp, target)

    # merged docstats → future appends onto the merged index work
    heavy: set[str] = set()
    for src in (src_a, src_b):
        g = 0
        while (stats := src.read_docstats(g)) is not None:
            heavy.update(stats.get("heavy_terms", []))
            g += 1
    dst.write_docstats(
        {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": avgdl,
            "heavy_df_threshold": max(
                int(ma.get("heavy_df_threshold") or 0),
                int(mb.get("heavy_df_threshold") or 0),
            ) or None,
            "heavy_terms": sorted(heavy),
            "config_fp": fp,
            "gen": 0,
        }
    )

    committed = dst.committed_parts()
    manifest = dict(ma)
    manifest.update(
        {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": avgdl,
            "id_ceiling": offset_b + int(mb["id_ceiling"]),
            "n_generations": 1,
            "n_partitions": len(committed),
            "n_partitions_built_this_run": int(n_built),
            "total_postings": int(sum(m["n_postings"] for m in committed.values())),
            "total_posting_bytes": int(
                sum(m["posting_bytes"] for m in committed.values())
            ),
            "build_wall_sec": round(time.perf_counter() - t_start, 3),
            "phase_secs": {"merge": round(time.perf_counter() - t_start, 3)},
            "merged_from": [a_dir, b_dir],
        }
    )
    dst.write_manifest(manifest)
    return manifest


def _deleted_doclen_sum(src: IndexLayout, deleted: np.ndarray) -> int:
    """Σ doc_len of the tombstoned docs — an exact metadata pass over
    the (doc_id, doc_len) columns of docmeta (every generation), so
    compaction's recomputed avgdl matches a fresh build over the
    surviving corpus to the bit."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = 0
    for gen_dir, _ in _docmeta_sources(src):
        for f in sorted(_glob.glob(os.path.join(gen_dir, "*.parquet"))):
            t = pq.read_table(f, columns=["doc_id", "doc_len"])
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            j = np.searchsorted(deleted, ids)
            hit = (j < len(deleted)) & (
                deleted[np.minimum(j, len(deleted) - 1)] == ids
            )
            if hit.any():
                total += int(t["doc_len"].to_numpy(zero_copy_only=False)[hit].sum())
    return total


def _purge_fingerprint(deleted: np.ndarray, avgdl: float) -> str:
    """Stable hash of (tombstone set, live avgdl) — partitions purged
    under different sets/stats must never mix in one output index."""
    import hashlib

    if not len(deleted):
        return ""
    h = hashlib.blake2s(digest_size=8)
    h.update(np.ascontiguousarray(deleted, dtype=np.int64).tobytes())
    h.update(repr(avgdl).encode())
    return h.hexdigest()


def _docmeta_sources(src: IndexLayout) -> list[tuple[str, str]]:
    """(dir, filename-prefix) pairs covering gen-0 docmeta files plus
    every append generation's subdirectory."""
    out: list[tuple[str, str]] = []
    if os.path.isdir(src.docmeta_dir):
        out.append((src.docmeta_dir, ""))
    for name in sorted(os.listdir(src.docmeta_dir)) if os.path.isdir(src.docmeta_dir) else []:
        sub = os.path.join(src.docmeta_dir, name)
        if os.path.isdir(sub) and name.startswith("g"):
            out.append((sub, f"{name}-"))
    return out


def compact_in_place(index_dir: str, keep_backup: bool = False) -> dict:
    """Fold every append generation (and physically purge tombstones)
    into a fresh artifact and SWAP it into ``index_dir`` — the
    auto-compaction primitive the ``watch`` loop calls so a
    long-running ingest can't grow generations without bound.

    Sequence: compact into ``<dir>.compacting`` → FOLD the MinHash
    signature store's generations into one (its own compaction —
    bounds near-dup probe cost for long-running watch loops and keeps
    the store's generation namespace in lockstep with the index's;
    caveat: signatures of tombstone-PURGED docs survive the fold, so
    future near-dups of a deleted doc are still dropped — the
    conservative direction) → metadata fsck gate → two renames
    (old → ``.precompact`` → new → ``index_dir``). The swap window is
    two renames; warm replicas re-open on the next version-token check
    (a reload landing INSIDE the window can fail and retries on the
    following check — the watch loop sequences ingest and compaction,
    so its own serving replicas never race). Crash leftovers
    (``.compacting`` / ``.precompact``) are removed and re-derived —
    every input survives until the final rename."""
    from zensearch_ray.pipelines.fsck import fsck_index

    base = index_dir.rstrip("/")
    tmp_out = base + ".compacting"
    bak = base + ".precompact"
    for p in (tmp_out, bak):
        if os.path.exists(p):
            shutil.rmtree(p)
    m = compact_index(index_dir, tmp_out)
    src_ss = os.path.join(index_dir, "sigstore")
    if os.path.isdir(src_ss):
        # fold the sigstore's generations alongside the index's (its
        # own compaction): the near-dup probe reads one file per
        # generation per band partition, so a long-running watch loop
        # would otherwise grow probe cost one generation per delta
        # forever. The fold also resets the store's generation
        # namespace in lockstep with the index's (gen_offset=0) — a
        # verbatim carry-over here once let a post-compaction append
        # REUSE a committed sig generation, silently skipping the
        # delta's signatures (soak-found; see sigstore.append_sig_store).
        from zensearch_ray.stages.sigstore import fold_sig_store

        fold_sig_store(src_ss, os.path.join(tmp_out, "sigstore"))
    rep = fsck_index(tmp_out, deep=False)
    if not rep["ok"]:
        raise RuntimeError(
            f"compacted artifact failed fsck, swap aborted: {rep['errors']}"
        )
    os.rename(index_dir, bak)
    os.rename(tmp_out, index_dir)
    if not keep_backup:
        shutil.rmtree(bak)
    return m
