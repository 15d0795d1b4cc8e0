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

from zensearch_ray.functions.bm25 import BM25Params
from zensearch_ray.state.manifest import IndexLayout


def _merge_partition(files: list[str], avgdl: float, params: BM25Params) -> bytes:
    """Read every generation segment of one partition, merge postings
    per term (generations have disjoint doc-id ranges; sort makes the
    result order-invariant), re-encode under ``avgdl``. Returns the
    parquet payload bytes. Pure function → plain testable code."""
    import io

    import pyarrow.parquet as pq

    from zensearch_ray.functions.codec import (
        decode_positions,
        decode_posting,
        encode_partition,
        permute_flat_by_rows,
    )

    per_term: dict[str, list[tuple]] = {}
    positional = False
    for path in files:
        t = pq.read_table(path)
        positional = positional or "pos" in t.column_names
        terms = t["term"].to_pylist()
        rows = t.to_pylist()
        for term, row in zip(terms, rows):
            ids, tfs_r, dls_r = decode_posting(row)
            # positional segments: positions merge alongside, re-sorted
            # with the same permutation as their postings
            flat_pos = (
                decode_positions(row["pos"], tfs_r) if "pos" in row else None
            )
            per_term.setdefault(term, []).append((ids, tfs_r, dls_r, flat_pos))

    terms_sorted = sorted(per_term)
    ids_l, tfs_l, dls_l, pos_l, starts, ends = [], [], [], [], [], []
    off = 0
    for term in terms_sorted:
        parts = per_term[term]
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        order = np.argsort(ids, kind="stable")
        ids_l.append(ids[order])
        tfs_l.append(tfs[order])
        dls_l.append(dls[order])
        if positional:
            flat = np.concatenate([p[3] for p in parts])
            pos_l.append(permute_flat_by_rows(flat, tfs, order))
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

    avgdl = float(old["avgdl"])
    params = BM25Params(k1=float(old["k1"]), b=float(old["b"]))
    fp = str(old.get("config_fp", ""))

    done = dst.committed_parts()
    for p, m in done.items():
        if m.get("config_fp") != fp:
            raise ValueError(
                f"out_dir {out_dir} partition {p} was committed under config "
                f"{m.get('config_fp')!r} != source {fp!r}; use a fresh out_dir"
            )
    all_parts = sorted({int(m["part"]) for m in src.committed_parts_all_gens()})
    todo = [p for p in all_parts if p not in done]

    def compact_batch(batch: pa.Table) -> pa.Table:
        import io as _io

        import pyarrow.parquet as pq

        out_parts, out_bytes = [], []
        for part in batch["part"].to_pylist():
            files = src.part_posting_files(part)
            payload = _merge_partition(files, avgdl, params)
            seg = pq.read_table(_io.BytesIO(payload), columns=["df"])
            metrics = {
                "n_terms": int(seg.num_rows),
                "n_postings": int(np.sum(seg["df"].to_numpy(zero_copy_only=False)))
                if seg.num_rows else 0,
                "posting_bytes": len(payload),
                "config_fp": fp,
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
    # (names prefixed per source dir so generations can't collide)
    for gen_dir, prefix in _docmeta_sources(src):
        for name in sorted(os.listdir(gen_dir)):
            if not name.endswith(".parquet"):
                continue
            target = os.path.join(dst.docmeta_dir, f"{prefix}{name}")
            if not os.path.exists(target):
                shutil.copy2(os.path.join(gen_dir, name), target)

    # merged docstats → future appends onto the compacted index work
    heavy: set[str] = set()
    g = 0
    while (stats := src.read_docstats(g)) is not None:
        heavy.update(stats.get("heavy_terms", []))
        g += 1
    dst.write_docstats(
        {
            "n_docs": int(old["n_docs"]),
            "sum_dl": int(old.get("sum_dl") or round(old["avgdl"] * old["n_docs"])),
            "avgdl": avgdl,
            "heavy_df_threshold": old.get("heavy_df_threshold"),
            "heavy_terms": sorted(heavy),
            "config_fp": fp,
            "gen": 0,
        }
    )

    committed = dst.committed_parts()
    manifest = dict(old)
    manifest.update(
        {
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
