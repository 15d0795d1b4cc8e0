"""Index integrity checker (``zensearch_ray fsck``).

The commit protocol (``state/manifest.py``: payload rename first,
lineage manifest last) makes corruption *unlikely*; fsck makes it
*detectable* — after a partial copy between stores, a manual edit, a
disk fault, or a suspected engine bug, it answers "is every byte of
this index internally consistent?" without trusting any cached stat.

Two levels:

* **metadata** (cheap, driver-side): global manifest ↔ per-generation
  docstats ↔ per-partition lineage manifests cross-checked — config
  fingerprints all equal, doc/posting/byte totals re-derivable,
  avgdl == sum_dl/n_docs, docmeta row count == n_docs, tombstones
  sorted unique, every committed partition's segment file present,
  sigstore meta ↔ its partition markers.
* **deep** (default; one Ray task per segment file — fsck of a
  10^12-doc index parallelizes across the cluster exactly like the
  build that produced it): every posting row round-trips through the
  codec — decoded length == stored df, doc_ids strictly increasing,
  non-negative and under id_ceiling, tf ≥ 1, dl ≥ tf, positional
  payload lengths == tf — and every block-max bound is verified
  AT LEAST the recomputed true block max under the segment's own
  ``encode_avgdl`` (the pruning-safety invariant), with block_last_doc
  matching the decoded block boundaries. Term-dictionary sidecars must
  equal their segment's distinct terms.

Returns a report dict; ``ok`` is False iff any error was found. Errors
are strings prefixed with the artifact they implicate.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

from zensearch_ray.functions.bm25 import BM25Params, tf_norm
from zensearch_ray.functions.codec import (
    BLOCK_SIZE,
    decode_posting,
    decode_positions,
)
from zensearch_ray.state.manifest import IndexLayout

_POSTING_BASE_COLS = [
    "term", "df", "docs", "tfs", "dls", "block_last_doc", "block_max",
]


def _check_segment_file(path: str, dict_path: str | None, params: BM25Params,
                        id_ceiling: int | None,
                        tri_path: str | None = None,
                        ss_path: str | None = None) -> dict:
    """Deep-check one segment file. Returns
    {path, n_terms, n_postings, max_doc_id, errors: [str]}."""
    errors: list[str] = []
    tbl = pq.read_table(path)
    names = set(tbl.column_names)
    missing = [c for c in _POSTING_BASE_COLS if c not in names]
    if missing:
        return {
            "path": path, "n_terms": 0, "n_postings": 0, "max_doc_id": -1,
            "errors": [f"{path}: missing columns {missing}"],
        }
    meta = tbl.schema.metadata or {}
    enc_avgdl = float(meta.get(b"encode_avgdl", b"0") or 0)
    if enc_avgdl <= 0:
        errors.append(f"{path}: missing/invalid encode_avgdl metadata")
    has_pos = "pos" in names
    rows = tbl.to_pylist()
    n_postings = 0
    max_doc = -1
    for r in rows:
        term = r["term"]
        where = f"{path} term={term!r}"
        try:
            ids, tfs, dls = decode_posting(r)
        except Exception as exc:  # corrupt varint/delta payload
            errors.append(f"{where}: decode failed: {exc}")
            continue
        n = len(ids)
        n_postings += n
        if n != r["df"]:
            errors.append(f"{where}: stored df={r['df']} != decoded {n}")
        if n == 0:
            errors.append(f"{where}: empty posting list")
            continue
        if ids[0] < 0:
            errors.append(f"{where}: negative doc_id {ids[0]}")
        if n > 1 and not (np.diff(ids) > 0).all():
            errors.append(f"{where}: doc_ids not strictly increasing")
        max_doc = max(max_doc, int(ids[-1]))
        if id_ceiling is not None and ids[-1] >= id_ceiling:
            errors.append(
                f"{where}: doc_id {ids[-1]} >= id_ceiling {id_ceiling}"
            )
        if (tfs < 1).any():
            errors.append(f"{where}: tf < 1")
        if (dls < tfs).any():
            errors.append(f"{where}: dl < tf")
        if has_pos and r.get("pos") is not None:
            try:
                flat = decode_positions(r["pos"], tfs)
                if len(flat) != int(tfs.sum()):
                    errors.append(
                        f"{where}: positions length {len(flat)} != sum(tf) "
                        f"{int(tfs.sum())}"
                    )
            except Exception as exc:
                errors.append(f"{where}: positions decode failed: {exc}")
        # block metadata: pruning safety requires stored bound >= true
        # max tf_norm of every posting in the block (under the avgdl
        # the segment was ENCODED with), and block_last_doc must match
        # the decoded block boundaries
        bl = np.asarray(r["block_last_doc"], dtype=np.int64)
        bm = np.asarray(r["block_max"], dtype=np.float32)
        starts = np.arange(0, n, BLOCK_SIZE)
        if len(bl) != len(starts) or len(bm) != len(starts):
            errors.append(
                f"{where}: {len(starts)} blocks but {len(bl)} block_last_doc/"
                f"{len(bm)} block_max entries"
            )
            continue
        last = np.minimum(starts + BLOCK_SIZE, n) - 1
        if not (ids[last] == bl).all():
            errors.append(f"{where}: block_last_doc mismatch")
        if enc_avgdl > 0:
            norms = tf_norm(tfs, dls, enc_avgdl, params)
            true_max = np.maximum.reduceat(norms, starts)
            if (bm.astype(np.float64) < true_max).any():
                errors.append(
                    f"{where}: block_max below true max (pruning unsafe)"
                )
    if dict_path is not None:
        if not os.path.exists(dict_path):
            # readers fall back to the segment's own term column when a
            # sidecar is missing (state/manifest.py: pre-sidecar
            # indexes); fsck_index only passes dict_path for indexes
            # that HAVE a termdict dir, so a hole there is a real error
            errors.append(f"{path}: termdict sidecar missing ({dict_path})")
        else:
            seg_terms = sorted({r["term"] for r in rows})
            dict_terms = pq.read_table(dict_path)["term"].to_pylist()
            if dict_terms != seg_terms:
                errors.append(
                    f"{path}: termdict sidecar disagrees with segment terms "
                    f"({len(dict_terms)} vs {len(seg_terms)})"
                )
    if tri_path is not None:
        # same presence rule as termdict: fsck_index only passes
        # tri_path for indexes that HAVE a trigram dir
        if not os.path.exists(tri_path):
            errors.append(f"{path}: trigram sidecar missing ({tri_path})")
        else:
            tri_tbl = pq.read_table(tri_path)
            tris = tri_tbl["tri"].to_pylist()
            tri_terms = tri_tbl["term"].to_pylist()
            seg_terms = sorted({r["term"] for r in rows})
            want = sorted(t for t in seg_terms if len(t) >= 3)
            if sorted(set(tri_terms)) != want:
                errors.append(
                    f"{path}: trigram sidecar term set disagrees with "
                    f"segment terms (>=3 chars)"
                )
            bad = sum(1 for g, t in zip(tris, tri_terms)
                      if len(g) != 3 or g not in t)
            if bad:
                errors.append(
                    f"{path}: {bad} trigram rows not substrings of their term"
                )
    if ss_path is not None:
        # same presence rule: fsck_index only passes ss_path for
        # indexes that HAVE a symspell dir, so a hole is a real error
        if not os.path.exists(ss_path):
            errors.append(f"{path}: symspell sidecar missing ({ss_path})")
        else:
            from zensearch_ray.functions.fuzzy import symspell_pairs_table

            seg_terms = sorted({r["term"] for r in rows})
            want = symspell_pairs_table(seg_terms, max_dist=2)
            got = pq.read_table(ss_path)
            if not got.equals(want):
                errors.append(
                    f"{path}: symspell sidecar disagrees with the "
                    f"recomputed delete neighborhood ({got.num_rows} vs "
                    f"{want.num_rows} rows)"
                )
    return {
        "path": path,
        "n_terms": len(rows),
        "n_postings": n_postings,
        "max_doc_id": max_doc,
        "errors": errors,
    }


def _docmeta_rows(layout: IndexLayout) -> int:
    """Row count from parquet footers only (no data read)."""
    total = 0
    for base, _dirs, files in os.walk(layout.docmeta_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(base, f)).metadata.num_rows
    return total


def _check_sigstore(index_dir: str, errors: list[str]) -> dict | None:
    from zensearch_ray.stages.sigstore import read_meta, store_dir_of
    from zensearch_ray.state.sink import completed_partitions

    sdir = store_dir_of(index_dir)
    meta = read_meta(sdir)
    if meta is None:
        return None
    n_from_files = 0
    for gen in meta.get("generations", {}):
        gdir = os.path.join(sdir, "sigs", f"gen-{gen}")
        if not completed_partitions(gdir):
            errors.append(f"sigstore: generation {gen} has no committed sig partitions")
        for base, _d, files in os.walk(gdir):
            for f in files:
                if f.endswith(".parquet"):
                    n_from_files += pq.ParquetFile(
                        os.path.join(base, f)
                    ).metadata.num_rows
    if n_from_files != meta.get("n_docs"):
        errors.append(
            f"sigstore: meta n_docs={meta.get('n_docs')} != sig rows {n_from_files}"
        )
    return {"n_docs": meta.get("n_docs"), "generations": len(meta.get("generations", {}))}


def fsck_index(index_dir: str, deep: bool = True) -> dict:
    """Run all checks; see module docstring. ``deep=False`` skips the
    per-segment decode pass (metadata cross-checks only)."""
    import ray
    import ray.data as rd

    layout = IndexLayout(index_dir)
    errors: list[str] = []
    report: dict = {"index_dir": index_dir, "deep": deep}

    if not layout.is_complete():
        return {
            **report, "ok": False,
            "errors": [f"{index_dir}: no global manifest (incomplete build)"],
        }
    manifest = layout.read_manifest()
    fp = manifest.get("config_fp")
    n_gens = int(manifest.get("n_generations", 1))
    params = BM25Params(k1=manifest.get("k1", 1.2), b=manifest.get("b", 0.75))
    id_ceiling = manifest.get("id_ceiling")

    # -- metadata cross-checks ---------------------------------------------
    n_docs = sum_dl = 0
    for g in range(n_gens):
        ds = layout.read_docstats(g)
        if ds is None:
            errors.append(f"docstats generation {g}: missing")
            continue
        if ds.get("config_fp") != fp:
            errors.append(
                f"docstats generation {g}: config_fp {ds.get('config_fp')!r} "
                f"!= manifest {fp!r}"
            )
        n_docs += int(ds["n_docs"])
        sum_dl += int(ds["sum_dl"])
    if n_docs != manifest["n_docs"]:
        errors.append(
            f"manifest n_docs={manifest['n_docs']} != docstats total {n_docs}"
        )
    if manifest.get("sum_dl") is not None and sum_dl != int(manifest["sum_dl"]):
        errors.append(
            f"manifest sum_dl={manifest['sum_dl']} != docstats total {sum_dl}"
        )
    if n_docs and abs(manifest["avgdl"] - sum_dl / n_docs) > 1e-9:
        errors.append(
            f"manifest avgdl={manifest['avgdl']} != sum_dl/n_docs {sum_dl / n_docs}"
        )

    parts = layout.committed_parts_all_gens()
    if not parts:
        errors.append("no committed partitions")
    files: list[dict] = []
    total_postings = 0
    for m in parts:
        part, gen = int(m["part"]), int(m.get("gen", 0))
        tag = f"partition {part} gen {gen}"
        if m.get("config_fp") != fp:
            errors.append(f"{tag}: config_fp {m.get('config_fp')!r} != manifest {fp!r}")
        path = layout.posting_path(part, gen)
        if not os.path.exists(path):
            errors.append(f"{tag}: segment file missing ({path})")
            continue
        total_postings += int(m["n_postings"])
        # pre-sidecar indexes have no termdict dir at all — readers fall
        # back to segment term columns, so that is legal; a PARTIAL
        # sidecar set (dir exists, file missing) is not
        has_termdict = os.path.isdir(layout.termdict_dir)
        has_trigram = os.path.isdir(layout.trigram_dir)
        has_symspell = os.path.isdir(layout.symspell_dir)
        files.append(
            {"path": path,
             "dict_path": layout.dict_path_for(path) if has_termdict else None,
             "tri_path": layout.trigram_path_for(path) if has_trigram else None,
             "ss_path": layout.symspell_path_for(path) if has_symspell else None,
             "manifest_postings": int(m["n_postings"]), "tag": tag}
        )
    if total_postings != int(manifest.get("total_postings", total_postings)):
        errors.append(
            f"manifest total_postings={manifest.get('total_postings')} != "
            f"partition manifests total {total_postings}"
        )

    dm_rows = _docmeta_rows(layout)
    if dm_rows != n_docs:
        errors.append(f"docmeta rows {dm_rows} != n_docs {n_docs}")

    deleted = layout.read_deletes()
    if len(deleted):
        if not (np.diff(deleted) > 0).all():
            errors.append("deletes.bin: tombstones not sorted-unique")
        report["n_deleted"] = int(len(deleted))

    report["sigstore"] = _check_sigstore(index_dir, errors)
    report["n_partitions"] = len(parts)
    report["n_generations"] = n_gens

    # -- deep decode pass (one Ray task per segment) -------------------------
    if deep and files:
        params_ref = ray.put(params)

        def check_batch(batch: dict) -> dict:
            p = ray.get(params_ref)
            out = {"path": [], "n_terms": [], "n_postings": [],
                   "max_doc_id": [], "errors": []}
            for path, dict_path, tri_path, ss_path in zip(
                batch["path"], batch["dict_path"], batch["tri_path"],
                batch["ss_path"],
            ):
                if not isinstance(dict_path, str):
                    dict_path = None  # batch conversion turns None → nan
                if not isinstance(tri_path, str):
                    tri_path = None
                if not isinstance(ss_path, str):
                    ss_path = None
                r = _check_segment_file(path, dict_path, p, id_ceiling,
                                        tri_path=tri_path, ss_path=ss_path)
                for k in out:
                    v = r[k]
                    out[k].append(json.dumps(v) if k == "errors" else v)
            return out

        results = (
            rd.from_items(files)
            .map_batches(check_batch, batch_size=1, batch_format="default")
            .to_pandas()
        )
        by_path = {r["path"]: r for _, r in results.iterrows()}
        n_terms = 0
        for f in files:
            r = by_path.get(f["path"])
            if r is None:
                errors.append(f"{f['tag']}: deep check produced no result")
                continue
            errors.extend(json.loads(r["errors"]))
            n_terms += int(r["n_terms"])
            if int(r["n_postings"]) != f["manifest_postings"]:
                errors.append(
                    f"{f['tag']}: decoded postings {int(r['n_postings'])} != "
                    f"lineage manifest {f['manifest_postings']}"
                )
        report["n_terms"] = n_terms
        max_doc = int(results["max_doc_id"].max()) if len(results) else -1
        report["max_doc_id"] = max_doc
        if id_ceiling is not None and max_doc >= int(id_ceiling):
            errors.append(f"max doc_id {max_doc} >= id_ceiling {id_ceiling}")

    report["n_docs"] = n_docs
    report["total_postings"] = total_postings
    report["ok"] = not errors
    report["errors"] = errors
    return report
