"""Index layout + per-partition lineage manifests (checkpoint/resume).

Replaces the reference's crash-resume machinery (frontier node states
``pending → in_progress → visited`` in MySQL,
``database/src/database.ts:253-311``, ``db.init.sql:16-35``) with the
batch-native equivalent mandated by the north_rule: immutable segment
files + a lineage manifest per output partition, written atomically
(temp file + rename), so a resumed build skips committed partitions
and rebuilds only the missing ones.

Layout::

    index_dir/
      manifest.json                 # global: N, avgdl, params, partition list
      docstats.json                 # pass-1 cache: N, sum_dl, heavy terms
      docmeta/  *.parquet           # doc_id, url, doc_len
      postings/ part=<K>.parquet    # one immutable segment per partition
      _manifests/ part-<K>.json     # per-partition lineage + metrics
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True, indent=1)
    os.replace(tmp, path)


class IndexLayout:
    def __init__(self, index_dir: str):
        self.root = index_dir
        self.manifest_path = os.path.join(index_dir, "manifest.json")
        self.docstats_path = os.path.join(index_dir, "docstats.json")
        self.docmeta_dir = os.path.join(index_dir, "docmeta")
        self.postings_dir = os.path.join(index_dir, "postings")
        self.part_manifest_dir = os.path.join(index_dir, "_manifests")

    @property
    def deletes_path(self) -> str:
        """Tombstone sidecar: one sorted ``doc_id`` column (parquet).
        Docs listed here are excluded from every query result; their
        postings/docmeta/stats are physically purged by the next
        ``compact_index``. Parquet (not JSON) so the set stays columnar
        at scale; a roaring bitmap is the upgrade path if tombstones
        ever exceed a few percent of the corpus."""
        return os.path.join(self.root, "deletes.parquet")

    def read_deletes(self) -> "np.ndarray":
        """Sorted unique tombstoned doc_ids (empty array if none)."""
        if not os.path.exists(self.deletes_path):
            return np.empty(0, dtype=np.int64)
        import pyarrow.parquet as pq

        return pq.read_table(self.deletes_path)["doc_id"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    def write_deletes(self, doc_ids: "np.ndarray") -> None:
        """Atomically publish the FULL tombstone set (sorted, unique)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
        tmp = self.deletes_path + ".tmp"
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64())}),
            tmp,
            compression="zstd",
        )
        os.replace(tmp, self.deletes_path)

    def version_token(self) -> str:
        """Cheap content fingerprint of everything that changes query
        results in place: the global manifest bytes (appends rewrite
        it last), the tombstone sidecar (mtime_ns, size), and the
        sorted segment file list. Metadata-only — no segment is read.
        Serving replicas compare tokens to decide whether to reload
        (``QueryService`` live reload); compaction writes a NEW
        directory, so a swapped serving dir is a restart by design."""
        import glob as _glob
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        try:
            with open(self.manifest_path, "rb") as f:
                h.update(f.read())
        except FileNotFoundError:
            h.update(b"no-manifest")
        try:
            st = os.stat(self.deletes_path)
            h.update(f"{st.st_mtime_ns}:{st.st_size}".encode())
        except FileNotFoundError:
            h.update(b"no-deletes")
        for name in sorted(
            _glob.glob(os.path.join(self.postings_dir, "part=*.parquet"))
        ):
            h.update(os.path.basename(name).encode())
        return h.hexdigest()

    def ensure_dirs(self) -> None:
        for d in (self.root, self.docmeta_dir, self.postings_dir, self.part_manifest_dir):
            os.makedirs(d, exist_ok=True)

    @property
    def termdict_dir(self) -> str:
        """Term-dictionary sidecars: for each posting segment, a tiny
        parquet holding ONLY that segment's sorted unique ``term``
        column. Prefix / wildcard / fuzzy / suggest expansion reads
        these instead of scanning the segments' term columns, making
        dictionary operations metadata-only (the segment files — the
        bulk of the index — are never opened). Sidecars live in their
        own directory (same ``part=K[.gG].parquet`` basenames) so no
        postings glob can ever pick one up as a segment."""
        return os.path.join(self.root, "termdict")

    def dict_path_for(self, posting_file: str) -> str:
        """Sidecar path for a committed segment file."""
        return os.path.join(self.termdict_dir, os.path.basename(posting_file))

    @property
    def trigram_dir(self) -> str:
        """Character-trigram sidecars (pg_trgm / Lucene n-gram style):
        for each posting segment, (tri, term) pairs over that segment's
        unique terms, SORTED BY tri so a parquet ``tri IN (...)``
        filter prunes row groups. Infix/substring expansion
        (``QueryEngine.expand_infix``, leading-'*' wildcards) reads
        only the query's trigram lists instead of scanning the whole
        vocabulary. Same per-segment append-friendly layout as
        ``termdict``; readers fall back to the vocab scan when absent
        (pre-trigram indexes)."""
        return os.path.join(self.root, "trigram")

    def trigram_path_for(self, posting_file: str) -> str:
        """Trigram sidecar path for a committed segment file."""
        return os.path.join(self.trigram_dir, os.path.basename(posting_file))

    @property
    def symspell_dir(self) -> str:
        """SymSpell delete-neighborhood sidecars (Garbe's algorithm;
        the persisted form of ``functions.fuzzy.SymSpellIndex``): for
        each posting segment, every (dkey, term) pair where ``dkey``
        is reachable from the term by deleting ≤ 2 bytes, SORTED BY
        dkey with small row groups so a ``dkey IN (query's delete
        keys)`` parquet filter prunes to the probed buckets. Distance-2
        fuzzy expansion (``QueryEngine.expand_fuzzy(max_dist=2)``)
        reads only those buckets instead of building an in-memory index
        from the full vocabulary — at a 10^8-term web vocabulary that
        residency (GBs × the ≤(1+L+L²/2) key blowup, per serving
        replica) is the difference between a replica that fits and one
        that doesn't. Same per-segment append-friendly layout as
        ``termdict``/``trigram``; readers fall back to the in-memory
        build when any segment lacks its sidecar (pre-sidecar
        indexes)."""
        return os.path.join(self.root, "symspell")

    def symspell_path_for(self, posting_file: str) -> str:
        """SymSpell sidecar path for a committed segment file."""
        return os.path.join(self.symspell_dir, os.path.basename(posting_file))

    def posting_path(self, part: int, gen: int = 0) -> str:
        """Segment file for (partition, generation). Generation 0 is the
        cold build; each append adds generation g > 0 segments beside
        the existing ones (immutable — appends never rewrite)."""
        suffix = "" if gen == 0 else f".g{gen}"
        return os.path.join(self.postings_dir, f"part={part}{suffix}.parquet")

    def part_posting_files(self, part: int) -> list[str]:
        """Every committed generation's segment for one partition."""
        import glob as _glob

        out = [
            p
            for p in _glob.glob(os.path.join(self.postings_dir, f"part={part}.g*.parquet"))
        ]
        base = self.posting_path(part, 0)
        if os.path.exists(base):
            out.append(base)
        return sorted(out)

    def part_manifest_path(self, part: int, gen: int = 0) -> str:
        suffix = "" if gen == 0 else f".g{gen}"
        return os.path.join(self.part_manifest_dir, f"part-{part}{suffix}.json")

    # -- per-partition commit protocol ------------------------------------
    def commit_partition(
        self, part: int, table_bytes: bytes, metrics: dict[str, Any], gen: int = 0
    ) -> None:
        """Atomically publish one posting segment + its lineage manifest.

        The parquet payload is renamed into place FIRST, the manifest
        LAST — a partition counts as committed only when its manifest
        exists, so a crash between the two renames is safe (segment
        without manifest → rebuilt and overwritten on resume).
        """
        final = self.posting_path(part, gen)
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(table_bytes)
        os.replace(tmp, final)
        self._write_termdict(final, table_bytes)
        _atomic_write_json(
            self.part_manifest_path(part, gen),
            {"part": part, "gen": gen, "file": final, **metrics},
        )

    def _write_termdict(self, posting_file: str, table_bytes: bytes) -> None:
        """Publish the term-dictionary sidecar for one segment (sorted
        unique ``term`` column, extracted from the in-memory payload —
        no re-read of the committed file). Written BEFORE the lineage
        manifest, so every manifest-committed segment has its sidecar;
        readers still fall back to the segment's own term column when a
        sidecar is missing (pre-sidecar indexes). No-op for payloads
        without a ``term`` column (the commit protocol is shared)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        buf = pa.BufferReader(table_bytes)
        if "term" not in pq.read_schema(buf).names:
            return
        terms = pq.read_table(buf, columns=["term"])["term"]
        uniq = pc.unique(terms.combine_chunks())
        uniq = uniq.take(pc.sort_indices(uniq))
        os.makedirs(self.termdict_dir, exist_ok=True)
        final = self.dict_path_for(posting_file)
        tmp = final + ".tmp"
        pq.write_table(pa.table({"term": uniq}), tmp, compression="zstd")
        os.replace(tmp, final)
        terms = uniq.to_pylist()
        self._write_trigrams(posting_file, terms)
        self._write_symspell(posting_file, terms)

    def _write_trigrams(self, posting_file: str, terms: list[str]) -> None:
        """Publish the character-trigram sidecar for one segment:
        unique (tri, term) pairs sorted by (tri, term), small row
        groups so ``tri IN (...)`` parquet filters read only the
        matching slices. Terms shorter than 3 chars contribute no rows
        (infix queries that short fall back to the vocab scan)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        tris: list[str] = []
        ts: list[str] = []
        for t in terms:
            if len(t) < 3:
                continue
            seen = {t[i : i + 3] for i in range(len(t) - 2)}
            tris.extend(seen)
            ts.extend([t] * len(seen))
        order = np.lexsort((np.asarray(ts, dtype=object),
                            np.asarray(tris, dtype=object)))
        tbl = pa.table(
            {
                "tri": pa.array([tris[i] for i in order], pa.string()),
                "term": pa.array([ts[i] for i in order], pa.string()),
            }
        )
        os.makedirs(self.trigram_dir, exist_ok=True)
        final = self.trigram_path_for(posting_file)
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp, compression="zstd", row_group_size=8192)
        os.replace(tmp, final)

    def _write_symspell(self, posting_file: str, terms: list[str]) -> None:
        """Publish the SymSpell delete-neighborhood sidecar for one
        segment (see ``symspell_dir``): (dkey, term) pairs sorted by
        (dkey, term), dkey-binary row groups small enough that a
        ``dkey IN (...)`` filter reads only the probed buckets. Build
        cost is one pass over the segment's unique terms × the ≤
        (1+L+L²/2) neighborhood — the standard SymSpell trade: paid
        once per immutable segment at commit, amortized over every
        distance-2 lookup served without vocabulary residency."""
        import pyarrow.parquet as pq

        from zensearch_ray.functions.fuzzy import symspell_pairs_table

        tbl = symspell_pairs_table(terms, max_dist=2)
        os.makedirs(self.symspell_dir, exist_ok=True)
        final = self.symspell_path_for(posting_file)
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp, compression="zstd", row_group_size=8192)
        os.replace(tmp, final)

    def committed_parts(self, gen: int = 0) -> dict[int, dict]:
        """part → manifest for every committed partition of one generation."""
        out: dict[int, dict] = {}
        if not os.path.isdir(self.part_manifest_dir):
            return out
        for name in os.listdir(self.part_manifest_dir):
            if not (name.startswith("part-") and name.endswith(".json")):
                continue
            with open(os.path.join(self.part_manifest_dir, name)) as f:
                m = json.load(f)
            if int(m.get("gen", 0)) == gen:
                out[int(m["part"])] = m
        return out

    def committed_parts_all_gens(self) -> list[dict]:
        out: list[dict] = []
        if not os.path.isdir(self.part_manifest_dir):
            return out
        for name in sorted(os.listdir(self.part_manifest_dir)):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(self.part_manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    # -- pass-1 cache ------------------------------------------------------
    def _docstats_path(self, gen: int = 0) -> str:
        return self.docstats_path if gen == 0 else f"{self.docstats_path}.g{gen}"

    def write_docstats(self, stats: dict, gen: int = 0) -> None:
        _atomic_write_json(self._docstats_path(gen), stats)

    def read_docstats(self, gen: int = 0) -> dict | None:
        path = self._docstats_path(gen)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def docmeta_gen_dir(self, gen: int = 0) -> str:
        """Docmeta files per generation (gen 0 stays flat for
        compatibility; appends nest — ParquetDataset reads recursively)."""
        return self.docmeta_dir if gen == 0 else os.path.join(self.docmeta_dir, f"g{gen}")

    # -- global manifest ---------------------------------------------------
    def write_manifest(self, manifest: dict) -> None:
        _atomic_write_json(self.manifest_path, manifest)

    def read_manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def is_complete(self) -> bool:
        return os.path.exists(self.manifest_path)
