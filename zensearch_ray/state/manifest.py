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

    def ensure_dirs(self) -> None:
        for d in (self.root, self.docmeta_dir, self.postings_dir, self.part_manifest_dir):
            os.makedirs(d, exist_ok=True)

    def posting_path(self, part: int) -> str:
        return os.path.join(self.postings_dir, f"part={part}.parquet")

    def part_manifest_path(self, part: int) -> str:
        return os.path.join(self.part_manifest_dir, f"part-{part}.json")

    # -- per-partition commit protocol ------------------------------------
    def commit_partition(self, part: int, table_bytes: bytes, metrics: dict[str, Any]) -> None:
        """Atomically publish one posting segment + its lineage manifest.

        The parquet payload is renamed into place FIRST, the manifest
        LAST — a partition counts as committed only when its manifest
        exists, so a crash between the two renames is safe (segment
        without manifest → rebuilt and overwritten on resume).
        """
        final = self.posting_path(part)
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(table_bytes)
        os.replace(tmp, final)
        _atomic_write_json(
            self.part_manifest_path(part), {"part": part, "file": final, **metrics}
        )

    def committed_parts(self) -> dict[int, dict]:
        """part → manifest for every committed partition."""
        out: dict[int, dict] = {}
        if not os.path.isdir(self.part_manifest_dir):
            return out
        for name in os.listdir(self.part_manifest_dir):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(self.part_manifest_dir, name)) as f:
                    m = json.load(f)
                out[int(m["part"])] = m
        return out

    # -- pass-1 cache ------------------------------------------------------
    def write_docstats(self, stats: dict) -> None:
        _atomic_write_json(self.docstats_path, stats)

    def read_docstats(self) -> dict | None:
        if not os.path.exists(self.docstats_path):
            return None
        with open(self.docstats_path) as f:
            return json.load(f)

    # -- global manifest ---------------------------------------------------
    def write_manifest(self, manifest: dict) -> None:
        _atomic_write_json(self.manifest_path, manifest)

    def read_manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def is_complete(self) -> bool:
        return os.path.exists(self.manifest_path)
