"""Index snapshot / restore — the backup story for the on-disk layout.

The reference's whole index IS one SQLite file
(``database/src/database.ts:16-91``), so "backup" is `cp database.db`.
This engine's index is a directory tree of immutable committed
artifacts (segment parquet + per-partition manifests + docmeta +
termdict/trigram sidecars + deletes + the global manifest), so the
snapshot tool has three jobs the bare `cp -r` gets wrong:

1. **Only snapshot a verified index** — `fsck_index(deep=False)` runs
   first (metadata cross-checks: manifest vs partitions vs docstats);
   a torn or corrupt layout is refused, never preserved.
2. **Atomic publish** — files copy into ``<out>.tmp`` and the
   directory renames into place only after the snapshot manifest
   (source version token, file inventory with sizes) is written; a
   crashed snapshot leaves a ``.tmp`` turd, never a half snapshot that
   restore would trust.
3. **Verified restore** — restore refuses a non-empty destination,
   copies, re-checks the file inventory byte-for-byte (sizes) and
   re-runs the metadata fsck on the result, so a truncated copy fails
   loudly at restore time, not at query time.

Both directions are driver-side file I/O (an index is metadata +
posting bytes — at cluster scale you snapshot the shared filesystem or
object-store prefix the same way; the inventory/fsck discipline is the
part that transfers).
"""

from __future__ import annotations

import json
import os
import shutil

from zensearch_ray.state.manifest import IndexLayout

SNAP_MANIFEST = "SNAPSHOT.json"


def _inventory(root: str) -> list[dict]:
    """Relative path + size for every file under ``root``, sorted."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out.append(
                {
                    "path": os.path.relpath(p, root),
                    "bytes": os.path.getsize(p),
                }
            )
    out.sort(key=lambda r: r["path"])
    return out


def snapshot_index(index_dir: str, out_dir: str) -> dict:
    """Verified, atomic snapshot of a committed index. Returns the
    snapshot manifest dict."""
    from zensearch_ray.pipelines.fsck import fsck_index

    report = fsck_index(index_dir, deep=False)
    if not report.get("ok"):
        raise ValueError(
            f"refusing to snapshot {index_dir}: fsck failed: "
            f"{report.get('errors')!r}"
        )
    if os.path.exists(out_dir):
        raise ValueError(f"snapshot destination {out_dir} already exists")
    layout = IndexLayout(index_dir)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(index_dir, tmp)
    manifest = {
        "source": os.path.abspath(index_dir),
        "version_token": layout.version_token(),
        "n_docs": (layout.read_manifest() or {}).get("n_docs"),
        "files": _inventory(index_dir),
    }
    manifest["n_files"] = len(manifest["files"])
    manifest["total_bytes"] = int(sum(f["bytes"] for f in manifest["files"]))
    with open(os.path.join(tmp, SNAP_MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, out_dir)
    return manifest


def restore_index(snapshot_dir: str, out_dir: str) -> dict:
    """Restore a snapshot into a fresh index directory; verifies the
    file inventory and the restored layout's metadata fsck."""
    from zensearch_ray.pipelines.fsck import fsck_index

    snap_path = os.path.join(snapshot_dir, SNAP_MANIFEST)
    if not os.path.exists(snap_path):
        raise ValueError(f"{snapshot_dir} is not a snapshot (no {SNAP_MANIFEST})")
    with open(snap_path) as fh:
        manifest = json.load(fh)
    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise ValueError(f"restore destination {out_dir} is not empty")
    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(snapshot_dir, tmp)
    os.remove(os.path.join(tmp, SNAP_MANIFEST))
    # byte-size inventory check BEFORE publishing
    got = {r["path"]: r["bytes"] for r in _inventory(tmp)}
    want = {r["path"]: r["bytes"] for r in manifest["files"]}
    if got != want:
        missing = sorted(set(want) - set(got))[:5]
        extra = sorted(set(got) - set(want))[:5]
        changed = sorted(
            p for p in set(got) & set(want) if got[p] != want[p]
        )[:5]
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            f"snapshot inventory mismatch: missing={missing} "
            f"extra={extra} size-changed={changed}"
        )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    report = fsck_index(out_dir, deep=False)
    if not report.get("ok"):
        raise ValueError(
            f"restored layout fails fsck: {report.get('errors')!r}"
        )
    return {
        "restored": out_dir,
        "version_token": IndexLayout(out_dir).version_token(),
        "n_files": manifest["n_files"],
        "total_bytes": manifest["total_bytes"],
    }
